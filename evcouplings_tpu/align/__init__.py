from evcouplings_tpu.align.alignment import (  # noqa: F401
    Alignment, read_fasta, write_fasta, read_stockholm, read_a3m,
    write_a3m, write_aln, detect_format, parse_header,
    sequences_to_matrix, map_from_alphabet, map_matrix,
    GAP, MATCH_GAP, INSERT_GAP,
    ALPHABET_PROTEIN, ALPHABET_PROTEIN_NOGAP,
    ALPHABET_PROTEIN_ORDERED, ALPHABET_PROTEIN_NOGAP_ORDERED,
    ALPHABET_DNA, ALPHABET_DNA_NOGAP,
    ALPHABET_RNA, ALPHABET_RNA_NOGAP,
)
