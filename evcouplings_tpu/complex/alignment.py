"""
Concatenated (paired) complex alignments.

Parity target: reference evcouplings/complex/alignment.py
(write_concatenated_alignment :12-138). The concatenated target header
is `id1_id2/1-L1+L2`, required downstream for plm focus mode.
"""

from collections import OrderedDict

import numpy as np

from evcouplings_tpu.align.alignment import Alignment, parse_header


def _unfilter(matrix):
    """Uppercase all symbols and turn insert gaps "." into match gaps
    "-" (undo a2m column filtering for pairing)."""
    matrix = np.char.upper(matrix)
    matrix[matrix == "."] = "-"
    return matrix


def write_concatenated_alignment(id_pairing, alignment_1, alignment_2,
                                 target_sequence_1, target_sequence_2):
    """Pair rows of two monomer alignments into one concatenated
    alignment.

    Returns (target_header, target_seq_index, full_alignment,
    monomer_alignment_1, monomer_alignment_2) where the monomer
    alignments contain only the rows that made it into the
    concatenation (in the same order).
    """
    ali_1 = Alignment.from_path(alignment_1, "fasta")
    ali_2 = Alignment.from_path(alignment_2, "fasta")

    all_cols_1 = np.arange(ali_1.matrix.shape[1])
    all_cols_2 = np.arange(ali_2.matrix.shape[1])
    ali_1 = ali_1.apply(func=_unfilter, columns=all_cols_1)
    ali_2 = ali_2.apply(func=_unfilter, columns=all_cols_2)

    target_index_1 = ali_1.id_to_index[target_sequence_1]
    target_index_2 = ali_2.id_to_index[target_sequence_2]

    target_sequences = (
        ali_1.matrix[target_index_1, :],
        ali_2.matrix[target_index_2, :],
    )

    # target header must end with /1-<range> for correct focus mode
    length = len(target_sequences[0]) + len(target_sequences[1])
    target_header = "{}_{}/1-{}".format(
        parse_header(target_sequence_1)[0],
        parse_header(target_sequence_2)[0],
        length,
    )

    sequences_to_write = [
        (target_header, target_sequences[0], target_sequences[1])
    ]
    target_seq_idx = 0

    for id1, id2 in zip(id_pairing.id_1, id_pairing.id_2):
        sequences_to_write.append((
            "{}_{}".format(id1, id2),
            ali_1.matrix[ali_1.id_to_index[id1], :],
            ali_2.matrix[ali_2.id_to_index[id2], :],
        ))

    sequences_full = OrderedDict([
        (header, np.concatenate([seq1, seq2]))
        for header, seq1, seq2 in sequences_to_write
    ])
    sequences_monomer_1 = OrderedDict([
        (header, seq1) for header, seq1, seq2 in sequences_to_write
    ])
    sequences_monomer_2 = OrderedDict([
        (header, seq2) for header, seq1, seq2 in sequences_to_write
    ])

    return (
        target_header,
        target_seq_idx,
        Alignment.from_dict(sequences_full),
        Alignment.from_dict(sequences_monomer_1),
        Alignment.from_dict(sequences_monomer_2),
    )
