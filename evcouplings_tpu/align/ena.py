"""
UniProt -> EMBL/ENA coding-sequence mapping for genomic-distance-based
complex pairing.

Parity target: reference evcouplings/align/ena.py — extract_cds_ids
(:17), extract_embl_annotation (:111), add_full_header (:182). Table
formats: uniprot_to_embl_table rows are
`uniprot_ac <x> genome1:cds1,genome2:cds2`; ena_genome_location_table is
TSV `cds_id genome_id uniprot_ac start end`.
"""

from collections import defaultdict

import pandas as pd

from evcouplings_tpu.align.ids import retrieve_sequence_ids


def extract_cds_ids(alignment_file, uniprot_to_embl_table):
    """Map the alignment's UniProt ACs to EMBL CDS ids, keeping only
    CDSs that map unambiguously to a single genome.

    Returns a list of (uniprot_ac, cds_id) pairs (ACs may repeat).
    """
    with open(alignment_file) as f:
        sequence_id_list, _ = retrieve_sequence_ids(f)
    target_ids = set(sequence_id_list)

    # (uniprot_ac, [(genome, cds), ...]) entries for alignment members
    genome_and_cds = []
    with open(uniprot_to_embl_table) as f:
        for line in f:
            uniprot_ac, _, ena_data = line.rstrip().split(" ")
            if uniprot_ac in target_ids:
                genome_and_cds.append((
                    uniprot_ac,
                    [tuple(x.split(":")) for x in ena_data.split(",")],
                ))

    # drop CDSs hit by multiple genomes (ambiguous location)
    filtered = []
    for uniprot_ac, pairs in genome_and_cds:
        cds_to_genomes = defaultdict(list)
        for genome, cds in pairs:
            cds_to_genomes[cds].append(genome)
        for cds, genomes in cds_to_genomes.items():
            if len(genomes) == 1:
                filtered.append((uniprot_ac, cds))
    return filtered


def extract_embl_annotation(uniprot_and_cds, ena_genome_location_table,
                            genome_location_filename):
    """Pull genomic locations for the given CDS ids from the ENA table.

    Returns a DataFrame with columns
    cds, genome_id, uniprot_ac, gene_start, gene_end (one row per CDS).
    The uniprot_ac column comes from the input pairing, not the table
    (the table's AC mapping can be ambiguous).

    genome_location_filename is accepted but unused — signature parity
    with the reference (align/ena.py:111-180, equally unused there);
    the caller writes the CSV itself, index column included, so the
    artifact matches reference-produced files byte for byte.
    """
    cds_target_set = {cds for _, cds in uniprot_and_cds}
    cds_to_uniprot = {cds: ac for ac, cds in uniprot_and_cds}

    rows = []
    with open(ena_genome_location_table) as f:
        for line in f:
            cds_id, genome_id, _, start, end = line.rstrip().split("\t")
            if cds_id in cds_target_set:
                rows.append([
                    cds_id, genome_id, cds_to_uniprot[cds_id], start, end
                ])

    return pd.DataFrame(rows, columns=[
        "cds", "genome_id", "uniprot_ac", "gene_start", "gene_end"
    ])


def add_full_header(table, alignment_file):
    """Expand the genome-location table with a full_id column: one row
    per alignment header that carries the row's UniProt AC."""
    with open(alignment_file) as f:
        _, id_to_header = retrieve_sequence_ids(f)

    expanded = []
    for _, row in table.iterrows():
        for full_id in id_to_header[row["uniprot_ac"]]:
            expanded.append({**row.to_dict(), "full_id": full_id})

    return pd.DataFrame(expanded, columns=list(table.columns) + ["full_id"])
