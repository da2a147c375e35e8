"""
Genome-distance-based concatenation: CDS partner enumeration and best
reciprocal matching.

Parity target: reference evcouplings/complex/distance.py —
get_distance (:16), best_reciprocal_matching (:52),
find_possible_partners (:116), plot_distance_distribution (:201).
The all-pairs-per-genome enumeration is vectorized as a per-genome
cross merge instead of the reference's nested Python loops.
"""

import numpy as np
import pandas as pd


def get_distance(annotation_1, annotation_2):
    """Distance in bases between two CDS locations on one genome
    (0 if they overlap)."""
    location_1 = sorted(annotation_1)
    location_2 = sorted(annotation_2)
    x, y = sorted((location_1, location_2))

    if x[0] <= x[1] < y[0]:
        return y[0] - x[1]
    return 0


def find_possible_partners(gene_location_table_1, gene_location_table_2):
    """All cross-genome CDS pairings with their genomic distances.

    Returns DataFrame with columns uniprot_id_1, uniprot_id_2, distance
    (full_id x full_id for every shared genome).
    """
    def _clean(table, suffix):
        table = table.dropna(axis=0).copy()
        table[["gene_start", "gene_end"]] = table[
            ["gene_start", "gene_end"]
        ].astype(int)
        table = table.drop_duplicates()
        # normalized interval [lo, hi] per CDS
        lo = table[["gene_start", "gene_end"]].min(axis=1)
        hi = table[["gene_start", "gene_end"]].max(axis=1)
        return pd.DataFrame({
            "genome_id": table["genome_id"].values,
            "uniprot_id" + suffix: table["full_id"].values,
            "lo" + suffix: lo.values,
            "hi" + suffix: hi.values,
        })

    t1 = _clean(gene_location_table_1, "_1")
    t2 = _clean(gene_location_table_2, "_2")

    # all CDS pairs sharing a genome, then vectorized interval distance
    merged = t1.merge(t2, on="genome_id")
    if len(merged) == 0:
        return pd.DataFrame(
            columns=["uniprot_id_1", "uniprot_id_2", "distance"]
        )

    gap_12 = merged.lo_2 - merged.hi_1      # CDS 1 before CDS 2
    gap_21 = merged.lo_1 - merged.hi_2      # CDS 2 before CDS 1
    distance = np.maximum(np.maximum(gap_12, gap_21), 0)

    return pd.DataFrame({
        "uniprot_id_1": merged.uniprot_id_1.values,
        "uniprot_id_2": merged.uniprot_id_2.values,
        "distance": distance.values,
    })


def best_reciprocal_matching(possible_partners):
    """Pairs where each member is the other's closest CDS on the genome.

    Returns DataFrame with columns uniprot_id_1, uniprot_id_2, distance.
    """
    id_pairing_list = []

    id_group_1 = possible_partners.groupby("uniprot_id_1")
    id_group_2 = possible_partners.groupby("uniprot_id_2")

    for uniprot_id_1 in id_group_1.groups.keys():
        id_subset_1 = id_group_1.get_group(uniprot_id_1)

        # closest partner of sequence 1 in the second alignment
        closest_to_1 = id_subset_1.loc[
            id_subset_1["distance"].idxmin()
        ]["uniprot_id_2"]

        # closest partner of that sequence back in the first alignment
        id_subset_2 = id_group_2.get_group(closest_to_1)
        closest_to_2 = id_subset_2.loc[
            id_subset_2["distance"].idxmin()
        ]["uniprot_id_1"]

        if closest_to_2 == uniprot_id_1:
            id_pairing_list.append(
                (uniprot_id_1, closest_to_1, id_subset_1["distance"].min())
            )

    return pd.DataFrame(
        id_pairing_list,
        columns=["uniprot_id_1", "uniprot_id_2", "distance"],
    )


def plot_distance_distribution(id_pair_to_distance, outfile):
    """Cumulative histogram of genome distances of the final pairing."""
    import matplotlib.pyplot as plt

    distances = sorted(id_pair_to_distance["distance"])
    if len(distances) == 0:
        raise ValueError("No valid distances provided")

    cdf = range(len(distances))

    fig = plt.figure(figsize=(8, 6))
    ax1 = fig.gca()
    ax1.set_xscale("log")
    ax1.set_xlim(xmin=1, xmax=max(distances))
    ax1.set_ylabel("Number of sequences")
    ax1.set_xlabel("Genome distance (bases)")
    ax1.plot(distances, cdf)

    plt.savefig(outfile)
    plt.close(fig)
