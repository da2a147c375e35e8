"""
EC <-> 3D-distance comparison: distance annotation and precision@rank.

Parity target: reference evcouplings/compare/ecs.py — add_distances
(:11-40), add_precision (:43-90), coupling_scores_compared (:93-152).
"""

import numpy as np


def add_distances(ec_table, dist_map, target_column="dist"):
    """Annotate each EC pair (columns i, j) with its distance from the
    map (NaN where unavailable)."""
    ec_table = ec_table.copy()
    ec_table.loc[:, target_column] = [
        dist_map.dist(i, j, raise_na=False)
        for i, j in zip(ec_table.i, ec_table.j)
    ]
    return ec_table


def add_precision(ec_table, dist_cutoff=5, score="cn",
                  min_sequence_dist=6, target_column="precision",
                  dist_column="dist"):
    """Cumulative precision of ECs as contact predictors: at each rank,
    TP / (TP + FP) where TP = pairs with distance <= dist_cutoff."""
    ec_table = ec_table.sort_values(by=score, ascending=False, kind="stable")

    if min_sequence_dist is not None:
        ec_table = ec_table.query("abs(i - j) >= @min_sequence_dist")

    ec_table = ec_table.copy()

    true_pos_count = (
        ec_table.loc[:, dist_column] <= dist_cutoff
    ).cumsum()
    pos_count = ec_table.loc[:, dist_column].notnull().cumsum()

    ec_table.loc[:, target_column] = true_pos_count / pos_count
    return ec_table


def coupling_scores_compared(ec_table, dist_map, dist_map_multimer=None,
                             dist_cutoff=5, output_file=None, score="cn",
                             min_sequence_dist=6):
    """Build the "CouplingScoresCompared"-style table: distances (min
    of monomer/multimer if both given) plus precision column."""
    if dist_map_multimer is None:
        x = add_distances(ec_table, dist_map)
    else:
        x = add_distances(ec_table, dist_map, "dist_intra")
        x = add_distances(x, dist_map_multimer, "dist_multimer")
        x.loc[:, "dist"] = np.fmin(x.dist_intra, x.dist_multimer)

    if min_sequence_dist is not None:
        x = x.query("abs(i - j) >= @min_sequence_dist")

    if dist_cutoff is not None:
        x = add_precision(
            x, dist_cutoff, score=score,
            min_sequence_dist=min_sequence_dist,
        )

    if output_file is not None:
        x.to_csv(output_file, index=False)

    return x
