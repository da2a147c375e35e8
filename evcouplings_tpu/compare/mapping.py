"""
Sequence index mapping between aligned sequences.

Parity target: reference evcouplings/compare/mapping.py — map_indices
(:15), alignment_index_mapping (:79).
"""

import numpy as np
import pandas as pd

from evcouplings_tpu.align.alignment import Alignment, parse_header


def map_indices(seq_i, start_i, end_i, seq_j, start_j, end_j,
                gaps=("-", ".")):
    """Position mapping between two aligned sequences.

    Returns a DataFrame with columns i, A_i, j, A_j; indices are
    stored as strings (NaN for unaligned positions).
    """
    NA = np.nan
    pos_i = start_i
    pos_j = start_j
    mapping = []

    for res_i, res_j in zip(seq_i, seq_j):
        if res_i not in gaps and res_j not in gaps:
            mapping.append([str(pos_i), res_i, str(pos_j), res_j])
        elif res_i not in gaps:
            mapping.append([str(pos_i), res_i, NA, NA])
        elif res_j not in gaps:
            mapping.append([NA, NA, str(pos_j), res_j])

        if res_i not in gaps:
            pos_i += 1
        if res_j not in gaps:
            pos_j += 1

    assert pos_i - 1 == end_i and pos_j - 1 == end_j

    return pd.DataFrame(mapping, columns=["i", "A_i", "j", "A_j"])


def alignment_index_mapping(alignment_file, format="stockholm",
                            target_seq=None):
    """Index mapping table centered on a target sequence of an
    alignment: columns i, A_i plus i_<id> / A_i_<id> per other row."""
    with open(alignment_file) as a:
        ali = Alignment.from_file(a, format)

    if target_seq is None:
        target_seq_index = 0
    else:
        for i, full_id in enumerate(ali.ids):
            if full_id.startswith(target_seq):
                target_seq_index = i

    id_, target_start, target_end = parse_header(
        ali.ids[target_seq_index]
    )
    target_seq = ali.matrix[target_seq_index]

    full_map = None

    for i, full_id in enumerate(ali.ids):
        if i == target_seq_index:
            continue

        id_, region_start, region_end = parse_header(full_id)
        other_seq = ali.matrix[i]

        map_df = map_indices(
            target_seq, target_start, target_end,
            other_seq, region_start, region_end,
            [ali._match_gap, ali._insert_gap],
        ).rename(columns={
            "j": "i_" + full_id,
            "A_j": "A_i_" + full_id,
        })

        if full_map is None:
            full_map = map_df
        else:
            full_map = full_map.merge(
                map_df, on=("i", "A_i"), how="left"
            )

    return full_map
