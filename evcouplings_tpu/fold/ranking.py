"""
Structure-model ranking by secondary-structure twist (dihedral
statistics of predicted helices and sheets).

Parity target: reference evcouplings/fold/ranking.py —
_alpha_dihedrals (:24), _beta_dihedrals (:81),
dihedral_ranking_score (:269), dihedral_ranking (:398);
reimplementation of make_alpha_beta_score_table.m.
"""

from collections import defaultdict
from itertools import combinations, product

import numpy as np
import pandas as pd

from evcouplings_tpu.compare.pdb import ClassicPDB
from evcouplings_tpu.utils.calculations import dihedral_angle
from evcouplings_tpu.utils.config import InvalidParameterError
from evcouplings_tpu.visualize.pairs import (
    find_secondary_structure_segments,
)


def _alpha_dihedrals(coords, segments):
    """CA-dihedral angles inside helical segments (segment end
    exclusive); returns DataFrame (helix, i, dihedral)."""
    def has(pos):
        return pos in coords.i.values

    def xyz(pos):
        return coords.loc[
            coords.i == pos, ["x", "y", "z"]
        ].iloc[0].values

    res = []
    for helix_idx, (start, end) in enumerate(segments):
        for i in range(start, end):
            # need CA atoms at i-1 .. i+2
            if has(i - 1) and has(i) and has(i + 1) and has(i + 2):
                angle = dihedral_angle(
                    xyz(i - 1), xyz(i), xyz(i + 1), xyz(i + 2)
                )
                res.append((helix_idx, i, angle))

    return pd.DataFrame(res, columns=["helix", "i", "dihedral"])


def _beta_dihedrals(coords, segments, max_strand_distance=7,
                    original=True):
    """Inter-strand CA-dihedral angles for proximal strand pairs
    (parallel/antiparallel determined by majority vote); returns
    DataFrame (i, j, strand_i, strand_j, dihedral).

    original=True reproduces the exact residue selections of the 2011
    ranking protocol (which are inconsistent between orientation vote
    and angle computation); False uses the consistent variant.
    """
    coords = dict(
        zip(coords.i, coords.loc[:, ["x", "y", "z"]].values)
    )

    def has(pos):
        return pos in coords

    def xyz(pos):
        return coords[pos]

    def _orientation(pairs):
        # vote parallel vs antiparallel over residue pairs
        par, total = 0, 0
        for _, r in pairs.iterrows():
            i, j = r["pos_i"], r["pos_j"]
            if has(i - 2) and has(i + 2) and has(j + 2):
                d_par = np.linalg.norm(xyz(i + 2) - xyz(j + 2))
                if original:
                    d_anti = np.linalg.norm(xyz(i - 2) - xyz(j + 2))
                else:
                    d_anti = np.linalg.norm(xyz(i + 2) - xyz(j - 2))

                total += 1
                if d_par <= d_anti:
                    par += 1

        if total == 0:
            return 0
        return par / total * 2 - 1

    def _compute_dihedral(pairs, strands_parallel):
        # offset of the second anchor on strand j: +2 along a parallel
        # partner, -2 along an antiparallel one
        j_step = 2 if strands_parallel else -2

        res = []
        for _, r in pairs.iterrows():
            i, j = r["pos_i"], r["pos_j"]
            # both anchor residues two positions along each strand
            # must be resolved; the "original" scoring variant anchors
            # the required-coordinate checks differently
            if original:
                needed = (j + 2, i + 2 if strands_parallel else i - 2)
            else:
                needed = (i + 2, j + j_step)
            if not all(has(p) for p in needed):
                continue

            angle = dihedral_angle(
                xyz(i), xyz(i + 2), xyz(j + j_step), xyz(j)
            )
            res.append(
                (i, j, int(r["strand_i"]), int(r["strand_j"]), angle)
            )

        return pd.DataFrame(
            res,
            columns=["i", "j", "strand_i", "strand_j", "dihedral"],
        )

    # enumerate proximal strand pairs in 3D
    strand_partners = defaultdict(list)

    for (strand_i, seg_i), (strand_j, seg_j) in combinations(
        enumerate(segments), 2
    ):
        pair_dists = pd.DataFrame(
            [
                (
                    strand_i, strand_j, pos_i, pos_j,
                    np.linalg.norm(xyz(pos_i) - xyz(pos_j)),
                )
                for (pos_i, pos_j) in product(
                    range(*seg_i), range(*seg_j)
                )
                if has(pos_i) and has(pos_j)
            ],
            columns=["strand_i", "strand_j", "pos_i", "pos_j", "dist"],
        )
        if len(pair_dists) == 0 or (
            pair_dists.dist.min() > max_strand_distance
        ):
            continue

        # nearest residue in strand j per residue of strand i
        nearest = pair_dists.sort_values(
            by=["pos_i", "dist"]
        ).groupby(["pos_i"]).first().reset_index()

        close = nearest.loc[nearest.dist <= max_strand_distance]
        strand_dist = close.dist.min()

        # restrict to the span between first and last close pair
        first_good, last_good = close.index.min(), close.index.max()
        dihedral_pairs = nearest.loc[first_good:last_good]

        orientation_vote = _orientation(dihedral_pairs)
        strands_parallel = orientation_vote > 0

        dihedrals = _compute_dihedral(dihedral_pairs, strands_parallel)

        strand_partners[strand_i].append(
            (strand_dist, strand_j, dihedrals)
        )

    # at most two pairings per strand; closest in 3D win
    all_dihedrals = []
    num_partners = defaultdict(int)
    for strand_i, partners in strand_partners.items():
        for dist, strand_j, dihedrals in sorted(
            partners, key=lambda x: x[0]
        ):
            if num_partners[strand_i] < 2 and num_partners[strand_j] < 2:
                all_dihedrals.append(dihedrals)
                num_partners[strand_i] += 1
                num_partners[strand_j] += 1

    if len(all_dihedrals) == 0:
        return pd.DataFrame(
            columns=["i", "j", "strand_i", "strand_j", "dihedral"]
        )
    return pd.concat(all_dihedrals, ignore_index=True)


# dihedral-angle windows (radians) and their score weights
_ALPHA_WEIGHTS = [
    (0.2, 0.44, 0.52),
    (0.4, 0.52, 0.61),
    (0.6, 0.61, 0.70),
    (0.8, 0.70, 0.78),
    (1.0, 0.78, 0.96),
    (0.8, 0.96, 1.05),
    (0.6, 1.05, 1.13),
    (0.4, 1.13, 1.22),
    (0.2, 1.22, 1.31),
]

_BETA_WEIGHTS = [
    (0.2, -0.3, -0.1),
    (0.4, -0.4, -0.3),
    (0.6, -0.5, -0.4),
    (0.8, -0.6, -0.5),
    (1.0, -0.8, -0.6),
    (0.8, -0.9, -0.8),
    (0.6, -1.0, -0.9),
    (0.4, -1.1, -1.0),
    (0.2, -1.2, -1.1),
]


def dihedral_ranking_score(structure, residues,
                           sec_struct_column="sec_struct_3state",
                           original=True):
    """Helix/sheet twist quality of one structure model.

    Returns (num alpha dihedrals, alpha score, num beta dihedrals,
    beta score).
    """
    structure = structure.filter_atoms(atom_name="CA")

    x = structure.residues.merge(
        structure.coords, left_index=True, right_on="residue_index"
    )

    # join secondary-structure prediction (PDB residue ids are strings)
    residues = residues.copy()
    residues.loc[:, "id"] = residues.i.astype(str)
    x = residues.merge(x, on="id", how="left", suffixes=("", "_"))

    _, _, segments = find_secondary_structure_segments(
        "".join(x.loc[:, sec_struct_column]), offset=x.i.min()
    )

    def _get_segments(seg_type):
        return [
            (start, end) for (type_, start, end) in segments
            if type_ == seg_type
        ]

    segs_alpha = _get_segments("H")
    segs_beta = _get_segments("E")

    x_valid = x.dropna(subset=["x", "y", "z"])

    d_alpha = _alpha_dihedrals(x_valid, segs_alpha)
    d_beta = _beta_dihedrals(x_valid, segs_beta, original=original)

    if len(d_alpha) > 0:
        alpha_dihedral_score = sum(
            weight * len(d_alpha.query(
                "@lower < dihedral and dihedral <= @upper"
            ))
            for weight, lower, upper in _ALPHA_WEIGHTS
        )
    else:
        alpha_dihedral_score = 0

    if len(d_beta) > 0:
        beta_dihedral_score = sum(
            weight * len(d_beta.query(
                "@lower <= dihedral and dihedral < @upper"
            ))
            for weight, lower, upper in _BETA_WEIGHTS
        )
    else:
        beta_dihedral_score = 0

    return (
        len(d_alpha), alpha_dihedral_score,
        len(d_beta), beta_dihedral_score,
    )


def dihedral_ranking(structure_files, residues, chain=None,
                     sec_struct_column="sec_struct_3state", model=0):
    """Rank a set of PDB structure models by their combined helix +
    sheet dihedral scores (column ranking_score)."""
    res = []
    for filename in structure_files:
        struc = ClassicPDB.from_file(filename)

        if chain is None:
            chains = struc.model_to_chains[model]
            if len(chains) != 1:
                raise InvalidParameterError(
                    "Model has more than one chain, need to "
                    "specify chain parameter to disambiguate."
                )
            chain = chains[0]

        sel_chain = struc.get_chain(chain, model)

        x = dihedral_ranking_score(
            sel_chain, residues, sec_struct_column, original=False
        )
        res.append((filename, *x))

    r = pd.DataFrame(
        res, columns=[
            "filename", "num_alpha_dihedrals", "alpha_dihedral_score",
            "num_beta_dihedrals", "beta_dihedral_score",
        ],
    )

    max_alpha = r.num_alpha_dihedrals.max()
    # beta dihedrals depend on strand contacts actually made in 3D
    max_beta = r.num_beta_dihedrals.max()

    # avoid division by zero when no dihedrals were counted at all
    max_val = max(1, max_alpha + max_beta)

    r.loc[:, "ranking_score"] = (
        (r.alpha_dihedral_score + r.beta_dihedral_score) / max_val
    )
    return r
