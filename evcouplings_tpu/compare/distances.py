"""
Residue distance maps on PDB 3D coordinates.

Parity target: reference evcouplings/compare/distances.py —
DistanceMap (:91-792), _prepare_structures (:794), _prepare_chain
(:823), intra_dists (:863), multimer_dists (:1020), inter_dists
(:1180), remap_chains (:1396), remap_complex_chains (:1514). The numba
min-atom-distance kernel is replaced by the vectorized GEMM kernel in
evcouplings_tpu.ops.distances.
"""

from collections import Counter
from copy import deepcopy
from itertools import combinations
from operator import itemgetter

import numpy as np
import pandas as pd

from evcouplings_tpu.compare.pdb import load_structures
from evcouplings_tpu.ops.distances import min_atom_distances
from evcouplings_tpu.utils.constants import AA1_to_AA3
from evcouplings_tpu.utils.helpers import find_segments
from evcouplings_tpu.utils.system import create_prefix_folders


class DistanceMap:
    """Pairwise residue distances between two PDB chains (or within
    one chain, symmetric), with csv+npy persistence and aggregation."""

    # separator between distance map id and field name in aggregated
    # residue tables
    _id_separator = "::"

    def __init__(self, residues_i, residues_j, dist_matrix, symmetric):
        self.residues_i = residues_i
        self.residues_j = residues_j
        self.dist_matrix = dist_matrix
        self.symmetric = symmetric

        self.id_map_i = {
            id_: i for (i, id_) in enumerate(self.residues_i.id.values)
        }
        self.id_map_j = {
            id_: j for (j, id_) in enumerate(self.residues_j.id.values)
        }

        # unique identifier used during aggregation
        self.id = None

    @classmethod
    def _extract_coords(cls, coords):
        """Flatten a chain's atom table into (atom_ranges, xyz) inputs
        for the distance kernel."""
        C = coords.reset_index(drop=True).reset_index()

        xyz_coords = np.stack((C.x.values, C.y.values, C.z.values)).T

        C_grp = C.groupby("residue_index")
        atom_ranges = np.stack((
            C_grp.first().loc[:, "index"].values,
            C_grp.last().loc[:, "index"].values,
        )).T
        return atom_ranges, xyz_coords

    @classmethod
    def from_coords(cls, chain_i, chain_j=None):
        """Compute a distance map from chain coordinates (symmetric if
        only one chain is given)."""
        ranges_i, coords_i = cls._extract_coords(chain_i.coords)

        if chain_j is None:
            symmetric = True
            chain_j = chain_i
            ranges_j, coords_j = ranges_i, coords_i
        else:
            symmetric = False
            ranges_j, coords_j = cls._extract_coords(chain_j.coords)

        dists = min_atom_distances(
            ranges_i, coords_i, ranges_j, coords_j, symmetric
        )

        return cls(chain_i.residues, chain_j.residues, dists, symmetric)

    @classmethod
    def from_file(cls, filename):
        """Load a distance map from its <prefix>.csv/.npy file pair."""
        return cls.from_files(filename + ".csv", filename + ".npy")

    @classmethod
    def from_files(cls, residue_table_file, distance_matrix_file):
        """Load with explicit residue-table (.csv) and matrix (.npy)
        paths."""
        residues = pd.read_csv(
            residue_table_file,
            index_col=0,
            dtype={
                "id": str,
                "seqres_id": str,
                "coord_id": str,
            },
        )
        dist_matrix = np.load(distance_matrix_file)

        if "axis" in residues.columns:
            symmetric = False
            residues_i = residues.query("axis == 'i'").drop("axis", axis=1)
            residues_j = residues.query("axis == 'j'").drop("axis", axis=1)
        else:
            symmetric = True
            residues_i = residues
            residues_j = residues

        return cls(residues_i, residues_j, dist_matrix, symmetric)

    def to_file(self, filename):
        """Persist as <filename>.csv (residue tables) + .npy (matrix);
        returns both paths."""
        if self.symmetric:
            residues = self.residues_i
        else:
            residues = pd.concat([
                self.residues_i.assign(axis="i"),
                self.residues_j.assign(axis="j"),
            ])

        residue_table_filename = filename + ".csv"
        residues.to_csv(residue_table_filename, index=True)

        dist_mat_filename = filename + ".npy"
        np.save(dist_mat_filename, self.dist_matrix)

        return residue_table_filename, dist_mat_filename

    def dist(self, i, j, raise_na=True):
        """Distance of residue pair (i, j); KeyError or NaN for
        identifiers missing from an axis."""
        i, j = str(i), str(j)

        if i not in self.id_map_i:
            if raise_na:
                raise KeyError(
                    "{} not contained in first axis of distance "
                    "map".format(i)
                )
            return np.nan
        if j not in self.id_map_j:
            if raise_na:
                raise KeyError(
                    "{} not contained in second axis of distance "
                    "map".format(j)
                )
            return np.nan

        return self.dist_matrix[self.id_map_i[i], self.id_map_j[j]]

    def __getitem__(self, identifiers):
        i, j = identifiers
        return self.dist(i, j, raise_na=True)

    def contacts(self, max_dist=5.0, min_dist=None):
        """Table of residue pairs with max_dist >= distance
        (> min_dist), excluding the diagonal."""
        if min_dist is None:
            cond = np.where(self.dist_matrix <= max_dist)
        else:
            cond = np.where(
                (self.dist_matrix <= max_dist)
                & (self.dist_matrix > min_dist)
            )

        i_all, j_all = cond
        nodiag = i_all != j_all
        i = i_all[nodiag]
        j = j_all[nodiag]

        contacts = pd.DataFrame()
        contacts.loc[:, "i"] = self.residues_i.id.values[i]
        contacts.loc[:, "j"] = self.residues_j.id.values[j]
        contacts.loc[:, "dist"] = self.dist_matrix[i, j]
        return contacts

    def transpose(self):
        """Swap the two axes."""
        return DistanceMap(
            self.residues_j, self.residues_i,
            self.dist_matrix.T, self.symmetric,
        )

    @classmethod
    def aggregate(cls, *matrices, intersect=False, agg_func=np.nanmin):
        """Aggregate several distance maps (default: elementwise
        nanmin) over the union (or intersection) of their numeric
        residue ids; secondary structure is merged by majority vote
        with ties preferring H over E over C."""
        def _sse_count(secstruct_elements):
            counts = Counter(secstruct_elements.dropna())
            sorted_sse = sorted(counts.items(), key=itemgetter(1, 0))
            if len(sorted_sse) == 0:
                return np.nan
            return sorted_sse[-1][0]

        def _merge_axis(axis):
            dm = [getattr(m, axis) for m in matrices]

            try:
                ids = [pd.to_numeric(m.id).astype(int) for m in dm]
            except ValueError as e:
                raise ValueError(
                    "Residue indices must be all numeric for aggregate "
                    "function (no insertion codes allowed)"
                ) from e

            id_sets = [set(id_list) for id_list in ids]

            if intersect:
                new_ids = set.intersection(*id_sets)
                if len(new_ids) == 0:
                    raise ValueError(
                        "Intersection of positions on axis "
                        "is empty, try intersect=False instead "
                        "or remove non-overlapping DistanceMap(s)."
                    )
            else:
                new_ids = set.union(*id_sets)

            new_axis_df = pd.DataFrame(sorted(new_ids), columns=["id"])

            # per-matrix mapping from source row index to new row index
            new_axis_map = new_axis_df.reset_index()
            mappings = [
                new_axis_map.merge(
                    id_list.to_frame("id").reset_index(drop=True)
                    .reset_index(),
                    on="id", how="inner",
                    suffixes=("_agg", "_src"),
                )
                for id_list in ids
            ]

            new_axis_df = new_axis_df.assign(
                id=new_axis_df.loc[:, "id"].astype(str)
            )

            # column-prefix all per-structure annotations with the map id
            dm_ids = [
                (str(m.id).replace(cls._id_separator, "")
                 if m.id is not None else i)
                for i, m in enumerate(matrices)
            ]

            # drop previously merged secondary structure so iterative
            # aggregation does not re-merge it
            dm_dropped = [
                m.drop(["sec_struct_3state"], axis=1)
                if len(m.filter(
                    regex=cls._id_separator + "sec_struct_3state"
                ).columns) >= 1 else m
                for m in dm
            ]

            dm_prefixed = [
                m.set_index("id").rename(
                    columns={
                        c: "{}{}{}".format(id_, cls._id_separator, c)
                        for c in m.columns
                        if cls._id_separator not in c
                    }
                )
                for id_, m in zip(dm_ids, dm_dropped)
            ]

            individual_dm_merged = pd.concat(
                dm_prefixed, axis=1,
                join="inner" if intersect else "outer", sort=True,
            )
            individual_dm_merged.index.name = "id"

            secstruct_columns = individual_dm_merged.filter(
                regex=cls._id_separator + "sec_struct_3state"
            )
            if len(secstruct_columns.columns) >= 1:
                merged_sse = secstruct_columns.apply(
                    _sse_count, axis=1
                ).to_frame("sec_struct_3state")
                new_axis_df = new_axis_df.merge(
                    merged_sse.reset_index(), on="id", how="left"
                )

            new_axis_df = new_axis_df.merge(
                individual_dm_merged.reset_index(), on="id", how="left"
            )
            return new_axis_df, mappings

        symmetries = np.array([m.symmetric for m in matrices])
        if not np.all(symmetries[0] == symmetries):
            raise ValueError(
                "DistanceMaps are mixed symmetric/non-symmetric."
            )

        new_res_i, maps_i = _merge_axis("residues_i")
        new_res_j, maps_j = _merge_axis("residues_j")

        new_mat = np.full(
            (len(matrices), len(new_res_i), len(new_res_j)), np.nan
        )

        for k, m in enumerate(matrices):
            i_src, j_src = np.meshgrid(
                maps_i[k].index_src.values,
                maps_j[k].index_src.values,
                indexing="ij",
            )
            i_agg, j_agg = np.meshgrid(
                maps_i[k].index_agg.values,
                maps_j[k].index_agg.values,
                indexing="ij",
            )
            if (len(i_agg) == 0 or len(j_agg) == 0
                    or len(i_src) == 0 or len(j_src) == 0):
                raise ValueError(
                    "Trying to aggregate distance matrices on empty "
                    "set of positions."
                )
            new_mat[k][i_agg, j_agg] = m.dist_matrix[i_src, j_src]

        agg_mat = agg_func(new_mat, axis=0)

        return DistanceMap(new_res_i, new_res_j, agg_mat, symmetries[0])

    def structure_coverage(self):
        """Residue segments covered by each constituent structure, as
        (coverage_i, coverage_j, coverage_id) tuples."""
        def _get_coverage_for_axis(axis):
            coverage_col_name = "coord_id"
            residue_map = getattr(self, "residues_" + axis)

            try:
                residue_map = residue_map.assign(
                    id=pd.to_numeric(residue_map.id)
                )
            except ValueError as e:
                raise ValueError(
                    "Residue indices must be all numeric for aggregate "
                    "function (no insertion codes allowed)"
                ) from e

            residue_map = residue_map.set_index("id")

            if coverage_col_name in residue_map:
                coverage_cols = residue_map[[coverage_col_name]]
            else:
                coverage_cols = residue_map.filter(
                    regex=self._id_separator + coverage_col_name
                )

            def _get_col_name(col_name):
                if col_name == coverage_col_name:
                    return self.id
                return col_name.split(self._id_separator)[0]

            return {
                _get_col_name(col_name): find_segments(
                    series.dropna().sort_index().index
                )
                for col_name, series in coverage_cols.items()
            }

        coverage_i = _get_coverage_for_axis("i")
        coverage_j = _get_coverage_for_axis("j")
        joint_keys = {k for k in coverage_i if k in coverage_j}
        return [(coverage_i[k], coverage_j[k], k) for k in joint_keys]


def _prepare_structures(structures, pdb_id_list, raise_missing=True):
    """Load structures if given as None / directory path."""
    if structures is None or isinstance(structures, str):
        structures = load_structures(
            pdb_id_list, structures, raise_missing
        )
    return structures


def _prepare_chain(structures, pdb_id, pdb_chain, atom_filter, mapping,
                   model=0):
    """Extract chain, apply atom filter, remap to target numbering."""
    chain = structures[pdb_id].get_chain(pdb_chain, model)
    if atom_filter is not None:
        chain = chain.filter_atoms(atom_filter)
    return chain.remap(mapping)


class _RunningAggregate:
    """The bookkeeping every distance-map aggregation entry point
    (intra/multimer/inter) needs around its per-structure loop: a
    running min-aggregate, optional persistence of each individual
    map under an output prefix, and the final attachment of the
    individual-map file table to the aggregate."""

    def __init__(self, intersect=False, output_prefix=None):
        self.intersect = intersect
        self.output_prefix = output_prefix
        self.agg = None
        self.records = []
        if output_prefix is not None:
            create_prefix_folders(output_prefix)

    def add(self, distmap, **index_fields):
        """Fold one individual map into the aggregate. index_fields
        name the hit(s) it came from; they become both the filename
        suffix and the leading columns of the individual-map table."""
        if self.output_prefix is not None:
            suffix = "_".join(str(v) for v in index_fields.values())
            residue_table, dist_mat = distmap.to_file(
                "{}_{}".format(self.output_prefix, suffix)
            )
            self.records.append({
                **index_fields,
                "residue_table": residue_table,
                "distance_matrix": dist_mat,
            })

        if self.agg is None:
            self.agg = distmap
        else:
            self.agg = DistanceMap.aggregate(
                self.agg, distmap, intersect=self.intersect
            )

    def result(self):
        if self.agg is not None:
            self.agg.individual_distance_map_table = (
                pd.DataFrame(self.records) if self.records else None
            )
        return self.agg


def _require_hits(*sifts_results):
    if any(len(s.hits) == 0 for s in sifts_results):
        raise ValueError(
            "sifts_result is empty (no structure hits, but at least "
            "one required)"
        )


def intra_dists(sifts_result, structures=None, atom_filter=None,
                intersect=False, output_prefix=None, model=0,
                raise_missing=True):
    """Aggregated intra-chain distance map across all structure hits.

    See reference distances.py:863-1017 for the detailed contract;
    attaches aggregated_residue_maps and (with output_prefix)
    individual_distance_map_table to the result.
    """
    _require_hits(sifts_result)
    structures = _prepare_structures(
        structures, sifts_result.hits.pdb_id, raise_missing
    )

    running = _RunningAggregate(intersect, output_prefix)
    individual_residue_maps = []

    for i, r in sifts_result.hits.iterrows():
        if not raise_missing and r["pdb_id"] not in structures:
            continue

        chain = _prepare_chain(
            structures, r["pdb_id"], r["pdb_chain"],
            atom_filter, sifts_result.mapping[r["mapping_index"]],
            model,
        )
        if len(chain.residues) == 0:
            continue

        distmap = DistanceMap.from_coords(chain)
        distmap.id = i

        individual_residue_maps.append(
            distmap.residues_i.assign(sifts_table_index=i)
        )
        running.add(distmap, sifts_table_index=i)

    agg_distmap = running.result()
    if agg_distmap is not None:
        agg_distmap.aggregated_residue_maps = pd.concat(
            individual_residue_maps
        ).reset_index(drop=True)
    return agg_distmap


def multimer_dists(sifts_result, structures=None, atom_filter=None,
                   intersect=False, output_prefix=None, model=0,
                   raise_missing=True):
    """Aggregated homomultimer distance map: distances between all
    pairs of chains hitting the same entity, symmetrized by min over
    both orientations."""
    _require_hits(sifts_result)
    structures = _prepare_structures(
        structures, sifts_result.hits.pdb_id, raise_missing
    )

    running = _RunningAggregate(intersect, output_prefix)

    for pdb_id, grp in sifts_result.hits.reset_index().groupby("pdb_id"):
        if not raise_missing and pdb_id not in structures:
            continue

        chains = [
            (
                r["index"],
                _prepare_chain(
                    structures, r["pdb_id"], r["pdb_chain"],
                    atom_filter,
                    sifts_result.mapping[r["mapping_index"]],
                    model,
                ),
            )
            for _, r in grp.iterrows()
        ]

        for (index_i, ch_i), (index_j, ch_j) in combinations(chains, 2):
            if len(ch_i.residues) == 0 or len(ch_j.residues) == 0:
                continue

            distmap = DistanceMap.from_coords(ch_i, ch_j)
            distmap.id = "{}_{}".format(index_i, index_j)

            # symmetrize: a pair is a contact if close in either
            # orientation
            distmap_transposed = distmap.transpose()
            distmap_transposed.id = distmap.id + "_T"

            distmap_sym = DistanceMap.aggregate(
                distmap, distmap_transposed, intersect=intersect
            )
            distmap_sym.symmetric = True

            running.add(
                distmap_sym,
                sifts_table_index_i=index_i,
                sifts_table_index_j=index_j,
            )

    return running.result()


def inter_dists(sifts_result_i, sifts_result_j, structures=None,
                atom_filter=None, intersect=False, output_prefix=None,
                model=0, raise_missing=True):
    """Aggregated inter-chain distance map between two entities, over
    all chain combinations sharing a PDB id."""
    def _get_chains(sifts_result):
        return {
            i: _prepare_chain(
                structures, r["pdb_id"], r["pdb_chain"],
                atom_filter, sifts_result.mapping[r["mapping_index"]],
                model,
            )
            for i, r in sifts_result.hits.iterrows()
            if raise_missing or r["pdb_id"] in structures
        }

    _require_hits(sifts_result_i, sifts_result_j)
    structures = _prepare_structures(
        structures,
        set(sifts_result_i.hits.pdb_id)
        | set(sifts_result_j.hits.pdb_id),
        raise_missing,
    )

    running = _RunningAggregate(intersect, output_prefix)

    combis = sifts_result_i.hits.reset_index().merge(
        sifts_result_j.hits.reset_index(),
        on="pdb_id", suffixes=("_i", "_j"),
    )

    chains_i = _get_chains(sifts_result_i)
    chains_j = _get_chains(sifts_result_j)

    for _, r in combis.iterrows():
        if not raise_missing and r["pdb_id"] not in structures:
            continue

        index_i = r["index_i"]
        index_j = r["index_j"]

        if (len(chains_i[index_i].residues) == 0
                or len(chains_j[index_j].residues) == 0):
            continue

        distmap = DistanceMap.from_coords(
            chains_i[index_i], chains_j[index_j]
        )
        distmap.id = "{}_{}".format(index_i, index_j)

        running.add(
            distmap,
            sifts_table_index_i=index_i,
            sifts_table_index_j=index_j,
        )

    return running.result()


def _remap_sequence(chain, sequence):
    """Rename chain residues to the target sequence (one- and
    three-letter codes); unmapped residues are dropped."""
    chain = deepcopy(chain)
    chain.residues.loc[:, "one_letter_code"] = chain.residues.id.map(
        sequence
    )
    chain.residues.loc[:, "three_letter_code"] = (
        chain.residues.one_letter_code.map(AA1_to_AA3)
    )
    chain.residues = chain.residues.dropna(
        subset=["one_letter_code", "three_letter_code"]
    )
    return chain


def remap_chains(sifts_result, output_prefix, sequence=None,
                 structures=None, atom_filter=("N", "CA", "C", "O"),
                 model=0, chain_name="A", raise_missing=True):
    """Write all structure hits as PDB files renumbered (and optionally
    re-labeled) to the target sequence. Returns {hit index: path}."""
    structures = _prepare_structures(
        structures, sifts_result.hits.pdb_id, raise_missing
    )

    if output_prefix is not None:
        create_prefix_folders(output_prefix)

    remapped = {}

    # structure residue ids are strings
    if sequence is not None:
        sequence = {str(k): v for k, v in sequence.items()}

    for idx, r in sifts_result.hits.iterrows():
        if not raise_missing and r["pdb_id"] not in structures:
            continue

        chain = _prepare_chain(
            structures, r["pdb_id"], r["pdb_chain"],
            atom_filter, sifts_result.mapping[r["mapping_index"]],
            model,
        )
        if sequence is not None:
            chain = _remap_sequence(chain, sequence)

        filename = "{}_{}_{}_{}.pdb".format(
            output_prefix, r["pdb_id"], r["pdb_chain"],
            r["mapping_index"],
        )
        with open(filename, "w") as f:
            chain.to_file(f, chain_id=chain_name, first_atom_id=1)

        remapped[int(idx)] = filename

    return remapped


def remap_complex_chains(sifts_result_i, sifts_result_j,
                         sequence_i=None, sequence_j=None,
                         structures=None,
                         atom_filter=("N", "CA", "C", "O"),
                         output_prefix=None, raise_missing=True,
                         chain_name_i="A", chain_name_j="B", model=0):
    """Write chain pairs from shared structures as two-chain PDB files
    renumbered to their respective target sequences."""
    if sequence_i is not None:
        sequence_i = {str(k): v for k, v in sequence_i.items()}
    if sequence_j is not None:
        sequence_j = {str(k): v for k, v in sequence_j.items()}

    if output_prefix is not None:
        create_prefix_folders(output_prefix)

    combis = sifts_result_i.hits.reset_index().merge(
        sifts_result_j.hits.reset_index(),
        on="pdb_id", suffixes=("_i", "_j"),
    )

    structures = _prepare_structures(
        structures, combis.pdb_id, raise_missing
    )

    remapped = {}

    for i, r in combis.iterrows():
        # tolerant loading (raise_missing=False) may have dropped this
        # structure entirely — skip it like every sibling
        # (intra/multimer/inter_dists, remap_chains) does
        if not raise_missing and r["pdb_id"] not in structures:
            continue
        chain_i = _prepare_chain(
            structures, r["pdb_id"], r["pdb_chain_i"],
            atom_filter, sifts_result_i.mapping[r["mapping_index_i"]],
            model,
        )
        if sequence_i is not None:
            chain_i = _remap_sequence(chain_i, sequence_i)

        chain_j = _prepare_chain(
            structures, r["pdb_id"], r["pdb_chain_j"],
            atom_filter, sifts_result_j.mapping[r["mapping_index_j"]],
            model,
        )
        if sequence_j is not None:
            chain_j = _remap_sequence(chain_j, sequence_j)

        filename = "{}_{}_{}_{}_{}_{}.pdb".format(
            output_prefix, r["pdb_id"],
            r["pdb_chain_i"], r["mapping_index_i"],
            r["pdb_chain_j"], r["mapping_index_j"],
        )
        with open(filename, "w") as f:
            chain_i.to_file(
                f, chain_id=chain_name_i, first_atom_id=1, end=False
            )
            chain_j.to_file(
                f, chain_id=chain_name_j,
                first_atom_id=len(chain_i.coords) + 1,
            )

        remapped[int(i)] = filename

    return remapped
