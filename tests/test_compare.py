"""
Compare-layer tests: BinaryCIF codec round-trip, PDB/ClassicPDB chain
extraction, min-atom-distance kernel vs loop oracle, DistanceMap
persistence/aggregation, and EC-distance comparison tables.
"""

import numpy as np
import pandas as pd
import pytest

from evcouplings_tpu.compare import bcif
from evcouplings_tpu.compare.distances import DistanceMap
from evcouplings_tpu.compare.ecs import (
    add_distances,
    add_precision,
    coupling_scores_compared,
)
from evcouplings_tpu.compare.mapping import map_indices
from evcouplings_tpu.compare.pdb import PDB, Chain, ClassicPDB
from evcouplings_tpu.ops.distances import min_atom_distances

RNG = np.random.default_rng(41)


def o_min_atom_distances(ranges_i, coords_i, ranges_j, coords_j):
    """Literal loop oracle (reference numba kernel semantics)."""
    N_i = len(ranges_i)
    N_j = len(ranges_j)
    dists = np.zeros((N_i, N_j))
    for i in range(N_i):
        for j in range(N_j):
            best = np.inf
            for a in range(ranges_i[i][0], ranges_i[i][1] + 1):
                for b in range(ranges_j[j][0], ranges_j[j][1] + 1):
                    d = np.sqrt(np.sum((coords_i[a] - coords_j[b]) ** 2))
                    best = min(best, d)
            dists[i, j] = best
    return dists


def random_chain_arrays(n_res=7, seed=1):
    rng = np.random.default_rng(seed)
    counts = rng.integers(1, 6, size=n_res)
    ranges = np.zeros((n_res, 2), dtype=int)
    start = 0
    for i, c in enumerate(counts):
        ranges[i] = (start, start + c - 1)
        start += c
    coords = rng.normal(scale=10, size=(start, 3))
    return ranges, coords


class TestDistanceKernel:
    def test_matches_oracle(self):
        ri, ci = random_chain_arrays(7, seed=1)
        rj, cj = random_chain_arrays(5, seed=2)
        got = min_atom_distances(ri, ci, rj, cj)
        assert got == pytest.approx(o_min_atom_distances(ri, ci, rj, cj))

    def test_symmetric_case(self):
        ri, ci = random_chain_arrays(6, seed=3)
        got = min_atom_distances(ri, ci, ri, ci, symmetric=True)
        assert got == pytest.approx(got.T)
        assert np.all(np.diag(got) == 0)

    def test_blocked_rows(self):
        ri, ci = random_chain_arrays(20, seed=4)
        rj, cj = random_chain_arrays(9, seed=5)
        blocked = min_atom_distances(ri, ci, rj, cj, block_rows=3)
        full = min_atom_distances(ri, ci, rj, cj)
        assert blocked == pytest.approx(full)


def make_chain(ids, coords_per_res, seed=0, seqres_start=1):
    """Chain with one CA atom per residue at given coordinates."""
    residues = pd.DataFrame({
        "id": [str(i) for i in ids],
        "seqres_id": [str(seqres_start + k) for k in range(len(ids))],
        "coord_id": [str(i) for i in ids],
        "one_letter_code": ["A"] * len(ids),
        "three_letter_code": ["ALA"] * len(ids),
        "chain_id": ["A"] * len(ids),
        "sec_struct_3state": ["H"] * len(ids),
        "hetatm": [False] * len(ids),
    })
    residues.index.name = "residue_index"
    coords = pd.DataFrame({
        "residue_index": np.arange(len(ids)),
        "atom_id": np.arange(1, len(ids) + 1),
        "atom_name": ["CA"] * len(ids),
        "element": ["C"] * len(ids),
        "charge": [np.nan] * len(ids),
        "x": [c[0] for c in coords_per_res],
        "y": [c[1] for c in coords_per_res],
        "z": [c[2] for c in coords_per_res],
        "alt_loc": [""] * len(ids),
        "occupancy": [1.0] * len(ids),
        "b_factor": [20.0] * len(ids),
    })
    return Chain(residues, coords)


class TestDistanceMap:
    def linear_chain(self, n=5, spacing=4.0, ids=None):
        ids = ids if ids is not None else range(1, n + 1)
        coords = [(i * spacing, 0.0, 0.0) for i in range(n)]
        return make_chain(list(ids), coords)

    def test_from_coords_symmetric(self):
        ch = self.linear_chain()
        dm = DistanceMap.from_coords(ch)
        assert dm.symmetric
        assert dm.dist(1, 2) == pytest.approx(4.0)
        assert dm.dist("1", "5") == pytest.approx(16.0)
        with pytest.raises(KeyError):
            dm.dist(99, 1)
        assert np.isnan(dm.dist(99, 1, raise_na=False))

    def test_contacts(self):
        dm = DistanceMap.from_coords(self.linear_chain())
        contacts = dm.contacts(max_dist=4.5)
        pairs = set(zip(contacts.i, contacts.j))
        # adjacent pairs only, both directions
        assert ("1", "2") in pairs and ("2", "1") in pairs
        assert ("1", "3") not in pairs

    def test_file_roundtrip(self, tmp_path):
        dm = DistanceMap.from_coords(self.linear_chain())
        prefix = str(tmp_path / "dm")
        dm.to_file(prefix)
        dm2 = DistanceMap.from_file(prefix)
        assert dm2.symmetric
        assert dm2.dist_matrix == pytest.approx(dm.dist_matrix)
        assert dm2.dist(1, 5) == pytest.approx(16.0)

    def test_asymmetric_roundtrip(self, tmp_path):
        ch_i = self.linear_chain(4)
        ch_j = self.linear_chain(6)
        dm = DistanceMap.from_coords(ch_i, ch_j)
        assert not dm.symmetric
        prefix = str(tmp_path / "dm2")
        dm.to_file(prefix)
        dm2 = DistanceMap.from_file(prefix)
        assert not dm2.symmetric
        assert dm2.dist_matrix.shape == (4, 6)

    def test_aggregate_min(self):
        # map 1 covers residues 1-5, map 2 covers 3-7 shifted closer
        dm1 = DistanceMap.from_coords(self.linear_chain(5))
        dm2 = DistanceMap.from_coords(
            self.linear_chain(5, spacing=2.0, ids=range(3, 8))
        )
        agg = DistanceMap.aggregate(dm1, dm2)
        # union of ids 1..7
        assert list(agg.residues_i.id) == [str(i) for i in range(1, 8)]
        # overlapping pair (3,4): min(4.0, 2.0) = 2.0
        assert agg.dist(3, 4) == pytest.approx(2.0)
        # pair only in map 1
        assert agg.dist(1, 2) == pytest.approx(4.0)
        # pair only in map 2
        assert agg.dist(6, 7) == pytest.approx(2.0)
        # never-covered combination -> nan
        assert np.isnan(agg.dist(1, 7))

    def test_remap_and_filter(self):
        ch = self.linear_chain(5)
        remapped = ch.remap({(1, 5): (101, 105)}, source_id="id")
        assert list(remapped.residues.id) == [
            "101", "102", "103", "104", "105"
        ]
        sub = remapped.filter_positions([101, 103])
        assert len(sub.residues) == 2
        assert len(sub.coords) == 2


class TestBcifCodec:
    def test_roundtrip_numeric_and_string(self, tmp_path):
        path = str(tmp_path / "test.bcif")
        bcif.write_bcif(path, {
            "_test": {
                "ints": np.arange(10),
                "floats": np.linspace(-1, 1, 10),
                "strings": ["a", "bb", "a", "", "ccc"] * 2,
            }
        })
        import msgpack
        with open(path, "rb") as f:
            raw = msgpack.unpack(f, use_list=True)
        cols = {
            c["name"]: c
            for c in raw["dataBlocks"][0]["categories"][0]["columns"]
        }
        assert bcif.decode_column(cols["ints"]) == pytest.approx(
            np.arange(10)
        )
        assert bcif.decode_column(cols["floats"]) == pytest.approx(
            np.linspace(-1, 1, 10), abs=1e-3
        )
        assert list(bcif.decode_column(cols["strings"])) == [
            "a", "bb", "a", "", "ccc"
        ] * 2

    def test_integer_packing_matches_scalar_oracle(self):
        def oracle(data, is_unsigned):
            info = np.iinfo(data.dtype)
            out, value = [], 0
            for v in data:
                value += int(v)
                if not (v == info.max
                        or (not is_unsigned and v == info.min)):
                    out.append(value)
                    value = 0
            return out

        # unsigned int8: boundary = 255
        data = np.array(
            [3, 255, 255, 10, 0, 255, 1, 200], dtype=np.uint8
        )
        enc = {"isUnsigned": True, "srcSize": 8}
        got = bcif._decode_integer_packing(data, enc)
        assert list(got) == oracle(data, True)

        # signed int8: boundaries = +-127/-128
        data = np.array(
            [127, 127, 5, -128, -4, 0, 127, 1], dtype=np.int8
        )
        enc = {"isUnsigned": False, "srcSize": 8}
        got = bcif._decode_integer_packing(data, enc)
        assert list(got) == oracle(data, False)

        # trailing boundary without terminator carries no value
        data = np.array([4, 255, 255], dtype=np.uint8)
        got = bcif._decode_integer_packing(
            data, {"isUnsigned": True, "srcSize": 3}
        )
        assert list(got) == [4]

        # random large arrays, both signednesses
        rng = np.random.default_rng(5)
        for dtype, unsigned in ((np.uint8, True), (np.int16, False)):
            data = rng.integers(
                np.iinfo(dtype).min if not unsigned else 0,
                np.iinfo(dtype).max, size=5000, endpoint=True
            ).astype(dtype)
            got = bcif._decode_integer_packing(
                data, {"isUnsigned": unsigned, "srcSize": 5000}
            )
            assert list(got) == oracle(data, unsigned)

    def test_delta_runlength_decoders(self):
        # delta: [100, 1, 1, 1] with origin 0 -> [100, 101, 102, 103]
        data = np.array([100, 1, 1, 1], dtype="<i4")
        out = bcif.decode_data(
            data.tobytes(),
            [{"kind": "Delta", "origin": 0, "srcType": 3},
             {"kind": "ByteArray", "type": 3}],
        )
        assert list(out) == [100, 101, 102, 103]

        # run-length: [(7, 3), (9, 2)] -> [7,7,7,9,9]
        data = np.array([7, 3, 9, 2], dtype="<i4")
        out = bcif.decode_data(
            data.tobytes(),
            [{"kind": "RunLength", "srcType": 3, "srcSize": 5},
             {"kind": "ByteArray", "type": 3}],
        )
        assert list(out) == [7, 7, 7, 9, 9]


def write_synthetic_bcif(path, n_res=5):
    """Minimal _atom_site + helix annotation for PDB class parsing."""
    n_atoms = n_res * 2  # CA + CB per residue
    res_ids = np.repeat(np.arange(1, n_res + 1), 2)
    atom_names = ["CA", "CB"] * n_res
    coords = np.zeros((n_atoms, 3))
    coords[:, 0] = np.repeat(np.arange(n_res) * 4.0, 2)
    coords[1::2, 1] = 1.5  # CB offset

    bcif.write_bcif(path, {
        "_atom_site": {
            "pdbx_PDB_model_num": np.ones(n_atoms, dtype=int),
            "group_PDB": ["ATOM"] * n_atoms,
            "id": np.arange(1, n_atoms + 1),
            "type_symbol": ["C"] * n_atoms,
            "label_atom_id": atom_names,
            "auth_atom_id": atom_names,
            "label_alt_id": [""] * n_atoms,
            "label_comp_id": ["ALA"] * n_atoms,
            "auth_comp_id": ["ALA"] * n_atoms,
            "label_asym_id": ["A"] * n_atoms,
            "auth_asym_id": ["A"] * n_atoms,
            "label_entity_id": ["1"] * n_atoms,
            "label_seq_id": res_ids,
            "auth_seq_id": res_ids + 100,
            "pdbx_PDB_ins_code": [""] * n_atoms,
            "Cartn_x": coords[:, 0],
            "Cartn_y": coords[:, 1],
            "Cartn_z": coords[:, 2],
            "occupancy": np.ones(n_atoms),
            "B_iso_or_equiv": np.full(n_atoms, 20.0),
            "pdbx_formal_charge": np.zeros(n_atoms, dtype=int),
        },
        "_struct_conf": {
            "conf_type_id": ["HELX_P"],
            "id": ["H1"],
            "beg_label_asym_id": ["A"],
            "beg_label_seq_id": np.array([1]),
            "end_label_asym_id": ["A"],
            "end_label_seq_id": np.array([3]),
        },
    })


class TestPDBParsing:
    def test_bcif_get_chain(self, tmp_path):
        path = str(tmp_path / "xxxx.bcif")
        write_synthetic_bcif(path)

        structure = PDB.from_file(path)
        assert structure.models == [1]
        assert structure.model_to_chains[1] == ["A"]

        chain = structure.get_chain("A")
        assert len(chain.residues) == 5
        assert len(chain.coords) == 10
        # author numbering used as id
        assert list(chain.residues.id) == [
            "101", "102", "103", "104", "105"
        ]
        assert list(chain.residues.seqres_id) == [
            "1", "2", "3", "4", "5"
        ]
        # helix 1-3, coil rest
        assert list(chain.residues.sec_struct_3state) == [
            "H", "H", "H", "C", "C"
        ]
        assert list(chain.residues.one_letter_code) == ["A"] * 5

        ca = chain.filter_atoms("CA")
        assert len(ca.coords) == 5

        dm = DistanceMap.from_coords(ca)
        assert dm.dist(101, 102) == pytest.approx(4.0)

    def test_masked_float_label_seq_id_yields_clean_seqres(
            self, tmp_path):
        """When the bcif label_seq_id column carries a mask (any
        HETATM/water does in real RCSB files), decode promotes it to
        float64 with NaN; seqres_id must still be plain integer
        strings ("5", not "5.0") or NA — SIFTS mapping keys never
        contain the float form."""
        path = str(tmp_path / "zzzz.bcif")
        write_synthetic_bcif(path)
        structure = PDB.from_file(path)

        # simulate the mask-promoted column: float64 with one NaN
        structure.atom_table["label_seq_id"] = (
            structure.atom_table.label_seq_id.astype(np.float64)
        )
        structure.atom_table.loc[
            structure.atom_table.index[-2:], "label_seq_id"
        ] = np.nan

        chain = structure.get_chain("A")
        ids = list(chain.residues.seqres_id)
        assert ids[:4] == ["1", "2", "3", "4"]
        assert pd.isna(ids[4])

    def test_chain_to_file_and_classic_parse(self, tmp_path):
        path = str(tmp_path / "yyyy.bcif")
        write_synthetic_bcif(path)
        chain = PDB.from_file(path).get_chain("A")

        pdb_file = str(tmp_path / "out.pdb")
        with open(pdb_file, "w") as f:
            chain.to_file(f, chain_id="A")

        classic = ClassicPDB.from_file(pdb_file)
        chain2 = classic.get_chain("A")
        assert len(chain2.residues) == 5
        assert len(chain2.coords) == 10
        assert list(chain2.residues.id) == [
            "101", "102", "103", "104", "105"
        ]
        # coordinates survive the round-trip
        merged = chain.coords.merge(
            chain2.coords, on=["residue_index", "atom_name"],
            suffixes=("_a", "_b"),
        )
        assert merged.x_a.values == pytest.approx(merged.x_b.values)
        assert merged.z_a.values == pytest.approx(merged.z_b.values)


class TestCompareEcs:
    def make_ec_table(self):
        return pd.DataFrame({
            "i": [1, 1, 2, 1],
            "j": [10, 11, 12, 2],
            "cn": [1.0, 0.8, 0.6, 0.9],
        })

    def make_dist_map(self):
        n = 12
        ids = range(1, n + 1)
        coords = [(i * 2.0, 0, 0) for i in range(n)]
        return DistanceMap.from_coords(make_chain(list(ids), coords))

    def test_add_distances(self):
        x = add_distances(self.make_ec_table(), self.make_dist_map())
        assert x.dist.iloc[0] == pytest.approx(18.0)  # |1-10| * 2
        assert x.dist.iloc[3] == pytest.approx(2.0)

    def test_add_precision(self):
        x = add_distances(self.make_ec_table(), self.make_dist_map())
        p = add_precision(x, dist_cutoff=19.0, min_sequence_dist=6)
        # sorted by cn: (1,10) d=18 TP; (1,11) d=20 FP; (2,12) d=20 FP
        assert list(p.precision) == pytest.approx([1.0, 0.5, 1 / 3])

    def test_coupling_scores_compared(self, tmp_path):
        out = str(tmp_path / "cmp.csv")
        x = coupling_scores_compared(
            self.make_ec_table(), self.make_dist_map(),
            dist_cutoff=19.0, min_sequence_dist=6, output_file=out,
        )
        assert "precision" in x.columns
        assert len(pd.read_csv(out)) == 3  # short-range pair dropped


class TestMapIndices:
    def test_gapped_mapping(self):
        df = map_indices("AC-DE", 1, 4, "A-GDE", 10, 13)
        # pos 1<->10 aligned, C unaligned, gap<->G, D/E aligned
        row0 = df.iloc[0]
        assert (row0.i, row0.j) == ("1", "10")
        aligned = df.dropna()
        assert list(aligned.i) == ["1", "3", "4"]
        assert list(aligned.j) == ["10", "12", "13"]


class TestClassicPDBRegressions:
    MULTI_MODEL = (
        "MODEL        1\n"
        "ATOM      1  CA  ALA A   1      11.000  12.000  13.000"
        "  1.00 20.00           C\n"
        "ENDMDL\n"
        "MODEL        2\n"
        "ATOM      1  CA  ALA A   1      21.000  22.000  23.000"
        "  1.00 20.00           C\n"
        "ENDMDL\n"
        "END\n"
    )

    def test_multi_model_get_chain_uses_index(self, tmp_path):
        """`model` is an index into self.models, not the PDB MODEL
        serial — multi-model (NMR-style) files start their serials at
        1, so treating the default model=0 as a serial made every such
        file raise."""
        path = tmp_path / "multi.pdb"
        path.write_text(self.MULTI_MODEL)
        pdb = ClassicPDB.from_file(str(path))
        assert pdb.models == [1, 2]
        chain0 = pdb.get_chain("A", model=0)
        chain1 = pdb.get_chain("A", model=1)
        assert chain0.coords.iloc[0].x == pytest.approx(11.0)
        assert chain1.coords.iloc[0].x == pytest.approx(21.0)
        with pytest.raises(ValueError, match="model index"):
            pdb.get_chain("A", model=2)

    def test_blank_occupancy_and_bfactor_parse_as_nan(self, tmp_path):
        """Full-width ATOM lines with whitespace occupancy/B-factor
        columns (common in generated/modeling PDBs) must parse, not
        crash float('      ')."""
        text = (
            "ATOM      1  CA  ALA A   1      11.000  12.000  13.000"
            "                           C\n"
            "END\n"
        )
        path = tmp_path / "blank.pdb"
        path.write_text(text)
        pdb = ClassicPDB.from_file(str(path))
        chain = pdb.get_chain("A")
        row = chain.coords.iloc[0]
        assert np.isnan(row.occupancy) and np.isnan(row.b_factor)


def test_remap_complex_chains_skips_missing_structures(tmp_path):
    """Tolerant loading (raise_missing=False) may drop a structure
    that both monomers hit; the remap loop must skip it like its
    siblings instead of raising KeyError."""
    import pandas as pd

    from evcouplings_tpu.compare.distances import remap_complex_chains
    from evcouplings_tpu.compare.sifts import SIFTSResult

    hits = pd.DataFrame({
        "pdb_id": ["9xyz"], "pdb_chain": ["A"],
        "mapping_index": [0],
    })
    hits_i = hits.rename(columns={"pdb_chain": "pdb_chain"})
    mapping = {0: {"1": "1"}}
    res = SIFTSResult(hits_i, mapping)

    out = remap_complex_chains(
        res, res, structures={},       # the structure failed to load
        output_prefix=str(tmp_path / "rm"),
        raise_missing=False,
    )
    assert out == {}


def test_index_list_setter_stays_lazy():
    """Renumbering a model whose EC table was never computed must not
    eagerly pay the O(L^2 q^2) EC computation (the lazy properties
    compute on demand with the new numbering)."""
    from evcouplings_tpu.couplings.model import CouplingsModel

    L, q = 5, 4
    rng = np.random.default_rng(0)
    J = rng.normal(size=(L, L, q, q))
    J = 0.5 * (J + J.transpose(1, 0, 3, 2))
    J[np.arange(L), np.arange(L)] = 0.0
    h = rng.normal(size=(L, q))
    f = np.full((L, q), 1.0 / q)
    fij = np.full((L, L, q, q), 1.0 / q ** 2)
    m = CouplingsModel.from_params(
        J_ij=J, h_i=h, f_i=f, f_ij=fij, alphabet="-ACD",
        target_seq=np.array(list("ACDAC")),
        index_list=np.arange(1, L + 1), weights=np.ones(3),
        theta=0.8, lambda_h=0.01, lambda_J=0.01, lambda_group=0.0,
        N_valid=3, N_invalid=0, num_iter=1, N_eff=3.0,
    )
    m.index_list = np.arange(11, 11 + L)
    assert m._ecs is None              # still lazy
    ecs = m.ecs                        # computed on demand...
    assert set(ecs.i).issubset(set(range(11, 11 + L)))
    m.index_list = np.arange(21, 21 + L)
    assert m._ecs is not None          # stale table refreshed eagerly
    assert set(m.ecs.i).issubset(set(range(21, 21 + L)))
