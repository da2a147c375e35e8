"""
End-to-end compare protocol test on fully synthetic inputs: a SIFTS
table + local BinaryCIF structure where the planted EC pair is a true
3D contact.
"""

import os

import numpy as np
import pandas as pd
import pytest

from test_compare import write_synthetic_bcif
from evcouplings_tpu.compare import bcif
from evcouplings_tpu.compare import protocol as compare_protocol
from evcouplings_tpu.compare.sifts import SIFTS


def write_structure_bcif(path, n_res=18, contact=(3, 10)):
    """Chain with CA atoms on a line, except residues `contact` placed
    3.8 A apart (a true contact)."""
    res_ids = np.arange(1, n_res + 1)
    coords = np.zeros((n_res, 3))
    coords[:, 0] = np.arange(n_res) * 6.0
    i, j = contact
    coords[j - 1] = coords[i - 1] + np.array([0.0, 3.8, 0.0])

    bcif.write_bcif(path, {
        "_atom_site": {
            "pdbx_PDB_model_num": np.ones(n_res, dtype=int),
            "group_PDB": ["ATOM"] * n_res,
            "id": res_ids,
            "type_symbol": ["C"] * n_res,
            "label_atom_id": ["CA"] * n_res,
            "auth_atom_id": ["CA"] * n_res,
            "label_alt_id": [""] * n_res,
            "label_comp_id": ["ALA"] * n_res,
            "auth_comp_id": ["ALA"] * n_res,
            "label_asym_id": ["A"] * n_res,
            "auth_asym_id": ["A"] * n_res,
            "label_entity_id": ["1"] * n_res,
            "label_seq_id": res_ids,
            "auth_seq_id": res_ids,
            "pdbx_PDB_ins_code": [""] * n_res,
            "Cartn_x": coords[:, 0],
            "Cartn_y": coords[:, 1],
            "Cartn_z": coords[:, 2],
            "occupancy": np.ones(n_res),
            "B_iso_or_equiv": np.full(n_res, 20.0),
            "pdbx_formal_charge": np.zeros(n_res, dtype=int),
        },
    })


@pytest.fixture
def compare_setup(tmp_path):
    # SIFTS table: structure 1abc chain A, seqres 1-18 = uniprot 11-28
    sifts_table = tmp_path / "sifts.csv"
    pd.DataFrame([{
        "pdb_id": "1abc",
        "pdb_chain": "A",
        "uniprot_ac": "TESTPROT",
        "resseq_start": 1,
        "resseq_end": 18,
        "coord_start": "1",
        "coord_end": "18",
        "uniprot_start": 11,
        "uniprot_end": 28,
    }]).to_csv(sifts_table, index=False)

    # local structure dir with the bcif file
    structure_dir = tmp_path / "structures"
    structure_dir.mkdir()
    write_structure_bcif(str(structure_dir / "1abc.bcif"))

    # EC table in pipeline format (positions 11..28)
    ecs = pd.DataFrame({
        "i": [13, 12, 11],
        "A_i": ["A", "A", "A"],
        "j": [20, 26, 24],
        "A_j": ["A", "A", "A"],
        "fn": [1.2, 0.4, 0.3],
        "cn": [1.0, 0.3, 0.2],
        "probability": [0.99, 0.5, 0.4],
        "score": [1.0, 0.3, 0.2],
    })
    ec_file = tmp_path / "ECs.csv"
    ecs.to_csv(ec_file, index=False)

    # target sequence file
    target_seq_file = tmp_path / "target.fa"
    target_seq_file.write_text(">TESTPROT/11-28\n" + "A" * 18 + "\n")

    return {
        "tmp_path": tmp_path,
        "sifts_table": str(sifts_table),
        "structure_dir": str(structure_dir),
        "ec_file": str(ec_file),
        "target_seq_file": str(target_seq_file),
    }


class TestSIFTS:
    def test_by_uniprot_and_pdb_id(self, compare_setup):
        s = SIFTS(compare_setup["sifts_table"])
        res = s.by_uniprot_id("TESTPROT")
        assert len(res.hits) == 1
        assert res.hits.pdb_id.iloc[0] == "1abc"
        assert res.mapping[0] == {(1, 18): (11, 28)}

        res2 = s.by_pdb_id("1abc", pdb_chain="A")
        assert len(res2.hits) == 1

    def test_unknown_id_gives_empty(self, compare_setup):
        s = SIFTS(compare_setup["sifts_table"])
        res = s.by_uniprot_id("NOPE")
        assert len(res.hits) == 0

    def test_fetch_uniprot_mapping_streams_results(self, monkeypatch):
        """The paged /results/ endpoint caps responses at 500 records;
        the fetch must rewrite the redirect URL to /results/stream/ so
        large chunks are never silently truncated."""
        import urllib.request

        from evcouplings_tpu.compare import sifts as sifts_mod

        fetched = []

        class FakeResponse:
            def __init__(self, payload):
                self.payload = payload
                self.headers = {}

            def read(self):
                return self.payload.encode()

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        def fake_urlopen(url, data=None):
            fetched.append(url)
            if url.endswith("/idmapping/run"):
                return FakeResponse('{"jobId": "J1"}')
            if "/idmapping/status/" in url:
                return FakeResponse('{"jobStatus": "FINISHED"}')
            if "/idmapping/details/" in url:
                return FakeResponse(
                    '{"redirectURL": "https://rest.uniprot.org/'
                    'idmapping/uniprotkb/results/J1"}'
                )
            return FakeResponse(">sp|P1|X\nACDEF\n")

        monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
        text = sifts_mod.fetch_uniprot_mapping(["P1"])
        assert text.startswith(">sp|P1|X")
        result_url = fetched[-1]
        assert "/results/stream/" in result_url
        assert "size=" not in result_url


class TestCompareStandard:
    def test_missing_structure_is_skipped_not_fatal(self, compare_setup,
                                                    monkeypatch):
        """Structures are loaded tolerantly (raise_missing=False); a
        hit whose structure could not be fetched must be skipped by
        the distance computations instead of crashing the stage."""
        from evcouplings_tpu.compare import protocol as cp

        real_load = cp.load_structures

        def load_dropping_everything(pdb_ids, output_dir=None,
                                     raise_missing=True):
            # simulate every fetch failing (e.g. network error)
            return {}

        monkeypatch.setattr(
            cp, "load_structures", load_dropping_everything)
        prefix = str(
            compare_setup["tmp_path"] / "out_missing" / "cmp")
        outcfg = cp.run(
            protocol="standard",
            prefix=prefix,
            ec_file=compare_setup["ec_file"],
            min_sequence_distance=5,
            pdb_mmtf_dir=compare_setup["structure_dir"],
            atom_filter=None,
            compare_multimer=False,
            distance_cutoff=5,
            target_sequence_file=compare_setup["target_seq_file"],
            scale_sizes=True,
            pdb_ids=None, max_num_hits=25, max_num_structures=10,
            sifts_mapping_table=compare_setup["sifts_table"],
            sifts_sequence_db=None,
            by_alignment=False,
            pdb_alignment_method="jackhmmer",
            alignment_min_overlap=20,
            sequence_id="TESTPROT",
            sequence_file=None, region=None,
            use_bitscores=True,
            domain_threshold=0.5, sequence_threshold=0.5,
            plot_probability_cutoffs=[0.9],
            boundaries="union",
            plot_lowest_count=2, plot_highest_count=3,
            plot_increase=1,
            draw_secondary_structure=False,
        )
        # stage completes; distance maps exist but aggregate nothing
        assert "ec_compared_all_file" in outcfg

    def test_standard_protocol(self, compare_setup):
        prefix = str(compare_setup["tmp_path"] / "out" / "cmp")

        outcfg = compare_protocol.run(
            protocol="standard",
            prefix=prefix,
            ec_file=compare_setup["ec_file"],
            min_sequence_distance=5,
            pdb_mmtf_dir=compare_setup["structure_dir"],
            atom_filter=None,
            compare_multimer=False,
            distance_cutoff=5,
            target_sequence_file=compare_setup["target_seq_file"],
            scale_sizes=True,
            # structure identification
            pdb_ids=None,
            max_num_hits=25,
            max_num_structures=10,
            sifts_mapping_table=compare_setup["sifts_table"],
            sifts_sequence_db=None,
            by_alignment=False,
            pdb_alignment_method="jackhmmer",
            alignment_min_overlap=20,
            sequence_id="TESTPROT",
            sequence_file=None,
            region=None,
            use_bitscores=True,
            domain_threshold=0.5,
            sequence_threshold=0.5,
            # plotting
            plot_probability_cutoffs=[0.9],
            boundaries="union",
            plot_lowest_count=2,
            plot_highest_count=3,
            plot_increase=1,
            draw_secondary_structure=False,
        )

        # structure hits found and saved
        hits = pd.read_csv(outcfg["pdb_structure_hits_file"])
        assert len(hits) == 1

        # distance map files
        assert os.path.isfile(outcfg["distmap_monomer"] + ".csv")
        assert os.path.isfile(outcfg["distmap_monomer"] + ".npy")

        # contacts: only the planted pair (13, 20) is within 5 A
        contacts = pd.read_csv(outcfg["monomer_contacts_file"])
        pairs = set(zip(contacts.i, contacts.j))
        assert ("13", "20") in pairs or (13, 20) in pairs

        # compared EC table: top EC is TP, others FP
        cmp = pd.read_csv(outcfg["ec_compared_longrange_file"])
        top = cmp.iloc[0]
        assert top.i == 13 and top.j == 20
        assert top.dist == pytest.approx(3.8)
        assert top.precision == pytest.approx(1.0)
        assert cmp.precision.iloc[-1] == pytest.approx(1 / 3)

        # remapped structures + contact maps + pml exist
        assert len(outcfg["remapped_pdb_files"]) == 1
        remapped_file = next(iter(outcfg["remapped_pdb_files"]))
        assert os.path.isfile(remapped_file)
        # renumbered to uniprot numbering
        content = open(remapped_file).read()
        assert " 11 " in content or " 11" in content

        assert os.path.isfile(outcfg["ec_lines_compared_pml_file"])
        for f in outcfg["contact_map_files"]:
            assert os.path.isfile(f)

    def test_no_structures_found(self, compare_setup, tmp_path):
        """EC-only path when SIFTS has no hits for the target."""
        prefix = str(tmp_path / "out2" / "cmp")
        outcfg = compare_protocol.run(
            protocol="standard",
            prefix=prefix,
            ec_file=compare_setup["ec_file"],
            min_sequence_distance=5,
            pdb_mmtf_dir=compare_setup["structure_dir"],
            atom_filter=None,
            compare_multimer=False,
            distance_cutoff=5,
            target_sequence_file=compare_setup["target_seq_file"],
            scale_sizes=True,
            pdb_ids=None,
            max_num_hits=None,
            max_num_structures=None,
            sifts_mapping_table=compare_setup["sifts_table"],
            sifts_sequence_db=None,
            by_alignment=False,
            pdb_alignment_method="jackhmmer",
            alignment_min_overlap=20,
            sequence_id="UNKNOWN_PROTEIN",
            sequence_file=None,
            region=None,
            use_bitscores=True,
            domain_threshold=0.5,
            sequence_threshold=0.5,
            plot_probability_cutoffs=None,
            boundaries="union",
            plot_lowest_count=2,
            plot_highest_count=2,
            plot_increase=1,
            draw_secondary_structure=False,
        )
        assert outcfg["distmap_monomer"] is None
        assert outcfg["ec_compared_all_file"] is None
        # EC-only contact maps still created
        for f in outcfg["contact_map_files"]:
            assert os.path.isfile(f)


def write_complex_bcif(path, n_res=10, inter_contact=(4, 7)):
    """Two chains A and B; CA atoms on parallel lines 30 A apart,
    except B's inter_contact[1] placed 3.5 A from A's
    inter_contact[0] (a true inter-chain contact)."""
    n_total = 2 * n_res
    res_ids = np.concatenate([
        np.arange(1, n_res + 1), np.arange(1, n_res + 1)
    ])
    chains = ["A"] * n_res + ["B"] * n_res

    coords = np.zeros((n_total, 3))
    coords[:n_res, 0] = np.arange(n_res) * 6.0
    coords[n_res:, 0] = np.arange(n_res) * 6.0
    coords[n_res:, 1] = 30.0
    ai, bj = inter_contact
    coords[n_res + bj - 1] = coords[ai - 1] + np.array([0, 3.5, 0])

    bcif.write_bcif(path, {
        "_atom_site": {
            "pdbx_PDB_model_num": np.ones(n_total, dtype=int),
            "group_PDB": ["ATOM"] * n_total,
            "id": np.arange(1, n_total + 1),
            "type_symbol": ["C"] * n_total,
            "label_atom_id": ["CA"] * n_total,
            "auth_atom_id": ["CA"] * n_total,
            "label_alt_id": [""] * n_total,
            "label_comp_id": ["ALA"] * n_total,
            "auth_comp_id": ["ALA"] * n_total,
            "label_asym_id": chains,
            "auth_asym_id": chains,
            "label_entity_id": ["1"] * n_res + ["2"] * n_res,
            "label_seq_id": res_ids,
            "auth_seq_id": res_ids,
            "pdbx_PDB_ins_code": [""] * n_total,
            "Cartn_x": coords[:, 0],
            "Cartn_y": coords[:, 1],
            "Cartn_z": coords[:, 2],
            "occupancy": np.ones(n_total),
            "B_iso_or_equiv": np.full(n_total, 20.0),
            "pdbx_formal_charge": np.zeros(n_total, dtype=int),
        },
    })


class TestCompareComplex:
    def test_complex_protocol(self, tmp_path):
        n_res = 10
        structure_dir = tmp_path / "structures"
        structure_dir.mkdir()
        write_complex_bcif(str(structure_dir / "2xyz.bcif"),
                           n_res=n_res)

        # SIFTS table: chain A = PROT1, chain B = PROT2 (1:1 numbering)
        sifts_table = tmp_path / "sifts.csv"
        pd.DataFrame([
            {
                "pdb_id": "2xyz", "pdb_chain": "A",
                "uniprot_ac": "PROT1",
                "resseq_start": 1, "resseq_end": n_res,
                "coord_start": "1", "coord_end": str(n_res),
                "uniprot_start": 1, "uniprot_end": n_res,
            },
            {
                "pdb_id": "2xyz", "pdb_chain": "B",
                "uniprot_ac": "PROT2",
                "resseq_start": 1, "resseq_end": n_res,
                "coord_start": "1", "coord_end": str(n_res),
                "uniprot_start": 1, "uniprot_end": n_res,
            },
        ]).to_csv(sifts_table, index=False)

        # complex EC table: planted inter pair (A:4, B:7) is a true
        # contact; another inter pair is false
        ecs = pd.DataFrame({
            "i": [4, 2, 2],
            "A_i": ["A"] * 3,
            "segment_i": ["A_1", "A_1", "A_1"],
            "j": [7, 9, 5],
            "A_j": ["A"] * 3,
            "segment_j": ["B_1", "B_1", "A_1"],
            "fn": [1.5, 0.5, 0.8],
            "cn": [1.2, 0.4, 0.6],
            "probability": [0.99, 0.5, 0.8],
            "score": [1.2, 0.4, 0.6],
        })
        ec_file = tmp_path / "ECs.csv"
        ecs.to_csv(ec_file, index=False)

        seq1 = tmp_path / "p1.fa"
        seq1.write_text(">PROT1/1-{}\n{}\n".format(n_res, "A" * n_res))
        seq2 = tmp_path / "p2.fa"
        seq2.write_text(">PROT2/1-{}\n{}\n".format(n_res, "A" * n_res))

        # config list format: [segment_id, segment_type, sequence_id,
        # region_start, region_end, positions]
        seg1 = ["A_1", "aa", "PROT1", 1, n_res,
                list(range(1, n_res + 1))]
        seg2 = ["B_1", "aa", "PROT2", 1, n_res,
                list(range(1, n_res + 1))]

        common = dict(
            pdb_ids=None, max_num_hits=25, max_num_structures=10,
            sifts_mapping_table=str(sifts_table),
            sifts_sequence_db=None,
            by_alignment=False, pdb_alignment_method="jackhmmer",
            alignment_min_overlap=20,
            sequence_file=None, region=None, use_bitscores=True,
            domain_threshold=0.5, sequence_threshold=0.5,
        )

        outcfg = compare_protocol.run(
            protocol="complex",
            prefix=str(tmp_path / "out" / "cpx"),
            ec_file=str(ec_file),
            min_sequence_distance=2,
            pdb_mmtf_dir=str(structure_dir),
            atom_filter=None,
            first_compare_multimer=False,
            second_compare_multimer=False,
            distance_cutoff=5,
            segments=[seg1, seg2],
            first_sequence_id="PROT1",
            second_sequence_id="PROT2",
            first_sequence_file=None,
            second_sequence_file=None,
            first_target_sequence_file=str(seq1),
            second_target_sequence_file=str(seq2),
            first_alignment_file=None,
            second_alignment_file=None,
            raise_missing=False,
            first_raw_focus_alignment_file=None,
            second_raw_focus_alignment_file=None,
            scale_sizes=True,
            plot_probability_cutoffs=[0.9],
            boundaries="union",
            plot_lowest_count=2,
            plot_highest_count=3,
            plot_increase=1,
            draw_secondary_structure=False,
            **common,
        )

        # both chains found
        hits1 = pd.read_csv(outcfg["first_pdb_structure_hits_file"])
        hits2 = pd.read_csv(outcfg["second_pdb_structure_hits_file"])
        assert list(hits1.pdb_chain) == ["A"]
        assert list(hits2.pdb_chain) == ["B"]

        # inter-chain distance map exists
        assert os.path.isfile(outcfg["distmap_inter"] + ".csv")

        # inter EC comparison: planted pair is the 3.5 A contact
        inter = pd.read_csv(outcfg["ec_compared_inter_file"])
        top = inter.sort_values("cn", ascending=False).iloc[0]
        assert top.i == 4 and top.j == 7
        assert top.dist == pytest.approx(3.5)
