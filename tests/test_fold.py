"""
Fold-layer tests: restraint generation, secondary-structure clash
filters, dihedral ranking on an ideal helix, psipred parsing, and the
complex_dock protocol (no external binaries needed).
"""

import os

import numpy as np
import pandas as pd
import pytest

from evcouplings_tpu.fold.cns import (
    cns_dihedral_restraint,
    cns_dist_restraint,
    cns_seq_file,
)
from evcouplings_tpu.fold.filter import (
    detect_secstruct_clash,
    disulfide_clashes,
    secstruct_clashes,
)
from evcouplings_tpu.fold.haddock import haddock_dist_restraint
from evcouplings_tpu.fold.ranking import dihedral_ranking
from evcouplings_tpu.fold.restraints import (
    docking_restraints,
    ec_dist_restraints,
    secstruct_angle_restraints,
    secstruct_dist_restraints,
)
from evcouplings_tpu.fold.tools import (
    parse_maxcluster_clustering,
    parse_maxcluster_comparison,
    read_psipred_prediction,
)
from evcouplings_tpu.fold import protocol as fold_protocol


def residue_table(secstruct):
    return pd.DataFrame({
        "i": range(1, len(secstruct) + 1),
        "A_i": ["A"] * len(secstruct),
        "sec_struct_3state": list(secstruct),
    })


class TestRestraints:
    def test_cns_dist_restraint_format(self):
        r = cns_dist_restraint(
            5, "CA", 20, "CB", dist=4, lower=4, upper=3,
            weight=2.0, comment="ALA GLY",
        )
        assert r == (
            "assign (resid 5 and name CA) (resid 20 and name CB)  "
            "4 4 3 weight 2.0 ! ALA GLY"
        )

    def test_cns_dihedral_restraint_format(self):
        r = cns_dihedral_restraint(
            1, "C", 2, "N", 2, "CA", 2, "C",
            energy_constant=0.5, degrees=-57.0, range=7.0, exponent=2,
        )
        assert "assign (resid 1 and name C)" in r
        assert r.endswith("0.5 -57.0 7.0 2")

    def test_ec_dist_restraints(self, tmp_path):
        ecs = pd.DataFrame({
            "i": [3, 5],
            "j": [20, 30],
            "A_i": ["A", "G"],
            "A_j": ["W", "C"],
        })
        out = str(tmp_path / "ec.tbl")
        ec_dist_restraints(ecs, out, cns_dist_restraint)
        lines = open(out).read().strip().split("\n")
        # pair 1: CA + CB; pair 2: CA only (G has no CB)
        assert len(lines) == 3
        assert "(resid 3 and name CA)" in lines[0]
        assert "(resid 3 and name CB)" in lines[1]
        assert "(resid 5 and name CA)" in lines[2]

    def test_secstruct_dist_restraints(self, tmp_path):
        residues = residue_table("HHHHHCCC")
        out = str(tmp_path / "ss.tbl")
        secstruct_dist_restraints(residues, out, cns_dist_restraint)
        lines = open(out).read().strip().split("\n")
        assert len(lines) > 0
        # all restraints within the helix residues 1-5
        for line in lines:
            assert "assign (resid" in line
            assert "weight 5" in line

    def test_secstruct_angle_restraints(self, tmp_path):
        residues = residue_table("HHHEEECC")
        out = str(tmp_path / "angle.tbl")
        secstruct_angle_restraints(
            residues, out, cns_dihedral_restraint
        )
        lines = open(out).read().strip().split("\n")
        # 2 consecutive-H pairs + 2 consecutive-E pairs, phi + psi each
        assert len(lines) == 8
        assert any("-57.0" in line for line in lines)    # helix phi
        assert any("-127.0" in line for line in lines)   # strand phi

    def test_docking_restraints(self, tmp_path):
        ecs = pd.DataFrame({
            "i": [10], "j": [200],
            "A_i": ["A"], "A_j": ["W"],
            "segment_i": ["A_1"], "segment_j": ["B_1"],
        })
        out = str(tmp_path / "dock.tbl")
        docking_restraints(ecs, out, haddock_dist_restraint)
        content = open(out).read()
        assert "resid 10 and segid A" in content
        assert "resid 200 and segid B" in content

    def test_cns_seq_file(self, tmp_path):
        out = str(tmp_path / "test.seq")
        cns_seq_file("ACDG", out)
        assert open(out).read().strip() == "ALA CYS ASP GLY"


class TestFilters:
    def test_helix_clash(self):
        # fully helical span between close pair -> impossible
        ss = dict(enumerate("CHHHHHC"))
        assert detect_secstruct_clash(1, 5, ss) is True
        # distant pairs never clash
        ss_long = {i: "H" for i in range(0, 40)}
        assert detect_secstruct_clash(0, 39, ss_long) is False

    def test_no_clash_coil(self):
        ss = dict(enumerate("CCCCCCCC"))
        assert detect_secstruct_clash(1, 6, ss) is False

    def test_secstruct_clashes_table(self):
        residues = residue_table("CHHHHHCCCC")
        ecs = pd.DataFrame({"i": [2, 1], "j": [6, 9]})
        out = secstruct_clashes(ecs, residues)
        assert list(out.ss_clash) == [True, False]

    def test_disulfide_clashes(self):
        ecs = pd.DataFrame({
            "i": [1, 1, 10],
            "j": [5, 8, 20],
            "A_i": ["C", "C", "C"],
            "A_j": ["C", "C", "C"],
        })
        out = disulfide_clashes(ecs)
        # second pair reuses residue 1 -> clash; third is independent
        assert list(out.cys_clash) == [False, True, False]


def write_helix_pdb(path, n=12, rise=1.5, radius=2.3, turn=100.0):
    """Ideal alpha-helix CA trace as a PDB file."""
    with open(path, "w") as f:
        for k in range(n):
            angle = np.deg2rad(turn * k)
            x = radius * np.cos(angle)
            y = radius * np.sin(angle)
            z = rise * k
            f.write(
                "ATOM  {:>5}  CA  ALA A{:>4}    "
                "{:>8.3f}{:>8.3f}{:>8.3f}{:>6.2f}{:>6.2f}"
                "           C\n".format(k + 1, k + 1, x, y, z, 1.0, 20.0)
            )
        f.write("END\n")


class TestRanking:
    def test_ideal_helix_scores_high(self, tmp_path):
        helix_pdb = str(tmp_path / "helix.pdb")
        write_helix_pdb(helix_pdb)

        residues = residue_table("H" * 12)
        ranking = dihedral_ranking([helix_pdb], residues)

        assert len(ranking) == 1
        row = ranking.iloc[0]
        assert row.num_alpha_dihedrals > 0
        # ideal helix dihedrals fall in the highest-weight window
        assert row.ranking_score > 0.8

    def test_coil_scores_zero_alpha(self, tmp_path):
        helix_pdb = str(tmp_path / "helix2.pdb")
        write_helix_pdb(helix_pdb)
        residues = residue_table("C" * 12)
        ranking = dihedral_ranking([helix_pdb], residues)
        assert ranking.iloc[0].num_alpha_dihedrals == 0


class TestPsipred:
    def test_vformat(self, tmp_path):
        f = tmp_path / "pred.ss2"
        f.write_text(
            "# PSIPRED VFORMAT (PSIPRED V4.0)\n\n"
            "   1 M C   0.999  0.000  0.001\n"
            "   2 K H   0.100  0.899  0.001\n"
            "   3 V E   0.100  0.001  0.899\n"
        )
        pred = read_psipred_prediction(str(f), first_index=5)
        assert list(pred.i) == [5, 6, 7]
        assert list(pred.sec_struct_3state) == ["C", "H", "E"]
        assert pred.score_helix.iloc[1] == pytest.approx(0.899)

    def test_hformat(self, tmp_path):
        f = tmp_path / "pred.horiz"
        f.write_text(
            "# PSIPRED HFORMAT (PSIPRED V4.0)\n\n"
            "Conf: 988\n"
            "Pred: CHE\n"
            "  AA: MKV\n"
        )
        pred = read_psipred_prediction(str(f))
        assert list(pred.A_i) == ["M", "K", "V"]
        assert list(pred.sec_struct_3state) == ["C", "H", "E"]
        assert list(pred.sec_struct_conf) == [9, 8, 8]


class TestMaxclusterParsing:
    def test_comparison_parse(self):
        output = (
            "INFO  : 1. vs. /tmp/model_1.pdb  Pairs= 120, RMSD= 3.123, "
            "MaxSub=0.456, TM=0.567, MSI=0.345\n"
            "junk line\n"
            "INFO  : 2. vs. /tmp/model_2.pdb  Pairs=  90, RMSD= 5.000, "
            "MaxSub=0.300, TM=0.400, MSI=0.200\n"
        )
        df = parse_maxcluster_comparison(output)
        assert len(df) == 2
        assert df.tm.iloc[0] == pytest.approx(0.567)
        assert df.num_pairs.iloc[1] == 90

    def test_clustering_parse_real_layout(self):
        """Assignment lines are 'INFO : <item> : <cluster>  <file>';
        the cluster id is the SECOND number, and the Centroids
        section must not be ingested."""
        output = (
            "INFO  : Reading PDB list file\n"
            "INFO  : Clusters @ Threshold  5.000 (size)\n"
            "INFO  :   1 : 2  /tmp/model_1.pdb\n"
            "INFO  :   2 : 1  /tmp/model_2.pdb\n"
            "INFO  :   3 : 2  /tmp/model_3.pdb\n"
            "INFO  :   4 : 2  /tmp/model_4.pdb\n"
            "INFO  : Centroids\n"
            "INFO  :   1 : 7  /tmp/should_be_ignored.pdb\n"
        )
        df = parse_maxcluster_clustering(output)
        assert len(df) == 4
        assert list(df.columns) == [
            "filename", "cluster", "cluster_size"
        ]
        by_file = df.set_index("filename")
        assert by_file.loc["/tmp/model_1.pdb", "cluster"] == 2
        assert by_file.loc["/tmp/model_2.pdb", "cluster"] == 1
        assert by_file.loc["/tmp/model_1.pdb", "cluster_size"] == 3
        assert by_file.loc["/tmp/model_2.pdb", "cluster_size"] == 1
        assert "/tmp/should_be_ignored.pdb" not in set(df.filename)


class TestComplexDockProtocol:
    def test_restraint_files(self, tmp_path):
        ecs = pd.DataFrame({
            "i": [1, 2, 3, 4],
            "j": [100, 101, 5, 102],
            "A_i": ["A", "C", "D", "E"],
            "A_j": ["F", "G", "H", "I"],
            "segment_i": ["A_1", "A_1", "A_1", "A_1"],
            "segment_j": ["B_1", "B_1", "A_1", "B_1"],
            "probability": [0.99, 0.95, 0.8, 0.5],
        })
        ec_file = str(tmp_path / "ecs.csv")
        ecs.to_csv(ec_file, index=False)

        outcfg = fold_protocol.run(
            protocol="complex_dock",
            prefix=str(tmp_path / "dock" / "job"),
            ec_file=ec_file,
            segments=None,
            dock_probability_cutoffs=[0.9],
            dock_lowest_count=2,
            dock_highest_count=3,
            dock_increase=1,
        )

        files = outcfg["docking_restraint_files"]
        # one probability-cutoff file + two count files
        assert len(files) == 3
        for f in files:
            assert os.path.isfile(f)
        content = open(files[0]).read()
        assert "segid A" in content and "segid B" in content


class TestFilterReferenceParity:
    def test_secstruct_clash_matches_reference(self):
        """Run-length formulation must agree with the reference's
        substring-probe port of choose_CNS_constraint_set.m on every
        pair of every random secondary structure."""
        from reference_shim import load_reference

        ref_pkg = load_reference()
        if ref_pkg is None:
            pytest.skip("reference package not loadable")
        import evcouplings.fold.filter as ref_filter

        rng = np.random.default_rng(17)
        for trial in range(20):
            L = 30
            states = rng.choice(
                list("HEC"), size=L,
                p=(0.35, 0.25, 0.40),
            )
            secstruct = {pos: s for pos, s in enumerate(states)}
            for i in range(L):
                for j in range(i + 1, L):
                    ours = detect_secstruct_clash(i, j, secstruct)
                    theirs = ref_filter.detect_secstruct_clash(
                        i, j, secstruct
                    )
                    assert ours == theirs, (trial, i, j,
                                            "".join(states))

    def test_disulfide_clash_matches_reference(self):
        from reference_shim import load_reference

        ref_pkg = load_reference()
        if ref_pkg is None:
            pytest.skip("reference package not loadable")
        import evcouplings.fold.filter as ref_filter

        rng = np.random.default_rng(3)
        n = 40
        table = pd.DataFrame({
            "i": rng.integers(1, 15, size=n),
            "j": rng.integers(1, 15, size=n),
            "A_i": rng.choice(["C", "A"], size=n, p=(0.6, 0.4)),
            "A_j": rng.choice(["C", "A"], size=n, p=(0.6, 0.4)),
        })
        ours = disulfide_clashes(table)
        theirs = ref_filter.disulfide_clashes(table.copy())
        pd.testing.assert_series_equal(
            ours["cys_clash"], theirs["cys_clash"]
        )


@pytest.fixture
def df_append_shim(monkeypatch):
    """The reference's ranking code uses DataFrame.append, which
    pandas >= 2 removed; reinstate it as a concat wrapper so the live
    reference implementation can run for the differential tests."""
    def append(self, other, ignore_index=False):
        return pd.concat([self, other], ignore_index=ignore_index)

    monkeypatch.setattr(pd.DataFrame, "append", append, raising=False)


class TestDihedralReferenceParity:
    """The strand-pairing dihedral search (nearest-partner span,
    orientation vote, tie handling, 2011-protocol residue guards) must
    match the live reference implementation value-for-value."""

    @staticmethod
    def _random_trace(seed, drop_rate=0.0):
        rng = np.random.default_rng(seed)
        n = 36
        pos = np.arange(1, n + 1)
        keep = rng.random(n) >= drop_rate
        xyz = rng.normal(scale=4.0, size=(n, 3)).cumsum(axis=0) * 0.6
        return pd.DataFrame({
            "i": pos[keep], "x": xyz[keep, 0],
            "y": xyz[keep, 1], "z": xyz[keep, 2],
        })

    @pytest.mark.parametrize("seed", [5, 7, 13, 21, 34])
    @pytest.mark.parametrize("original", [True, False])
    def test_beta_dihedrals_match_reference(self, seed, original, df_append_shim):
        from reference_shim import load_reference

        if load_reference() is None:
            pytest.skip("reference package not loadable")
        import evcouplings.fold.ranking as ref_ranking

        from evcouplings_tpu.fold.ranking import _beta_dihedrals

        coords = self._random_trace(seed, drop_rate=0.06 * (seed % 3))
        segments = [(3, 9), (12, 18), (22, 29)]

        try:
            theirs = ref_ranking._beta_dihedrals(
                coords, segments, original=original
            )
            their_error = None
        except KeyError:
            theirs, their_error = None, KeyError

        try:
            ours = _beta_dihedrals(coords, segments, original=original)
            our_error = None
        except KeyError:
            ours, our_error = None, KeyError

        # crash parity: the 2011 protocol's unguarded j-2 lookup must
        # fail in exactly the same configurations
        assert our_error is their_error
        if their_error is not None:
            return

        assert len(ours) == len(theirs)
        if len(ours):
            for column in ("i", "j", "strand_i", "strand_j"):
                assert ours[column].astype(int).tolist() == \
                    theirs[column].astype(int).tolist(), column
            np.testing.assert_allclose(
                ours.dihedral.astype(float).values,
                theirs.dihedral.astype(float).values,
                rtol=0, atol=0,
            )

    @pytest.mark.parametrize("seed", [2, 9])
    def test_alpha_dihedrals_match_reference(self, seed, df_append_shim):
        from reference_shim import load_reference

        if load_reference() is None:
            pytest.skip("reference package not loadable")
        import evcouplings.fold.ranking as ref_ranking

        from evcouplings_tpu.fold.ranking import _alpha_dihedrals

        coords = self._random_trace(seed, drop_rate=0.1)
        segments = [(4, 12), (20, 30)]

        theirs = ref_ranking._alpha_dihedrals(coords, segments)
        ours = _alpha_dihedrals(coords, segments)
        pd.testing.assert_frame_equal(
            ours, theirs, check_dtype=False
        )
