"""
Differential gates for the round-4 de-derivative rewrites: every
restructured parser/selector must agree value-for-value with the LIVE
reference implementation on randomized inputs.

These complement tests/test_reference_parity.py (numerics) — here the
targets are the orchestration-shell functions whose prose was
rewritten away from the reference while keeping its behavior:
maxcluster/psipred parsing, Pfam clan-overlap resolution, and the
species-similarity selectors.
"""

import numpy as np
import pandas as pd
import pytest

from reference_shim import load_reference


def _need_reference():
    if load_reference() is None:
        pytest.skip("reference package not loadable")


class TestMaxclusterParsers:
    COMPARISON = "\n".join([
        "INFO  : Reading PDB list file",
        "INFO  : 0001. exp.pdb vs. model_1.pdb  Pairs= 120, "
        "RMSD= 3.250, MaxSub=0.571, TM=0.641, MSI=0.512",
        "INFO  : 0002. exp.pdb vs. model_2.pdb  Pairs=  98, "
        "RMSD=12.750, MaxSub=0.221, TM=0.310, MSI=0.190",
        "garbage line",
    ])

    CLUSTERING = "\n".join([
        "INFO  : Clusters @ Threshold  5.000 (0.items)",
        "INFO  : Item     Cluster",
        "INFO  :     1 :        1  model_1.pdb",
        "INFO  :     2 :        1  model_2.pdb",
        "INFO  :     3 :        2  model_3.pdb",
        "INFO  : Centroids",
        "INFO  :     9 :        7  should_not_be_read.pdb",
    ])

    # the reference's own parsers cannot run under pandas >= 2
    # (loc-based int coercion / delim_whitespace), so these assert the
    # format contract explicitly instead of differentially

    def test_comparison_contract(self):
        from evcouplings_tpu.fold.tools import parse_maxcluster_comparison

        table = parse_maxcluster_comparison(self.COMPARISON)
        expected = pd.DataFrame({
            "filename": ["model_1.pdb", "model_2.pdb"],
            "num_pairs": [120, 98],
            "rmsd": [3.25, 12.75],
            "maxsub": [0.571, 0.221],
            "tm": [0.641, 0.310],
            "msi": [0.512, 0.190],
        })
        pd.testing.assert_frame_equal(table, expected,
                                      check_dtype=False)

    def test_clustering_contract(self):
        from evcouplings_tpu.fold.tools import parse_maxcluster_clustering

        table = parse_maxcluster_clustering(self.CLUSTERING)
        expected = pd.DataFrame({
            "filename": ["model_1.pdb", "model_2.pdb", "model_3.pdb"],
            "cluster": [1, 1, 2],
            "cluster_size": [2, 2, 1],
        })
        # the Centroids section's INFO lines must NOT be ingested
        pd.testing.assert_frame_equal(table, expected,
                                      check_dtype=False)


class TestPsipredParser:
    VFORMAT = (
        "# PSIPRED VFORMAT (PSIPRED V4.0)\n"
        "\n"
        "   1 M C   0.997  0.002  0.002\n"
        "   2 K H   0.100  0.850  0.050\n"
        "   3 V E   0.050  0.050  0.900\n"
    )
    HFORMAT = (
        "# PSIPRED HFORMAT (PSIPRED V4.0)\n"
        "\n"
        "Conf: 987\n"
        "Pred: CHE\n"
        "  AA: MKV\n"
        "\n"
        "Conf: 55\n"
        "Pred: HH\n"
        "  AA: LI\n"
    )

    @pytest.mark.parametrize("first_index", [1, 10])
    def test_vformat_contract(self, tmp_path, first_index):
        # the reference's vformat path uses delim_whitespace, removed
        # in pandas >= 2, so the contract is asserted explicitly
        from evcouplings_tpu.fold.tools import read_psipred_prediction

        target = tmp_path / "pred.ss2"
        target.write_text(self.VFORMAT)
        table = read_psipred_prediction(str(target), first_index)
        assert table.i.tolist() == [
            first_index, first_index + 1, first_index + 2
        ]
        assert table.A_i.tolist() == ["M", "K", "V"]
        assert table.sec_struct_3state.tolist() == ["C", "H", "E"]
        assert table.score_helix.tolist() == [0.002, 0.850, 0.050]

    @pytest.mark.parametrize("first_index", [1, 7])
    def test_hformat_matches_reference(self, tmp_path, first_index):
        _need_reference()
        import evcouplings.fold.tools as ref_tools

        from evcouplings_tpu.fold.tools import read_psipred_prediction

        target = tmp_path / "pred.horiz"
        target.write_text(self.HFORMAT)
        ours = read_psipred_prediction(str(target), first_index)
        theirs = ref_tools.read_psipred_prediction(
            str(target), first_index
        )
        pd.testing.assert_frame_equal(
            ours, theirs, check_dtype=False, check_like=True
        )


class TestClanOverlapResolution:
    @pytest.mark.parametrize("seed", [1, 4, 8])
    def test_matches_reference(self, seed):
        _need_reference()
        import evcouplings.align.pfam as ref_pfam

        from evcouplings_tpu.align.pfam import remove_clan_overlaps

        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, 20))
        start = rng.integers(1, 70, size=n)
        hits = pd.DataFrame({
            "query_name": rng.choice(["q1", "q2"], size=n),
            "clan_id": rng.choice(["CL001", "CL002"], size=n),
            "ali_from": start,
            "ali_to": start + rng.integers(4, 35, size=n),
            # a small score alphabet forces ties, stressing the
            # smaller-label-survives rule
            "domain_score": rng.choice([10.0, 20.0, 20.0, 30.0],
                                       size=n),
        }, index=rng.permutation(n))

        ours = remove_clan_overlaps(hits)
        theirs = ref_pfam.remove_clan_overlaps(hits)
        pd.testing.assert_frame_equal(ours, theirs)


class TestSimilaritySelectors:
    @staticmethod
    def _tables(seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(8, 25))
        ids = ["SEQ{}_X/1-100".format(k) for k in range(n)]
        annotations = pd.DataFrame({
            "id": ids,
            "name": ["protein {}".format(k) for k in range(n)],
            "species": rng.choice(
                ["E. coli", "B. subtilis", "H. sapiens", None], size=n
            ),
        })
        similarities = pd.DataFrame({
            "id": ids,
            "identity_to_query": rng.choice(
                np.round(np.linspace(0.1, 0.9, 5), 3), size=n
            ),
        })
        return annotations, similarities

    @pytest.mark.parametrize("seed", [2, 6])
    def test_most_similar_by_organism(self, seed):
        _need_reference()
        import evcouplings.complex.similarity as ref_similarity

        from evcouplings_tpu.complex.similarity import (
            most_similar_by_organism,
        )

        annotations, similarities = self._tables(seed)
        ours = most_similar_by_organism(similarities, annotations)
        theirs = ref_similarity.most_similar_by_organism(
            similarities, annotations
        )
        pd.testing.assert_frame_equal(
            ours, theirs, check_dtype=False, check_like=True
        )

    @pytest.mark.parametrize("seed", [3, 12])
    def test_find_paralogs(self, seed):
        _need_reference()
        import evcouplings.complex.similarity as ref_similarity

        from evcouplings_tpu.complex.similarity import find_paralogs

        annotations, similarities = self._tables(seed)
        target = "SEQ0_X/1-100"
        ours = find_paralogs(target, annotations, similarities, 0.7)
        theirs = ref_similarity.find_paralogs(
            target, annotations, similarities, 0.7
        )
        pd.testing.assert_frame_equal(
            ours, theirs, check_dtype=False, check_like=True
        )
