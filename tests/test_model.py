"""
CouplingsModel tests: plmc_v2/v1 codec roundtrips, scoring, mutation
deltas, index remapping, and segment mapping.
"""

import numpy as np
import pandas as pd
import pytest

from oracles import random_symmetric_J, o_single_mutant_hamiltonians

from evcouplings_tpu.align import ALPHABET_PROTEIN
from evcouplings_tpu.couplings import (
    CouplingsModel, Segment, SegmentIndexMapper, segment_map_ecs,
)

RNG = np.random.default_rng(11)   # rebound per test below

@pytest.fixture(autouse=True)
def _per_test_rng(request):
    """Rebind the module RNG to a fresh, per-test deterministic stream
    (seeded from the test id) so a test's input data never depends on
    which tests ran before it — `-k` selection, reordering, or adding
    a test above no longer changes anyone's draws."""
    import zlib

    global RNG
    RNG = np.random.default_rng(zlib.crc32(request.node.nodeid.encode()))



def make_model(L=8, q=21, alphabet=ALPHABET_PROTEIN, first_index=5):
    J = random_symmetric_J(L, q, RNG, scale=0.2)
    h = RNG.normal(size=(L, q)) * 0.5
    f_i = RNG.dirichlet(np.ones(q), size=L)
    # symmetric pair frequencies with single-site diagonal
    f_ij = np.zeros((L, L, q, q))
    for i in range(L - 1):
        for j in range(i + 1, L):
            block = RNG.dirichlet(np.ones(q * q)).reshape(q, q)
            f_ij[i, j] = block
            f_ij[j, i] = block.T
    for i in range(L):
        f_ij[i, i, np.arange(q), np.arange(q)] = f_i[i]

    target_codes = RNG.integers(1, q, size=L)
    target_seq = [alphabet[c] for c in target_codes]
    index_list = np.arange(first_index, first_index + L)
    # plmc_v2 stores one weight per sequence incl. invalid ones
    weights = RNG.uniform(0.2, 1.0, size=32)

    return CouplingsModel.from_params(
        J_ij=J, h_i=h, f_i=f_i, f_ij=f_ij, alphabet=alphabet,
        target_seq=target_seq, index_list=index_list, weights=weights,
        theta=0.8, lambda_h=0.01, lambda_J=16.0, lambda_group=0.0,
        N_valid=30, N_invalid=2, num_iter=100,
    )


class TestCodec:
    def test_v2_roundtrip(self, tmp_path):
        m = make_model()
        path = str(tmp_path / "test.model")
        m.to_file(path, precision="float32", file_format="plmc_v2")
        m2 = CouplingsModel(path)

        assert m2.L == m.L and m2.num_symbols == m.num_symbols
        assert m2.N_valid == 30 and m2.N_invalid == 2 and m2.num_iter == 100
        np.testing.assert_allclose(m2.theta, 0.8, rtol=1e-6)
        np.testing.assert_allclose(m2.lambda_J, 16.0, rtol=1e-6)
        assert "".join(m2.alphabet) == ALPHabet_str(m)
        np.testing.assert_allclose(m2.weights, m.weights, rtol=1e-6)
        assert "".join(m2.target_seq) == "".join(m.target_seq)
        np.testing.assert_array_equal(m2.index_list, m.index_list)
        np.testing.assert_allclose(m2.f_i, m.f_i, rtol=1e-6)
        np.testing.assert_allclose(m2.h_i, m.h_i, rtol=1e-6, atol=1e-7)
        # the file format only stores the i<j triangle; diagonal f_ij
        # blocks are dropped on roundtrip (reference behavior)
        off = ~np.eye(m.L, dtype=bool)
        np.testing.assert_allclose(
            m2.f_ij[off], m.f_ij[off], rtol=1e-6, atol=1e-9
        )
        np.testing.assert_allclose(m2.J_ij, m.J_ij, rtol=1e-6, atol=1e-7)

    def test_v2_write_is_deterministic(self, tmp_path):
        m = make_model()
        p1, p2 = str(tmp_path / "a.model"), str(tmp_path / "b.model")
        m.to_file(p1)
        m.to_file(p2)
        assert open(p1, "rb").read() == open(p2, "rb").read()

    def test_v2_reload_exact_bytes(self, tmp_path):
        # read f32 file -> write f32 file must be byte-identical
        m = make_model()
        p1 = str(tmp_path / "a.model")
        m.to_file(p1)
        m2 = CouplingsModel(p1)
        p2 = str(tmp_path / "b.model")
        m2.to_file(p2)
        assert open(p1, "rb").read() == open(p2, "rb").read()

    def test_v1_roundtrip(self, tmp_path):
        m = make_model()
        path = str(tmp_path / "test.Jij")
        m.to_file(path, precision="float32", file_format="plmc_v1")
        m2 = CouplingsModel(path, file_format="plmc_v1")
        assert m2.L == m.L
        assert m2.theta is None and m2.weights is None
        np.testing.assert_allclose(m2.J_ij, m.J_ij, rtol=1e-6, atol=1e-7)
        off = ~np.eye(m.L, dtype=bool)
        np.testing.assert_allclose(
            m2.f_ij[off], m.f_ij[off], rtol=1e-6, atol=1e-9
        )

    def test_truncated_file_raises(self, tmp_path):
        m = make_model()
        path = str(tmp_path / "test.model")
        m.to_file(path)
        data = open(path, "rb").read()
        with open(path, "wb") as f:
            f.write(data[: len(data) // 2])
        with pytest.raises(ValueError):
            CouplingsModel(path)


def ALPHabet_str(m):
    return "".join(m.alphabet)


class TestScores:
    def test_ecs_table(self):
        m = make_model()
        ecs = m.ecs
        assert list(ecs.columns) == [
            "i", "A_i", "j", "A_j", "seqdist", "mi_raw", "mi_apc", "fn", "cn"
        ]
        assert len(ecs) == m.L * (m.L - 1) // 2
        # sorted by cn descending
        assert (ecs.cn.values[:-1] >= ecs.cn.values[1:]).all()

    def test_cn_is_apc_of_fn(self):
        m = make_model()
        np.testing.assert_allclose(
            m.cn_scores, CouplingsModel.apc(m.fn_scores), rtol=1e-12
        )

    def test_index_remap_recomputes_ecs(self):
        m = make_model(first_index=1)
        _ = m.ecs
        m.index_list = np.arange(100, 100 + m.L)
        assert m.ecs.i.min() >= 100


class TestMutations:
    def test_single_mut_mat_against_oracle(self):
        m = make_model()
        want = o_single_mutant_hamiltonians(
            m.target_seq_mapped, m.J_ij, m.h_i
        )
        np.testing.assert_allclose(
            m.single_mut_mat_full, want, rtol=1e-10, atol=1e-12
        )

    def test_delta_hamiltonian_api(self):
        m = make_model(first_index=5)
        pos = 7  # target numbering
        idx = m.index_map[pos]
        wt = m.target_seq[idx]
        sub = "A" if wt != "A" else "C"
        delta = m.delta_hamiltonian([(pos, wt, sub)])
        np.testing.assert_allclose(
            delta[0], m.smm(pos, sub), rtol=1e-10
        )

    def test_delta_hamiltonian_verify(self):
        m = make_model(first_index=5)
        idx = m.index_map[7]
        wrong_wt = "W" if m.target_seq[idx] != "W" else "Y"
        with pytest.raises(ValueError):
            m.delta_hamiltonian([(7, wrong_wt, "A")])

    def test_double_mut_mat_symmetry(self):
        m = make_model()
        dmm = m.double_mut_mat
        np.testing.assert_allclose(
            dmm[2, 5], dmm[5, 2].T, rtol=1e-10
        )

    def test_to_independent_model(self):
        m = make_model()
        c0 = m.to_independent_model()
        assert np.all(c0.J_ij == 0)
        # fitted fields should reproduce frequencies approximately through
        # softmax (up to regularization pull toward zero)
        p = np.exp(c0.h_i[0]) / np.exp(c0.h_i[0]).sum()
        assert np.abs(p - m.f_i[0]).max() < 0.05


class TestHamiltonians:
    def test_target_seq_energy_consistency(self):
        m = make_model()
        seqs = np.stack([m.target_seq_mapped, m.target_seq_mapped])
        H = m.hamiltonians(seqs)
        assert H.shape == (2, 3)
        np.testing.assert_allclose(H[0], H[1])
        np.testing.assert_allclose(H[0, 0], H[0, 1] + H[0, 2], rtol=1e-10)

    def test_mutant_energy_matches_delta(self):
        m = make_model()
        seq = m.target_seq_mapped.copy()
        H_wt = m.hamiltonians(seq[None, :])[0, 0]
        mut = seq.copy()
        mut[3] = (mut[3] + 1) % m.num_symbols
        H_mut = m.hamiltonians(mut[None, :])[0, 0]
        np.testing.assert_allclose(
            H_mut - H_wt, m.single_mut_mat[3, mut[3]], rtol=1e-9
        )


class TestSegments:
    def test_segment_roundtrip(self):
        s = Segment("aa", "SEQ1", 10, 20, segment_id="B_1")
        assert Segment.from_list(s.to_list()).sequence_id == "SEQ1"
        assert s.default_chain_name() == "B"

    def test_from_list_rejects_malformed(self):
        # wrong-arity config lists must fail loudly (reference
        # couplings/mapping.py:78 unpacks exactly six elements)
        with pytest.raises(ValueError, match="Invalid segment list"):
            Segment.from_list(["A_1", "aa", "SEQ1", 10, 20])
        with pytest.raises(ValueError, match="Invalid segment list"):
            Segment.from_list(
                ["A_1", "aa", "SEQ1", 10, 20, None, "extra"]
            )

    def test_mapper_focus_mode(self):
        s1 = Segment("aa", "X", 1, 3, segment_id="A_1")
        s2 = Segment("aa", "Y", 10, 12, segment_id="B_1")
        mapper = SegmentIndexMapper(True, 1, s1, s2)
        assert mapper.to_model(("A_1", 1)) == 1
        assert mapper.to_model(("B_1", 10)) == 4
        assert mapper.to_target(4) == ("B_1", 10)
        assert mapper("B_1", 12) == 6

    def test_patch_model_tuple_indices_keep_ecs_working(self):
        """patch_model renumbers index_list to (segment, pos) tuples;
        the EC table and the index-based sugar must keep working (the
        tuples must not be spread into a 2D index array)."""
        m = make_model(L=6, first_index=1)
        s1 = Segment("aa", "X", 1, 3, segment_id="A_1")
        s2 = Segment("aa", "Y", 1, 3, segment_id="B_1")
        mapper = SegmentIndexMapper(True, 1, s1, s2)

        patched = mapper.patch_model(m, inplace=False)
        ecs = patched.ecs
        assert len(ecs) == 6 * 5 // 2
        assert ("A_1", 1) in set(ecs.i) | set(ecs.j)
        # seqdist is undefined across segments -> NaN, not a crash
        assert ecs.seqdist.isna().all()
        # tuple-index sugar
        assert patched.seq(("B_1", 2)) == m.seq(5)
        np.testing.assert_allclose(
            patched.smm(("B_1", 2)), m.smm(5)
        )
        # the original model is untouched (inplace=False)
        assert int(m.index_list[0]) == 1

    def test_segment_map_ecs(self):
        s1 = Segment("aa", "X", 1, 3, segment_id="A_1")
        s2 = Segment("aa", "Y", 10, 12, segment_id="B_1")
        mapper = SegmentIndexMapper(True, 1, s1, s2)
        ecs = pd.DataFrame({"i": [1, 2], "j": [4, 6], "cn": [1.0, 0.5]})
        mapped = segment_map_ecs(ecs, mapper)
        assert list(mapped.segment_i) == ["A_1", "A_1"]
        assert list(mapped.segment_j) == ["B_1", "B_1"]
        assert list(mapped.j) == [10, 12]
