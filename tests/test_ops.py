"""
Kernel unit tests: vectorized TPU kernels vs literal numpy oracles.
"""

import numpy as np
import pytest

from oracles import (
    o_frequencies, o_pair_frequencies, o_identities_to_seq,
    o_num_cluster_members, o_hamiltonians, o_single_mutant_hamiltonians,
    o_delta_hamiltonian, o_zero_sum_gauge, random_symmetric_J,
)

from evcouplings_tpu.ops.weights import (
    num_cluster_members, identities_to_seq, _identity_count_threshold,
)
from evcouplings_tpu.ops.frequencies import frequencies, pair_frequencies
from evcouplings_tpu.ops.hamiltonian import (
    hamiltonians, single_mutant_hamiltonians, delta_hamiltonian,
    double_mutant_matrix, hamiltonians_device,
)
from evcouplings_tpu.ops.gauge import zero_sum_gauge
from evcouplings_tpu.ops.scores import apc, fn_scores, mi_scores


RNG = np.random.default_rng(7)   # rebound per test below

@pytest.fixture(autouse=True)
def _per_test_rng(request):
    """Rebind the module RNG to a fresh, per-test deterministic stream
    (seeded from the test id) so a test's input data never depends on
    which tests ran before it — `-k` selection, reordering, or adding
    a test above no longer changes anyone's draws."""
    import zlib

    global RNG
    RNG = np.random.default_rng(zlib.crc32(request.node.nodeid.encode()))



def random_msa(n=40, L=13, q=5):
    return RNG.integers(0, q, size=(n, L)).astype(np.int64)


class TestWeights:
    def test_identity_count_threshold(self):
        # k/L >= theta iff k >= thr
        for L in (10, 13, 100, 157):
            for theta in (0.8, 0.5, 0.31, 1.0, 0.999):
                thr = _identity_count_threshold(L, theta)
                for k in range(0, L + 1):
                    assert (k / L >= theta) == (k >= thr), (L, theta, k)

    @pytest.mark.parametrize("theta", [0.3, 0.5, 0.8])
    def test_num_cluster_members(self, theta):
        m = random_msa(n=37, L=11, q=4)  # low q => many neighbors
        got = num_cluster_members(m, theta)
        want = o_num_cluster_members(m, theta)
        np.testing.assert_array_equal(got, want)

    def test_identities_to_seq(self):
        m = random_msa(n=25, L=14, q=6)
        seq = random_msa(n=1, L=14, q=6)[0]
        got = identities_to_seq(seq, m)
        want = o_identities_to_seq(seq, m)
        np.testing.assert_array_equal(got, want)


class TestFrequencies:
    def test_frequencies(self):
        m = random_msa(n=50, L=9, q=5)
        w = RNG.uniform(0.1, 1.0, size=50)
        got = frequencies(m, w, 5)
        want = o_frequencies(m, w, 5)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_pair_frequencies(self):
        m = random_msa(n=30, L=7, q=4)
        w = RNG.uniform(0.1, 1.0, size=30)
        fi = o_frequencies(m, w, 4)
        got = pair_frequencies(m, w, 4, fi)
        want = o_pair_frequencies(m, w, 4, fi)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


class TestHamiltonians:
    def setup_method(self):
        self.L, self.q = 9, 5
        self.J = random_symmetric_J(self.L, self.q, RNG)
        self.h = RNG.normal(size=(self.L, self.q))
        self.target = RNG.integers(0, self.q, size=self.L)

    def test_hamiltonians(self):
        seqs = random_msa(n=12, L=self.L, q=self.q)
        got = hamiltonians(seqs, self.J, self.h)
        want = o_hamiltonians(seqs, self.J, self.h)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_hamiltonians_device(self):
        seqs = random_msa(n=12, L=self.L, q=self.q)
        got = hamiltonians_device(seqs, self.J, self.h)
        want = o_hamiltonians(seqs, self.J, self.h)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_single_mutant_hamiltonians(self):
        got = single_mutant_hamiltonians(self.target, self.J, self.h)
        want = o_single_mutant_hamiltonians(self.target, self.J, self.h)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_delta_hamiltonian_single(self):
        pos = np.array([3])
        subs = np.array([(self.target[3] + 1) % self.q])
        got = delta_hamiltonian(pos, subs, self.target, self.J, self.h)
        want = o_delta_hamiltonian(pos, subs, self.target, self.J, self.h)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_delta_hamiltonian_multi(self):
        pos = np.array([1, 4, 7])
        subs = (self.target[pos] + np.array([1, 2, 3])) % self.q
        got = delta_hamiltonian(pos, subs, self.target, self.J, self.h)
        want = o_delta_hamiltonian(pos, subs, self.target, self.J, self.h)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_double_mutant_matrix_consistency(self):
        # dmm[i,j,a,b] must equal the explicit multi-substitution delta
        smm = single_mutant_hamiltonians(self.target, self.J, self.h)[:, :, 0]
        dmm = double_mutant_matrix(smm, self.J, self.target)
        for (i, j, a, b) in [(0, 5, 1, 2), (2, 8, 0, 4), (3, 4, 3, 3)]:
            want = o_delta_hamiltonian(
                np.array([i, j]), np.array([a, b]),
                self.target, self.J, self.h,
            )[0]
            np.testing.assert_allclose(dmm[i, j, a, b], want, rtol=1e-10)


class TestScores:
    def test_zero_sum_gauge(self):
        J = random_symmetric_J(8, 4, RNG)
        got = zero_sum_gauge(J)
        want = o_zero_sum_gauge(J)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
        # invariant: row/col sums of each off-diagonal block are ~0
        assert abs(got[0, 1].sum(axis=0)).max() < 1e-10
        assert abs(got[0, 1].sum(axis=1)).max() < 1e-10

    def test_apc_reference_formula(self):
        fn = np.abs(RNG.normal(size=(10, 10)))
        fn = (fn + fn.T) / 2
        np.fill_diagonal(fn, 0)
        L = 10
        col_means = fn.mean(axis=0) * L / (L - 1)
        m_mean = fn.mean() * L / (L - 1)
        want = fn - np.outer(col_means, col_means) / m_mean
        np.fill_diagonal(want, 0)
        np.testing.assert_allclose(apc(fn), want, rtol=1e-12)

    def test_fn_scores(self):
        J = random_symmetric_J(6, 3, RNG)
        J0 = o_zero_sum_gauge(J)
        want = np.zeros((6, 6))
        for i in range(5):
            for j in range(i + 1, 6):
                want[i, j] = want[j, i] = np.linalg.norm(J0[i, j], "fro")
        np.testing.assert_allclose(fn_scores(J), want, rtol=1e-10)

    def test_mi_scores(self):
        m = random_msa(n=60, L=6, q=4)
        w = np.ones(60)
        fi = o_frequencies(m, w, 4)
        fij = o_pair_frequencies(m, w, 4, fi)
        got = mi_scores(fij, fi)
        # literal reference loop (model.py:796-799)
        want = np.zeros((6, 6))
        for i in range(5):
            for j in range(i + 1, 6):
                p = fij[i, j]
                mm = np.outer(fi[i], fi[j])
                want[i, j] = want[j, i] = np.sum(
                    p[p > 0] * np.log(p[p > 0] / mm[p > 0])
                )
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_mi_apc_from_codes_matches_host_chain(self):
        """The fused one-dispatch device chain (reweight -> f_i/f_ij ->
        MI -> APC) must agree with the step-by-step float64 host chain:
        values to f32 tolerance, top-pair RANKS exactly."""
        from evcouplings_tpu.ops.frequencies import (
            frequencies, pair_frequencies,
        )
        from evcouplings_tpu.ops.scores import mi_apc_from_codes
        from evcouplings_tpu.ops.weights import num_cluster_members

        n, L, q, theta = 500, 40, 21, 0.8
        rng = np.random.default_rng(11)
        # correlated columns so MI has real structure (pure noise would
        # make rank agreement vacuous)
        m = rng.integers(0, q, size=(n, L)).astype(np.int8)
        m[:, 7] = m[:, 3]
        m[:, 25] = (m[:, 12] + 1) % q
        m[10] = m[4]  # a duplicate row exercises the reweighting

        w = 1.0 / num_cluster_members(m, theta)
        fi = frequencies(m, w, q)
        fij = pair_frequencies(m, w, q, fi)
        want_raw = mi_scores(fij, fi)
        want_apc = apc(want_raw)

        got_raw, got_apc = mi_apc_from_codes(m, theta, num_symbols=q)
        np.testing.assert_allclose(got_raw, want_raw, rtol=2e-5,
                                   atol=1e-7)
        np.testing.assert_allclose(got_apc, want_apc, rtol=2e-4,
                                   atol=1e-6)

        # rank agreement on the top-L upper-triangle pairs
        ii, jj = np.triu_indices(L, k=1)
        order = np.argsort(-want_apc[ii, jj])[:L]
        got_order = np.argsort(-got_apc[ii, jj])[:L]
        assert np.array_equal(order, got_order)


class TestPallasReweighting:
    """Pallas streaming kernel vs the XLA path (interpret mode on CPU;
    the compiled kernel is exercised on real TPU hardware)."""

    def test_matches_xla_path(self):
        from evcouplings_tpu.ops.weights_pallas import (
            num_cluster_members_pallas,
        )

        rng = np.random.default_rng(17)
        for (n, L, q, theta) in [
            (100, 23, 21, 0.8), (300, 150, 21, 0.8), (57, 300, 5, 0.5),
        ]:
            m = rng.integers(0, q, size=(n, L))
            m[5] = m[3]
            m[n - 1] = m[0]
            ref = num_cluster_members(m, theta)
            got = num_cluster_members_pallas(m, theta, interpret=True)
            assert np.array_equal(ref, got), (n, L, q, theta)

    def test_misaligned_shapes_rejected(self):
        """The raw kernel must REJECT inputs violating its alignment
        contract: floor-dividing the grid would silently drop the
        remainder rows/columns (wrong counts, garbage tail)."""
        import jax.numpy as jnp
        import pytest

        from evcouplings_tpu.ops.weights_pallas import (
            _neighbor_counts_pallas,
        )

        with pytest.raises(ValueError, match="contract"):
            _neighbor_counts_pallas(
                jnp.zeros((96, 12), jnp.int8), 4, 10, 96,
                block=64, l_chunk=8, interpret=True,
            )

    def test_padding_helper_feeds_kernel_correctly(self):
        """pad_codes_for_kernel + custom tiles: 96 identical rows of a
        (96, 12) matrix (neither dimension tile-aligned) must all
        count 96 neighbors."""
        from evcouplings_tpu.ops.weights_pallas import (
            num_cluster_members_pallas,
        )

        out = num_cluster_members_pallas(
            np.zeros((96, 12), dtype=np.int8), 0.8,
            block=64, l_chunk=8, interpret=True,
        )
        assert out.shape == (96,) and np.all(out == 96)

    def test_symbol_codes_beyond_int8_rejected(self):
        """Codes >= 128 would wrap negative in the int8 cast and
        silently match nothing — reject them."""
        import pytest

        from evcouplings_tpu.ops.weights_pallas import (
            num_cluster_members_pallas,
        )

        with pytest.raises(ValueError, match="127"):
            num_cluster_members_pallas(
                np.full((8, 4), 130, dtype=np.int16), 0.8,
                interpret=True,
            )


def test_frequencies_f64_mode_is_bit_level():
    """dtype=jnp.float64 must carry the WEIGHTS in f64 too: cluster
    reciprocals like 1/3 are not f32-representable, and the f64 parity
    mode exists precisely for bit-level oracle comparisons."""
    import jax.numpy as jnp

    from evcouplings_tpu.ops.frequencies import (
        frequencies, pair_frequencies,
    )
    from oracles import o_frequencies, o_pair_frequencies

    rng = np.random.default_rng(4)
    codes = rng.integers(0, 5, size=(21, 6)).astype(np.int8)
    weights = 1.0 / rng.integers(1, 7, size=21)   # f32-inexact values

    fi = frequencies(codes, weights, 5, dtype=jnp.float64)
    fi_o = o_frequencies(codes, weights, 5)
    np.testing.assert_allclose(fi, fi_o, rtol=1e-14, atol=1e-16)

    fij = pair_frequencies(codes, weights, 5, fi, dtype=jnp.float64)
    fij_o = o_pair_frequencies(codes, weights, 5, fi_o)
    np.testing.assert_allclose(fij, fij_o, rtol=1e-13, atol=1e-16)


def test_direct_information_warns_when_sweeps_exhausted():
    """Hitting the fixed-point sweep cap must be visible, not silently
    merged with converged pairs."""
    from evcouplings_tpu.ops.mean_field import direct_information

    rng = np.random.default_rng(1)
    L, q = 4, 3
    J = rng.normal(size=(L, L, q, q))
    J = 0.5 * (J + J.transpose(1, 0, 3, 2))
    f = np.abs(rng.normal(size=(L, q))) + 0.1
    f /= f.sum(axis=1, keepdims=True)
    with pytest.warns(RuntimeWarning, match="did not reach"):
        direct_information(J, f, epsilon=1e-12, max_sweeps=1)


def test_unflatten_j_round_trips_and_does_not_mutate():
    """The single-sourced layout helpers: unflatten(flatten(J))
    round-trips (including jax-backed inputs under x64) and never
    zeroes the CALLER's array in place (round-3 review)."""
    from evcouplings_tpu.ops.encode import flatten_J, unflatten_J
    from oracles import random_symmetric_J

    L, q = 4, 3
    J = random_symmetric_J(L, q, np.random.default_rng(0))
    J[0, 0] = 1.0     # nonzero diagonal block, must survive in caller

    out = unflatten_J(flatten_J(J), L, q)
    expect = J.copy()
    expect[np.arange(L), np.arange(L)] = 0.0
    np.testing.assert_array_equal(out, expect)
    # caller's tensor untouched
    assert (J[0, 0] == 1.0).all()

    # numpy input aliasing: mutating the output must not write back
    flat = np.asarray(flatten_J(J), dtype=np.float64)
    out2 = unflatten_J(flat, L, q)
    out2[0, 1] = 99.0
    assert not np.any(flat.reshape(L, q, L, q)[0, :, 1, :] == 99.0)
