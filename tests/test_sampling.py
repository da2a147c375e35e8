"""
Gibbs sampler tests: exactness against the enumerated Boltzmann
distribution on a tiny model, and the full scientific round trip —
sample sequences from a Potts model with planted couplings, refit
with the PLM fitter, and verify the planted pairs come out on top.
"""

import itertools

import numpy as np
import pytest

from evcouplings_tpu.ops.sampling import gibbs_sample


def potts_logp(codes, J_ij, h_i):
    """Unnormalized log probability of integer sequences."""
    L = h_i.shape[0]
    e = sum(h_i[i, codes[:, i]] for i in range(L))
    for i in range(L):
        for j in range(i + 1, L):
            e = e + J_ij[i, j, codes[:, i], codes[:, j]]
    return e


class TestExactness:
    def test_matches_boltzmann_distribution(self):
        rng = np.random.default_rng(0)
        L, q = 3, 3
        h = rng.normal(scale=0.5, size=(L, q))
        J = np.zeros((L, L, q, q))
        for i in range(L):
            for j in range(i + 1, L):
                block = rng.normal(scale=0.7, size=(q, q))
                J[i, j] = block
                J[j, i] = block.T

        # exact distribution by enumeration
        states = np.array(
            list(itertools.product(range(q), repeat=L))
        )
        logp = potts_logp(states, J, h)
        p_exact = np.exp(logp - logp.max())
        p_exact /= p_exact.sum()

        codes, _ = gibbs_sample(
            J, h, n_samples=20000, n_sweeps=60, seed=1
        )
        # empirical distribution over the q^L states
        idx = sum(
            codes[:, i].astype(int) * q ** (L - 1 - i)
            for i in range(L)
        )
        counts = np.bincount(idx, minlength=q ** L)
        p_emp = counts / counts.sum()

        # total variation distance small
        tv = 0.5 * np.abs(p_emp - p_exact).sum()
        assert tv < 0.03, tv

    def test_beta_zero_is_uniform(self):
        rng = np.random.default_rng(1)
        L, q = 4, 4
        h = rng.normal(size=(L, q))
        J = np.zeros((L, L, q, q))
        codes, _ = gibbs_sample(
            J, h, n_samples=8000, n_sweeps=10, seed=2, beta=0.0
        )
        freqs = np.stack([
            np.bincount(codes[:, i].astype(int), minlength=q) / 8000
            for i in range(L)
        ])
        np.testing.assert_allclose(freqs, 1.0 / q, atol=0.03)

    def test_trajectory_shape(self):
        L, q = 3, 2
        codes, traj = gibbs_sample(
            np.zeros((L, L, q, q)), np.zeros((L, q)),
            n_samples=16, n_sweeps=20, thin=5, seed=0,
        )
        assert codes.shape == (16, L)
        assert traj.shape == (4, 16, L)
        np.testing.assert_array_equal(traj[-1], codes)


class TestThinning:
    def _tiny_model(self):
        rng = np.random.default_rng(11)
        L, q = 5, 3
        h = rng.normal(scale=0.3, size=(L, q))
        J = np.zeros((L, L, q, q))
        return J, h

    def test_remainder_sweeps_still_run(self):
        """n_sweeps not divisible by thin: the trajectory keeps
        n_sweeps // thin states but the FINAL codes must reflect all
        n_sweeps sweeps (same chain as an unthinned run)."""
        J, h = self._tiny_model()
        codes_ref, _ = gibbs_sample(J, h, n_samples=4, n_sweeps=5, seed=2)
        codes_thin, traj = gibbs_sample(
            J, h, n_samples=4, n_sweeps=5, seed=2, thin=2
        )
        assert traj.shape == (2, 4, 5)
        np.testing.assert_array_equal(codes_thin, codes_ref)

    def test_thin_larger_than_sweeps_rejected(self):
        J, h = self._tiny_model()
        with pytest.raises(ValueError, match="thin"):
            gibbs_sample(J, h, n_samples=4, n_sweeps=3, seed=0, thin=8)


class TestRoundTrip:
    @pytest.mark.slow
    def test_sample_then_refit_recovers_planted_couplings(self):
        from evcouplings_tpu.ops.gauge import zero_sum_gauge
        from evcouplings_tpu.ops.plm import PlmConfig, fit_plm
        from evcouplings_tpu.ops.scores import apc, fn_scores

        rng = np.random.default_rng(7)
        L, q = 10, 4
        h = rng.normal(scale=0.2, size=(L, q))
        J = np.zeros((L, L, q, q))
        planted = [(1, 6), (3, 8), (0, 9)]
        for i, j in planted:
            block = rng.normal(scale=1.2, size=(q, q))
            J[i, j] = block
            J[j, i] = block.T

        codes, _ = gibbs_sample(
            J, h, n_samples=6000, n_sweeps=80, seed=3
        )

        fit = fit_plm(
            codes, np.ones(len(codes)), q,
            PlmConfig(max_iter=80, block_size=2048, solver="lbfgs",
                      lambda_h=0.01, lambda_J=1.0),
        )

        J_gauge = zero_sum_gauge(fit.J_ij)
        fn = fn_scores(J_gauge)
        cn = apc(fn)

        iu = np.triu_indices(L, k=1)
        order = np.argsort(cn[iu])[::-1]
        top = {
            (int(iu[0][k]), int(iu[1][k])) for k in order[:len(planted)]
        }
        assert top == set(planted), (top, planted)
