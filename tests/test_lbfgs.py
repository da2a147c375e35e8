"""Unit tests for the scan-chained flat-vector LBFGS engine
(ops/lbfgs.py) against classic objectives and scipy's reference
implementation, independent of the PLM wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evcouplings_tpu.ops.lbfgs import (
    init_lbfgs_state, make_lbfgs_chunk,
)


def run_lbfgs(vg, x0, max_iter=200, steps_per_call=10, conv_tol=1e-8,
              m=5):
    chunk = jax.jit(make_lbfgs_chunk(
        vg, m=m, steps_per_call=steps_per_call, conv_tol=conv_tol
    ))
    value, grad = vg(x0)
    state = init_lbfgs_state(x0, value, grad, m=m)
    x = x0
    rows = []
    for _ in range(0, max_iter, steps_per_call):
        x, state, metrics = chunk(x, state)
        rows.append(np.asarray(metrics))
        if bool(state["converged"]):
            break
    return x, state, np.concatenate(rows, axis=0)


class TestQuadratic:
    def setup_method(self):
        rng = np.random.default_rng(3)
        A = rng.normal(size=(12, 12))
        self.A = jnp.asarray(A @ A.T + 12 * np.eye(12), jnp.float32)
        self.b = jnp.asarray(rng.normal(size=12), jnp.float32)

        def vg(x):
            g = self.A @ x - self.b
            return 0.5 * jnp.dot(x, self.A @ x) - jnp.dot(self.b, x), g

        self.vg = vg
        self.x_star = np.linalg.solve(np.asarray(self.A),
                                      np.asarray(self.b))

    def test_reaches_solution(self):
        x, state, _ = run_lbfgs(self.vg, jnp.zeros(12, jnp.float32),
                                conv_tol=1e-6)
        # the engine stops either via the gradient criterion or at
        # f32 linesearch resolution; the two outcomes are distinct
        # flags (only the former is "converged")
        assert bool(state["converged"]) or bool(state["ls_failed"])
        np.testing.assert_allclose(np.asarray(x), self.x_star,
                                   rtol=0, atol=1e-4)

    def test_rounding_failure_is_not_convergence(self):
        """With conv_tol=0 the gradient criterion can never trip, so
        the stop must come from the linesearch rounding guard — and
        must be reported as ls_failed, NOT converged."""
        x, state, _ = run_lbfgs(self.vg, jnp.zeros(12, jnp.float32),
                                max_iter=200, conv_tol=0.0)
        assert bool(state["ls_failed"])
        assert not bool(state["converged"])

    def test_chunked_matches_unchunked(self):
        """steps_per_call only changes host round trips, not math."""
        x1, s1, m1 = run_lbfgs(self.vg, jnp.zeros(12, jnp.float32),
                               max_iter=20, steps_per_call=1,
                               conv_tol=0.0)
        x10, s10, m10 = run_lbfgs(self.vg, jnp.zeros(12, jnp.float32),
                                  max_iter=20, steps_per_call=10,
                                  conv_tol=0.0)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x10),
                                   rtol=1e-6)
        # the unchunked run stops dispatching at the rounding-failure
        # flag; the chunked run freezes in-chunk — live prefixes match
        k = min(m1.shape[0], m10.shape[0])
        np.testing.assert_allclose(m1[:k, 0], m10[:k, 0], rtol=1e-6)
        assert int(s1["count"]) == int(s10["count"])

    def test_passthrough_after_convergence(self):
        """Once the engine stops (gnorm tolerance or linesearch
        rounding failure), extra in-chunk steps must not move x and
        the metric rows freeze."""
        x, state, metrics = run_lbfgs(
            self.vg, jnp.zeros(12, jnp.float32),
            max_iter=100, steps_per_call=100, conv_tol=1e-5,
        )
        assert bool(state["converged"]) or bool(state["ls_failed"])
        k = int(state["count"])  # iterations actually taken
        assert 0 < k < 100
        np.testing.assert_array_equal(
            metrics[k:, 0], np.full(100 - k, metrics[k, 0]))
        # and the solution is still the true optimum to f32 accuracy
        np.testing.assert_allclose(np.asarray(x), self.x_star,
                                   rtol=0, atol=1e-4)


class TestRosenbrock:
    """Ill-conditioned curved valley — exercises the backtracking
    strong-Wolfe linesearch far more than any PLM objective does."""

    def vg(self, x):
        a, b = 1.0, 100.0
        val = (a - x[0]) ** 2 + b * (x[1] - x[0] ** 2) ** 2
        g = jnp.stack([
            -2 * (a - x[0]) - 4 * b * x[0] * (x[1] - x[0] ** 2),
            2 * b * (x[1] - x[0] ** 2),
        ])
        return val, g

    def test_reaches_minimum(self):
        x0 = jnp.asarray([-1.2, 1.0], jnp.float32)
        x, state, _ = run_lbfgs(self.vg, x0, max_iter=400,
                                conv_tol=1e-6)
        np.testing.assert_allclose(np.asarray(x), [1.0, 1.0],
                                   atol=2e-3)

    def test_monotone_enough_descent(self):
        """Armijo guarantees every accepted step decreases f."""
        x0 = jnp.asarray([-1.2, 1.0], jnp.float32)
        _, _, metrics = run_lbfgs(self.vg, x0, max_iter=100,
                                  steps_per_call=1, conv_tol=0.0)
        vals = metrics[:, 0]
        assert np.all(np.diff(vals) <= 1e-6)


class TestAgainstScipy:
    def test_matches_scipy_optimum_logsumexp(self):
        """Smooth convex objective: both solvers must land on the same
        minimum value."""
        from scipy.optimize import minimize

        rng = np.random.default_rng(11)
        A = rng.normal(size=(30, 8)).astype(np.float32)
        bb = rng.normal(size=30).astype(np.float32)
        Aj, bj = jnp.asarray(A), jnp.asarray(bb)

        def f_np(x):
            z = A @ x + bb
            return float(np.log(np.exp(z).sum()) + 0.05 * (x ** 2).sum())

        def vg(x):
            z = Aj @ x + bj
            val = jax.scipy.special.logsumexp(z) + 0.05 * jnp.dot(x, x)
            p = jax.nn.softmax(z)
            return val, Aj.T @ p + 0.1 * x

        x, state, _ = run_lbfgs(vg, jnp.zeros(8, jnp.float32),
                                conv_tol=1e-7)
        ref = minimize(f_np, np.zeros(8), method="L-BFGS-B")
        v_ours, _ = vg(x)
        assert float(v_ours) == pytest.approx(ref.fun, abs=1e-4)


class TestHistoryEdgeCases:
    def test_memory_one(self):
        vg = lambda x: (jnp.dot(x, x), 2 * x)
        x, state, _ = run_lbfgs(vg, jnp.ones(4, jnp.float32), m=1,
                                conv_tol=1e-6)
        assert bool(state["converged"])
        np.testing.assert_allclose(np.asarray(x), np.zeros(4),
                                   atol=1e-5)

    def test_flat_start_zero_gradient(self):
        """Starting at the optimum converges on the first check and
        never takes a step."""
        vg = lambda x: (jnp.dot(x, x), 2 * x)
        x, state, metrics = run_lbfgs(vg, jnp.zeros(4, jnp.float32),
                                      max_iter=10, steps_per_call=10)
        assert bool(state["converged"])
        assert int(state["count"]) == 0
        np.testing.assert_array_equal(np.asarray(x), np.zeros(4))
