"""
PLM fitter tests: loss correctness vs numpy oracle, optimizer convergence,
coupling recovery on synthetic data, and mesh-sharded equivalence.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from evcouplings_tpu.ops.plm import (
    PlmConfig,
    fit_plm,
    make_plm_loss,
    make_plm_value_and_grad,
)

RNG = np.random.default_rng(3)   # rebound per test below

@pytest.fixture(autouse=True)
def _per_test_rng(request):
    """Rebind the module RNG to a fresh, per-test deterministic stream
    (seeded from the test id) so a test's input data never depends on
    which tests ran before it — `-k` selection, reordering, or adding
    a test above no longer changes anyone's draws."""
    import zlib

    global RNG
    RNG = np.random.default_rng(zlib.crc32(request.node.nodeid.encode()))



def o_plm_loss(P_mat, h, codes, weights, lh, lJ, q):
    """Literal numpy pseudolikelihood loss (same parametrization)."""
    N, L = codes.shape
    J_flat = 0.5 * (P_mat + P_mat.T)
    J = J_flat.reshape(L, q, L, q).transpose(0, 2, 1, 3)
    J[np.arange(L), np.arange(L)] = 0.0

    nll = 0.0
    for s in range(N):
        x = codes[s]
        for r in range(L):
            if x[r] < 0:
                continue
            logits = h[r].copy()
            for j in range(L):
                if j != r and x[j] >= 0:
                    logits += J[r, j, :, x[j]]
            lse = np.log(np.exp(logits - logits.max()).sum()) + logits.max()
            nll -= weights[s] * (logits[x[r]] - lse)

    reg = lh * (h ** 2).sum() + lJ * 0.5 * (J ** 2).sum()
    return nll + reg


class TestLoss:
    def test_loss_matches_oracle(self):
        L, q, N = 5, 4, 7
        codes = RNG.integers(0, q, size=(N, L)).astype(np.int8)
        weights = RNG.uniform(0.3, 1.0, size=N)
        cfg = PlmConfig(lambda_h=0.02, lambda_J=0.5, block_size=8,
                        dtype="float64")
        loss = make_plm_loss(L, q, cfg)

        P_mat = RNG.normal(size=(L * q, L * q)) * 0.3
        h = RNG.normal(size=(L, q)) * 0.2

        codes_p = np.full((8, L), -1, dtype=np.int8)
        codes_p[:N] = codes
        w_p = np.zeros(8)
        w_p[:N] = weights

        got = float(loss(
            {"J": jnp.asarray(P_mat), "h": jnp.asarray(h)},
            jnp.asarray(codes_p), jnp.asarray(w_p),
        ))
        want = o_plm_loss(P_mat, h, codes, weights, 0.02, 0.5, q)
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_loss_symmetric_params_branch_matches(self):
        """make_plm_loss(symmetric_params=True) (the in-fit fast path
        that skips the transposed read) must equal the default loss on
        an exactly symmetric P."""
        L, q, N = 5, 4, 8
        codes = RNG.integers(0, q, size=(N, L)).astype(np.int8)
        weights = RNG.uniform(0.3, 1.0, size=N)
        cfg = PlmConfig(lambda_h=0.02, lambda_J=0.5, block_size=8,
                        dtype="float64")
        loss = make_plm_loss(L, q, cfg)
        loss_sym = make_plm_loss(L, q, cfg, symmetric_params=True)

        A = RNG.normal(size=(L * q, L * q)) * 0.3
        P_sym = 0.5 * (A + A.T)
        h = RNG.normal(size=(L, q)) * 0.2
        params = {"J": jnp.asarray(P_sym), "h": jnp.asarray(h)}
        a = float(loss(params, jnp.asarray(codes),
                       jnp.asarray(weights)))
        b = float(loss_sym(params, jnp.asarray(codes),
                           jnp.asarray(weights)))
        assert a == b

    def test_loss_ignores_masked_positions(self):
        # gap positions coded -1 must contribute neither as target nor
        # as context
        L, q = 4, 3
        codes = np.array([[0, 1, -1, 2], [1, -1, 0, 0]], dtype=np.int8)
        weights = np.array([1.0, 0.5])
        cfg = PlmConfig(lambda_h=0.0, lambda_J=0.0, block_size=2,
                        dtype="float64")
        loss = make_plm_loss(L, q, cfg)
        P_mat = RNG.normal(size=(L * q, L * q))
        h = RNG.normal(size=(L, q))
        got = float(loss(
            {"J": jnp.asarray(P_mat), "h": jnp.asarray(h)},
            jnp.asarray(codes), jnp.asarray(weights),
        ))
        want = o_plm_loss(P_mat, h, codes, weights, 0.0, 0.0, q)
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_gradient_stays_symmetric(self):
        L, q, N = 4, 3, 10
        codes = RNG.integers(0, q, size=(N, L)).astype(np.int8)
        weights = np.ones(N)
        cfg = PlmConfig(block_size=16, dtype="float64")
        loss = make_plm_loss(L, q, cfg)

        codes_p = np.full((16, L), -1, dtype=np.int8)
        codes_p[:N] = codes
        w_p = np.zeros(16, dtype=np.float32)
        w_p[:N] = 1.0

        params = {
            "J": jnp.zeros((L * q, L * q), dtype=jnp.float64),
            "h": jnp.zeros((L, q), dtype=jnp.float64),
        }
        g = jax.grad(loss)(params, jnp.asarray(codes_p), jnp.asarray(w_p))
        gJ = np.asarray(g["J"])
        np.testing.assert_allclose(gJ, gJ.T, rtol=1e-12, atol=1e-12)


class TestValueAndGrad:
    """The closed-form fused value+grad must match autodiff of the
    loss exactly (it replaces it in the Adam production path)."""

    def _case(self, cfg, L=6, q=5, N=48, rng=None):
        rng = RNG if rng is None else rng
        codes = rng.integers(0, q, size=(N, L)).astype(np.int8)
        codes[rng.random((N, L)) < 0.15] = -1   # gaps / ignored sites
        weights = rng.uniform(0.2, 1.5, size=N).astype(np.float32)
        P_mat = (rng.normal(size=(L * q, L * q)) * 0.1).astype(
            np.float32
        )
        params = {
            "J": jnp.asarray(0.5 * (P_mat + P_mat.T)),
            "h": jnp.asarray(
                (rng.normal(size=(L, q)) * 0.1).astype(np.float32)
            ),
        }
        va, ga = jax.jit(jax.value_and_grad(make_plm_loss(L, q, cfg)))(
            params, jnp.asarray(codes), jnp.asarray(weights)
        )
        vm, gm = jax.jit(make_plm_value_and_grad(L, q, cfg))(
            params, jnp.asarray(codes), jnp.asarray(weights)
        )
        np.testing.assert_allclose(float(vm), float(va), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(gm["J"]), np.asarray(ga["J"]),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(gm["h"]), np.asarray(ga["h"]),
            rtol=1e-5, atol=1e-6,
        )

    def test_matches_autodiff(self):
        self._case(PlmConfig(block_size=16))

    def test_extreme_logits_stay_finite(self):
        """The whole-row softmax shift could underflow a site whose
        logits sit far below the row max (Z -> 0 -> inf residuals);
        the shift floor must keep value and gradients finite even for
        wildly diverged parameters."""
        L, q, N = 4, 3, 16
        codes = RNG.integers(0, q, size=(N, L)).astype(np.int8)
        weights = np.ones(N, dtype=np.float32)
        h = np.zeros((L, q), dtype=np.float32)
        # site 0 dominates the row max by ~300 nats; site 1 sits at
        # -300 relative — far past the f32 exp underflow point
        h[0] = 300.0
        h[1] = -300.0
        params = {
            "J": jnp.zeros((L * q, L * q), dtype=jnp.float32),
            "h": jnp.asarray(h),
        }
        cfg = PlmConfig(block_size=16)
        v, g = jax.jit(make_plm_value_and_grad(L, q, cfg))(
            params, jnp.asarray(codes), jnp.asarray(weights)
        )
        assert np.isfinite(float(v))
        assert np.isfinite(np.asarray(g["J"])).all()
        assert np.isfinite(np.asarray(g["h"])).all()

    def test_matches_autodiff_group_l1(self):
        self._case(PlmConfig(block_size=16, lambda_group=0.3))

    def test_matches_autodiff_random_config_sweep(self):
        """Randomized sweep over fitter-config combinations: the
        closed-form gradient must track autodiff under every mix of
        regularizers, block sizes, layouts, and problem shapes."""
        for trial in range(6):
            rng = np.random.default_rng(1000 + trial)
            cfg = PlmConfig(
                block_size=int(rng.choice([8, 16, 48])),
                lambda_h=float(rng.uniform(0.0, 0.1)),
                lambda_J=float(rng.uniform(0.01, 20.0)),
                lambda_group=(
                    float(rng.uniform(0.05, 1.0))
                    if rng.random() < 0.5 else 0.0
                ),
                # alternate deterministically so BOTH dJh layouts are
                # always exercised (incl. two_phase + group-L1, which
                # no other test combines)
                grad_layout=["carried", "two_phase"][trial % 2],
            )
            L = int(rng.integers(3, 9))
            q = int(rng.integers(3, 7))
            N = int(cfg.block_size * rng.integers(1, 4))
            # per-trial rng: data independent of test ordering
            self._case(cfg, L=L, q=q, N=N, rng=rng)

    def test_matches_autodiff_two_phase(self):
        # forced two-phase layout in float32 (same math as carried,
        # different dJh reduction order); exercises the build-inside
        # fallback when no precomputed one-hot is passed
        self._case(PlmConfig(block_size=16, grad_layout="two_phase"))

    def test_two_phase_precomputed_onehot_matches(self):
        from evcouplings_tpu.ops.plm import build_augmented_onehot

        L, q, N = 6, 5, 48
        codes = RNG.integers(0, q, size=(N, L)).astype(np.int8)
        codes[RNG.random((N, L)) < 0.15] = -1
        weights = RNG.uniform(0.2, 1.5, size=N).astype(np.float32)
        P_mat = (RNG.normal(size=(L * q, L * q)) * 0.1).astype(
            np.float32
        )
        params = {
            "J": jnp.asarray(0.5 * (P_mat + P_mat.T)),
            "h": jnp.asarray(
                (RNG.normal(size=(L, q)) * 0.1).astype(np.float32)
            ),
        }
        cfg = PlmConfig(block_size=16, grad_layout="two_phase")
        vg = jax.jit(make_plm_value_and_grad(L, q, cfg))
        oh = build_augmented_onehot(
            jnp.asarray(codes), q, jnp.float32
        )
        v1, g1 = vg(params, jnp.asarray(codes), jnp.asarray(weights))
        v2, g2 = vg(
            params, jnp.asarray(codes), jnp.asarray(weights), oh
        )
        assert float(v1) == float(v2)
        assert (np.asarray(g1["J"]) == np.asarray(g2["J"])).all()
        assert (np.asarray(g1["h"]) == np.asarray(g2["h"])).all()

    def test_grad_layout_resolution(self):
        from evcouplings_tpu.ops.plm import _resolve_grad_layout

        # auto: two-phase only for bf16 + large blocks + fits budget
        assert _resolve_grad_layout(
            PlmConfig(block_size=8192), jnp.bfloat16, 16384, 3456
        ) == "two_phase"
        assert _resolve_grad_layout(
            PlmConfig(block_size=512), jnp.bfloat16, 16384, 3456
        ) == "carried"
        assert _resolve_grad_layout(
            PlmConfig(block_size=8192), jnp.float32, 16384, 3456
        ) == "carried"
        # one-hot over budget -> carried
        assert _resolve_grad_layout(
            PlmConfig(block_size=8192), jnp.bfloat16, 10 ** 9, 3456
        ) == "carried"
        # explicit override wins
        assert _resolve_grad_layout(
            PlmConfig(block_size=16, grad_layout="two_phase"),
            jnp.float32, 64, 3456,
        ) == "two_phase"
        with pytest.raises(ValueError):
            _resolve_grad_layout(
                PlmConfig(grad_layout="bogus"), jnp.float32, 64, 3456
            )

    def test_mesh_matches_single_device_two_phase(self):
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        L, q, N = 6, 5, 64
        codes = RNG.integers(0, q, size=(N, L)).astype(np.int8)
        weights = np.ones(N, np.float32)
        P_mat = (RNG.normal(size=(L * q, L * q)) * 0.05).astype(
            np.float32
        )
        params = {
            "J": jnp.asarray(0.5 * (P_mat + P_mat.T)),
            "h": jnp.zeros((L, q), jnp.float32),
        }
        cfg = PlmConfig(block_size=16, grad_layout="two_phase")
        v1, g1 = jax.jit(make_plm_value_and_grad(L, q, cfg))(
            params, jnp.asarray(codes), jnp.asarray(weights)
        )
        mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
        sh = NamedSharding(mesh, P("data"))
        v2, g2 = jax.jit(make_plm_value_and_grad(L, q, cfg, mesh=mesh))(
            jax.device_put(params, NamedSharding(mesh, P())),
            jax.device_put(jnp.asarray(codes), sh),
            jax.device_put(jnp.asarray(weights), sh),
        )
        # the K = N_local GEMM splits across shards, so equality is
        # up to f32 reduction order here (unlike the carried layout)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g1["J"]), np.asarray(g2["J"]),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(g1["h"]), np.asarray(g2["h"]),
            rtol=1e-4, atol=1e-6,
        )

    def test_fit_two_phase_layout_smoke(self):
        # end-to-end fit with the two-phase layout forced
        codes = RNG.integers(0, 4, size=(96, 6)).astype(np.int8)
        res = fit_plm(
            codes, np.ones(96), 4,
            PlmConfig(block_size=32, grad_layout="two_phase",
                      solver="adam", max_iter=5, steps_per_call=5),
        )
        assert res.num_iter == 5
        assert np.isfinite(res.final_loss)

    def test_mesh_matches_single_device_bitwise(self):
        # the sharded and unsharded programs must agree bit-for-bit
        # (single- vs multi-process reproducibility of the fit)
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        L, q, N = 6, 5, 64
        codes = RNG.integers(0, q, size=(N, L)).astype(np.int8)
        weights = np.ones(N, np.float32)
        P_mat = (RNG.normal(size=(L * q, L * q)) * 0.05).astype(
            np.float32
        )
        params = {
            "J": jnp.asarray(0.5 * (P_mat + P_mat.T)),
            "h": jnp.zeros((L, q), jnp.float32),
        }
        cfg = PlmConfig(block_size=32)
        v1, g1 = jax.jit(make_plm_value_and_grad(L, q, cfg))(
            params, jnp.asarray(codes), jnp.asarray(weights)
        )
        mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
        sh = NamedSharding(mesh, P("data"))
        v2, g2 = jax.jit(make_plm_value_and_grad(L, q, cfg, mesh=mesh))(
            jax.device_put(params, NamedSharding(mesh, P())),
            jax.device_put(jnp.asarray(codes), sh),
            jax.device_put(jnp.asarray(weights), sh),
        )
        assert float(v1) == float(v2)
        assert (np.asarray(g1["J"]) == np.asarray(g2["J"])).all()
        assert (np.asarray(g1["h"]) == np.asarray(g2["h"])).all()


class TestFit:
    def make_coupled_msa(self, N=600, L=8, q=4):
        """Synthetic MSA where columns 2 and 5 are perfectly coupled."""
        codes = RNG.integers(0, q, size=(N, L))
        codes[:, 5] = (codes[:, 2] + 1) % q
        return codes

    def test_fit_recovers_coupling(self):
        codes = self.make_coupled_msa()
        N = codes.shape[0]
        cfg = PlmConfig(
            lambda_h=0.01, lambda_J=0.05, max_iter=120,
            block_size=128, dtype="float64",
        )
        res = fit_plm(codes, np.ones(N), 4, cfg)
        assert res.num_iter > 1

        from evcouplings_tpu.ops.scores import cn_scores

        cn = cn_scores(res.J_ij)
        ii, jj = np.triu_indices(8, k=1)
        best = np.argmax(cn[ii, jj])
        assert (ii[best], jj[best]) == (2, 5)

    def test_fit_converges_and_reduces_loss(self):
        codes = self.make_coupled_msa(N=200)
        cfg = PlmConfig(max_iter=200, block_size=64, dtype="float64",
                        lambda_J=0.1)
        records = []
        res = fit_plm(codes, np.ones(200), 4, cfg,
                      callback=records.append)
        assert res.converged
        assert records[-1]["fx"] < records[0]["fx"]
        # J must satisfy plmc invariants
        np.testing.assert_allclose(
            res.J_ij, res.J_ij.transpose(1, 0, 3, 2), atol=1e-12
        )
        assert np.all(res.J_ij[np.arange(8), np.arange(8)] == 0)

    def test_matches_scipy_lbfgs_optimum(self):
        """Same objective optimized with scipy must reach the same loss."""
        from scipy.optimize import minimize

        L, q, N = 4, 3, 50
        codes = RNG.integers(0, q, size=(N, L))
        weights = RNG.uniform(0.5, 1.0, size=N)
        cfg = PlmConfig(lambda_h=0.01, lambda_J=0.2, max_iter=500,
                        conv_tol=1e-9, block_size=64, dtype="float64")

        res = fit_plm(codes, weights, q, cfg)

        loss = make_plm_loss(L, q, cfg)
        codes_p = np.full((64, L), -1, dtype=np.int8)
        codes_p[:N] = codes
        w_p = np.zeros(64, dtype=np.float32)
        w_p[:N] = weights
        codes_j, w_j = jnp.asarray(codes_p), jnp.asarray(w_p)

        lq = L * q

        def unpack(x):
            return {
                "J": jnp.asarray(x[: lq * lq].reshape(lq, lq)),
                "h": jnp.asarray(x[lq * lq:].reshape(L, q)),
            }

        vg = jax.jit(jax.value_and_grad(
            lambda p: loss(p, codes_j, w_j)
        ))

        def fun(x):
            v, g = vg(unpack(x))
            return float(v), np.concatenate(
                [np.asarray(g["J"]).ravel(), np.asarray(g["h"]).ravel()]
            )

        x0 = np.zeros(lq * lq + L * q)
        opt = minimize(fun, x0, jac=True, method="L-BFGS-B",
                       options={"maxiter": 500, "gtol": 1e-9})

        np.testing.assert_allclose(res.final_loss, opt.fun, rtol=1e-5)

    def test_mesh_sharded_fit_matches_single_device(self):
        from jax.sharding import Mesh

        codes = self.make_coupled_msa(N=128, L=6, q=3)
        cfg = PlmConfig(max_iter=15, block_size=16, dtype="float64")

        res1 = fit_plm(codes, np.ones(128), 3, cfg)

        devices = np.array(jax.devices()[:8])
        mesh = Mesh(devices, axis_names=("data",))
        res8 = fit_plm(codes, np.ones(128), 3, cfg, mesh=mesh)

        np.testing.assert_allclose(res1.final_loss, res8.final_loss,
                                   rtol=1e-9)
        np.testing.assert_allclose(res1.J_ij, res8.J_ij, atol=1e-8)


class TestCheckpointResume:
    """Mid-fit checkpoint/resume (absent from plmc: preempted long
    fits restart from scratch there)."""

    def _data(self):
        rng = np.random.default_rng(9)
        codes = rng.integers(0, 5, size=(48, 6)).astype(np.int8)
        return codes, np.ones(48)

    @pytest.mark.parametrize("solver", ["adam", "lbfgs"])
    def test_resume_is_bitwise_identical(self, tmp_path, solver):
        """Adam checkpoints moments; LBFGS checkpoints the flat master
        vector + rolling (s, y) history + carried evaluation — both
        resume bitwise-identically to an uninterrupted fit. (plmc has
        no mid-fit checkpointing; libLBFGS state dies with the
        process.)"""
        from evcouplings_tpu.ops.plm import PlmConfig, fit_plm

        codes, w = self._data()
        cfg20 = PlmConfig(max_iter=20, block_size=16, solver=solver,
                          conv_tol=0.0)

        ref = fit_plm(codes, w, 5, cfg20)

        # interrupted run: stop at 10, resume from checkpoint to 20
        ckpt = str(tmp_path / "fit.ckpt.npz")
        cfg10 = PlmConfig(max_iter=10, block_size=16, solver=solver,
                          conv_tol=0.0)
        fit_plm(codes, w, 5, cfg10, checkpoint_file=ckpt,
                checkpoint_every=5)
        assert "lbfgs_s_hist" in np.load(ckpt) or solver == "adam"
        resumed = fit_plm(codes, w, 5, cfg20, checkpoint_file=ckpt,
                          checkpoint_every=5)

        assert resumed.iteration_table[0]["iter"] == 11
        np.testing.assert_array_equal(resumed.J_ij, ref.J_ij)
        np.testing.assert_array_equal(resumed.h_i, ref.h_i)

    def test_final_loss_prices_returned_parameters_on_overshoot(self):
        """With steps_per_call > 1 and max_iter not a chunk multiple,
        the device overshoots max_iter with live steps (documented:
        the parameters keep the extra descent); final_loss must price
        the RETURNED parameters, strictly below the last recorded
        table row on a monotone LBFGS descent."""
        from evcouplings_tpu.ops.plm import PlmConfig, fit_plm

        codes, w = self._data()
        res = fit_plm(
            codes, w, 5,
            PlmConfig(max_iter=5, block_size=16, solver="lbfgs",
                      conv_tol=0.0, steps_per_call=4),
        )
        assert len(res.iteration_table) == 5
        assert np.isfinite(res.final_loss)
        assert res.final_loss < res.iteration_table[-1]["fx"]

    @pytest.mark.parametrize("solver", ["adam", "lbfgs", "fista"])
    def test_resume_at_max_iter_reports_real_loss(self, tmp_path,
                                                  solver):
        """Re-running a fit whose checkpoint already sits at max_iter
        must return the checkpointed parameters with a REAL objective
        value, not final_loss=NaN from a never-entered loop, and must
        not append duplicate iteration rows."""
        from evcouplings_tpu.ops.plm import PlmConfig, fit_plm

        codes, w = self._data()
        lam = {"lambda_group": 0.3} if solver == "fista" else {}
        cfg = PlmConfig(max_iter=8, block_size=16, solver=solver,
                        conv_tol=0.0, **lam)

        ckpt = str(tmp_path / "fit.ckpt.npz")
        first = fit_plm(codes, w, 5, cfg, checkpoint_file=ckpt,
                        checkpoint_every=4)
        rerun = fit_plm(codes, w, 5, cfg, checkpoint_file=ckpt,
                        checkpoint_every=4)

        # nothing re-run: no new rows, num_iter still the TOTAL the
        # returned parameters received (what the model artifact needs)
        assert len(rerun.iteration_table) == 0
        assert rerun.num_iter == first.num_iter
        assert np.isfinite(rerun.final_loss)
        np.testing.assert_allclose(
            rerun.final_loss, first.final_loss, rtol=1e-5
        )
        if solver == "fista":
            # the FISTA master can be infinitesimally asymmetric
            # (per-block prox on f32), so the load-time
            # resymmetrization rounds a handful of entries by one ulp
            np.testing.assert_allclose(
                rerun.J_ij, first.J_ij, rtol=0, atol=5e-7
            )
        else:
            np.testing.assert_array_equal(rerun.J_ij, first.J_ij)

    def test_converged_lbfgs_resume_does_not_drift(self, tmp_path):
        """Resuming a CONVERGED LBFGS checkpoint below max_iter must
        not dispatch a pass-through chunk that duplicates the final
        iterate and bumps the iteration counter."""
        from evcouplings_tpu.ops.plm import PlmConfig, fit_plm

        codes, w = self._data()
        # loose tolerance so the fit converges quickly
        cfg = PlmConfig(max_iter=40, block_size=16, solver="lbfgs",
                        conv_tol=0.5)

        ckpt = str(tmp_path / "fit.ckpt.npz")
        first = fit_plm(codes, w, 5, cfg, checkpoint_file=ckpt,
                        checkpoint_every=1)
        assert first.converged and first.num_iter < 40

        rerun = fit_plm(codes, w, 5, cfg, checkpoint_file=ckpt,
                        checkpoint_every=1)
        assert rerun.converged
        assert len(rerun.iteration_table) == 0
        assert rerun.num_iter == first.num_iter
        assert np.isfinite(rerun.final_loss)
        np.testing.assert_array_equal(rerun.J_ij, first.J_ij)

        # the checkpoint's iteration counter must not have drifted
        assert int(np.load(ckpt)["iteration"]) == first.num_iter

    @pytest.mark.parametrize("solver", ["adam", "lbfgs"])
    def test_changed_configuration_rejects_stale_checkpoint(
            self, tmp_path, solver):
        """A snapshot fingerprints the data + trajectory-shaping
        config; resuming it under EDITED hyperparameters (or different
        data) must raise instead of silently mixing objectives."""
        from evcouplings_tpu.ops.plm import PlmConfig, fit_plm

        codes, w = self._data()
        ckpt = str(tmp_path / "fit.ckpt.npz")
        fit_plm(codes, w, 5,
                PlmConfig(max_iter=8, block_size=16, solver=solver,
                          conv_tol=0.0, lambda_J=1.0),
                checkpoint_file=ckpt, checkpoint_every=4)

        # same shapes, different regularization -> different objective
        with pytest.raises(ValueError, match="DIFFERENT fit"):
            fit_plm(codes, w, 5,
                    PlmConfig(max_iter=16, block_size=16,
                              solver=solver, conv_tol=0.0,
                              lambda_J=5.0),
                    checkpoint_file=ckpt, checkpoint_every=4)

        # different weights (e.g. a different theta) -> rejected too
        with pytest.raises(ValueError, match="DIFFERENT fit"):
            fit_plm(codes, w * 0.5, 5,
                    PlmConfig(max_iter=16, block_size=16,
                              solver=solver, conv_tol=0.0,
                              lambda_J=1.0),
                    checkpoint_file=ckpt, checkpoint_every=4)

    def test_asym_changed_configuration_rejects_stale_checkpoint(
            self, tmp_path):
        from evcouplings_tpu.ops.plm import PlmConfig
        from evcouplings_tpu.ops.plm_sites import fit_plm_asym

        codes, w = self._data()
        ckpt = str(tmp_path / "afit.ckpt.npz")
        fit_plm_asym(codes, w, 5,
                     PlmConfig(max_iter=6, block_size=16,
                               solver="adam", lambda_J=1.0),
                     checkpoint_file=ckpt, checkpoint_every=3)
        with pytest.raises(ValueError, match="DIFFERENT fit"):
            fit_plm_asym(codes, w, 5,
                         PlmConfig(max_iter=12, block_size=16,
                                   solver="adam", lambda_J=5.0),
                         checkpoint_file=ckpt, checkpoint_every=3)

    def test_asymmetric_checkpoint_resumes_consistently(
            self, tmp_path):
        """A parameter checkpoint whose J is NOT exactly symmetric
        (e.g. written externally) is symmetrized on load, so the
        matrix the fit optimizes is the same one materialized in the
        result — resuming from P and from pre-symmetrized 0.5(P+P^T)
        must agree exactly."""
        from evcouplings_tpu.ops.plm import PlmConfig, fit_plm

        codes, w = self._data()
        lq = 6 * 5
        rng = np.random.default_rng(3)
        P = rng.normal(scale=0.05, size=(lq, lq)).astype(np.float32)
        h = rng.normal(scale=0.05, size=(6, 5)).astype(np.float32)

        cfg = PlmConfig(max_iter=8, block_size=16, solver="lbfgs",
                        conv_tol=0.0)
        ck_a = str(tmp_path / "asym.npz")
        ck_s = str(tmp_path / "sym.npz")
        np.savez(ck_a, J=P, h=h, iteration=np.asarray(3))
        np.savez(ck_s, J=0.5 * (P + P.T), h=h,
                 iteration=np.asarray(3))
        res_a = fit_plm(codes, w, 5, cfg, checkpoint_file=ck_a,
                        checkpoint_every=10**9)
        res_s = fit_plm(codes, w, 5, cfg, checkpoint_file=ck_s,
                        checkpoint_every=10**9)
        np.testing.assert_array_equal(res_a.J_ij, res_s.J_ij)
        np.testing.assert_array_equal(res_a.h_i, res_s.h_i)

    def test_lbfgs_legacy_checkpoint_resumes_without_history(
            self, tmp_path):
        """A checkpoint holding only parameters (pre-history format,
        or written with a different memory_size) still resumes — the
        history restarts from the saved point."""
        from evcouplings_tpu.ops.plm import PlmConfig, fit_plm

        codes, w = self._data()
        ckpt = str(tmp_path / "fit.ckpt.npz")
        fit_plm(codes, w, 5,
                PlmConfig(max_iter=3, block_size=16, solver="lbfgs",
                          conv_tol=0.0),
                checkpoint_file=ckpt)
        # strip the solver state, keep params only
        full = dict(np.load(ckpt))
        np.savez(ckpt, **{k: v for k, v in full.items()
                          if not k.startswith("lbfgs_")})
        resumed = fit_plm(
            codes, w, 5,
            PlmConfig(max_iter=10, block_size=16, solver="lbfgs",
                      conv_tol=0.0),
            checkpoint_file=ckpt)
        assert resumed.iteration_table[0]["iter"] == 4
        assert resumed.num_iter >= 2
        assert (resumed.iteration_table[-1]["fx"]
                < resumed.iteration_table[0]["fx"])

    def test_checkpoint_written_at_interval_and_end(self, tmp_path):
        from evcouplings_tpu.ops.plm import PlmConfig, fit_plm

        codes, w = self._data()
        ckpt = str(tmp_path / "fit.ckpt.npz")
        fit_plm(
            codes, w, 5,
            PlmConfig(max_iter=7, block_size=16, solver="adam"),
            checkpoint_file=ckpt, checkpoint_every=100,
        )
        # interval never reached, but the final state is persisted
        assert np.load(ckpt)["iteration"] == 7

    def test_shape_mismatch_rejected(self, tmp_path):
        from evcouplings_tpu.ops.plm import PlmConfig, fit_plm

        codes, w = self._data()
        ckpt = str(tmp_path / "fit.ckpt.npz")
        fit_plm(codes, w, 5,
                PlmConfig(max_iter=2, block_size=16, solver="adam"),
                checkpoint_file=ckpt)
        with pytest.raises(ValueError, match="shape"):
            fit_plm(codes[:, :4].copy(), w, 5,
                    PlmConfig(max_iter=2, block_size=16,
                              solver="adam"),
                    checkpoint_file=ckpt)

    @pytest.mark.parametrize("solver,dtype,steps_per_call", [
        ("adam", "float32", 1),
        ("adam", "bfloat16", 4),
        ("lbfgs", "float32", 1),
    ])
    def test_raw_params_stay_bitwise_symmetric(
            self, tmp_path, solver, dtype, steps_per_call):
        """fit_plm builds J_eff as P * mask (skipping the strided
        transposed read) on the assumption that the raw P stays
        EXACTLY symmetric through the whole fit: symmetric zero init,
        exactly-symmetrized gradients, and elementwise optimizer
        updates (Adam moments / LBFGS two-loop + linesearch are all
        elementwise or axpy on symmetric operands). Pin that invariant
        bitwise on the checkpointed raw parameters."""
        from evcouplings_tpu.ops.plm import PlmConfig, fit_plm

        codes, w = self._data()
        ckpt = str(tmp_path / "fit.ckpt.npz")
        fit_plm(codes, w, 5,
                PlmConfig(max_iter=12, block_size=16, solver=solver,
                          dtype=dtype, steps_per_call=steps_per_call,
                          conv_tol=0.0),
                checkpoint_file=ckpt, checkpoint_every=10**9)
        P = np.load(ckpt)["J"]
        assert np.abs(P).max() > 0  # fit actually moved
        assert np.array_equal(P, P.T)


class TestFusedUpdate:
    """Fused Pallas Adam epilogue (ops/plm_update.py) vs the jnp
    oracle and vs the unfused optax fit path."""

    def _rand_state(self, L, q, rng):
        lq = L * q
        site = np.repeat(np.arange(L), q)
        mask = (site[:, None] != site[None, :]).astype(np.float32)
        A = rng.normal(size=(lq, lq)).astype(np.float32)
        P = (0.5 * (A + A.T) * mask).astype(np.float32)
        dJh = rng.normal(size=(lq, lq + 32)).astype(np.float32)
        B = rng.normal(size=(lq, lq)).astype(np.float32)
        mu = (0.5 * (B + B.T) * mask).astype(np.float32)
        nu = (np.abs(0.5 * (B + B.T)) * mask).astype(np.float32)
        return dJh, P, mu, nu

    def test_kernel_matches_reference(self):
        from evcouplings_tpu.ops.plm_update import (
            adam_update_reference, fused_adam_update,
        )

        L, q = 6, 5
        dJh, P, mu, nu = self._rand_state(L, q, np.random.default_rng(0))
        kw = dict(q=q, lambda_j=0.7, lr=3e-3)
        got = fused_adam_update(
            jnp.asarray(dJh), jnp.asarray(P), jnp.asarray(mu),
            jnp.asarray(nu), 1.25, 1.05, bi=8, bj=128,
            interpret=True, **kw,
        )
        want = adam_update_reference(
            jnp.asarray(dJh), jnp.asarray(P), jnp.asarray(mu),
            jnp.asarray(nu), 1.25, 1.05, **kw,
        )
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g, dtype=np.float64),
                np.asarray(w, dtype=np.float64),
                rtol=2e-6, atol=2e-6,
            )

    def test_kernel_edge_tiles(self):
        # lq = 30 not divisible by either block dim: ceil-grid edge
        # tiles must not leak garbage into outputs or the g^2 sum
        from evcouplings_tpu.ops.plm_update import (
            adam_update_reference, fused_adam_update,
        )

        L, q = 10, 3
        dJh, P, mu, nu = self._rand_state(L, q, np.random.default_rng(1))
        kw = dict(q=q, lambda_j=0.3, lr=1e-2)
        got = fused_adam_update(
            jnp.asarray(dJh), jnp.asarray(P), jnp.asarray(mu),
            jnp.asarray(nu), 2.0, 1.5, bi=8, bj=128,
            interpret=True, **kw,
        )
        want = adam_update_reference(
            jnp.asarray(dJh), jnp.asarray(P), jnp.asarray(mu),
            jnp.asarray(nu), 2.0, 1.5, **kw,
        )
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g, dtype=np.float64),
                np.asarray(w, dtype=np.float64),
                rtol=2e-6, atol=2e-6,
            )

    def test_fit_fused_matches_unfused(self):
        from evcouplings_tpu.ops.plm import fit_plm

        rng = np.random.default_rng(7)
        N, L, q = 64, 7, 4
        codes = rng.integers(0, q, size=(N, L)).astype(np.int8)
        weights = np.ones(N)
        base = dict(
            solver="adam", adam_lr=1e-2, max_iter=25, block_size=32,
            dtype="float32", precision="highest", steps_per_call=5,
            lambda_h=0.01, lambda_J=0.5,
        )
        r_off = fit_plm(codes, weights, q,
                        PlmConfig(fused_update="off", **base))
        r_on = fit_plm(codes, weights, q,
                       PlmConfig(fused_update="on", **base))
        np.testing.assert_allclose(r_on.J_ij, r_off.J_ij,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(r_on.h_i, r_off.h_i,
                                   rtol=1e-4, atol=1e-5)
        fx_on = [r["fx"] for r in r_on.iteration_table]
        fx_off = [r["fx"] for r in r_off.iteration_table]
        np.testing.assert_allclose(fx_on, fx_off, rtol=1e-4)
        g_on = [r["gnorm"] for r in r_on.iteration_table]
        g_off = [r["gnorm"] for r in r_off.iteration_table]
        np.testing.assert_allclose(g_on, g_off, rtol=1e-3, atol=1e-6)

    def test_fused_on_requires_adam(self):
        from evcouplings_tpu.ops.plm import _resolve_fused_update

        with pytest.raises(ValueError):
            _resolve_fused_update(
                PlmConfig(solver="lbfgs", fused_update="on"),
                None, jnp.float32,
            )
        assert _resolve_fused_update(
            PlmConfig(solver="lbfgs", fused_update="auto"),
            None, jnp.float32,
        ) == (False, False)

    def test_presym_kernel_matches_reference(self):
        from evcouplings_tpu.ops.plm_update import (
            adam_update_reference, fused_adam_update_presym,
        )

        L, q = 6, 5
        lq = L * q
        dJh, P, mu, nu = self._rand_state(L, q, np.random.default_rng(2))
        kw = dict(q=q, lambda_j=0.7, lr=3e-3)
        a = dJh[:, :lq]
        got = fused_adam_update_presym(
            jnp.asarray(a + a.T), jnp.asarray(P), jnp.asarray(mu),
            jnp.asarray(nu), 1.25, 1.05, bi=8, bj=128,
            interpret=True, **kw,
        )
        want = adam_update_reference(
            jnp.asarray(dJh), jnp.asarray(P), jnp.asarray(mu),
            jnp.asarray(nu), 1.25, 1.05, **kw,
        )
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g, dtype=np.float64),
                np.asarray(w, dtype=np.float64),
                rtol=2e-6, atol=2e-6,
            )


@pytest.mark.parametrize("mode,ref_mode", [
    ("highest", "highest_unstructured"),
    ("high", "high_unstructured"),
])
def test_structured_precision_matches_unstructured(mode, ref_mode):
    """precision="highest" uses per-operand precision on the hot GEMMs
    (the 0/1 one-hot / segment operand needs only one bf16 limb; see
    ops/plm.py _PrecTriple) — 3 MXU passes instead of 6, measured
    1.76x parity-mode throughput on TPU v5e. This pins its numerical
    contract against the full 6-pass "highest_unstructured" reference:
    identical loss (bitwise on TPU; the omitted limb passes are exactly
    zero), gradients within a few f32 ulps (pass accumulation order).
    On the CPU backend both modes lower to native f32 dots, so the
    assertion is trivially tight there; the TPU verify recipe runs the
    same comparison on hardware."""
    from evcouplings_tpu.ops.plm import PlmConfig, make_plm_value_and_grad

    L, q, N = 12, 7, 64
    rng = np.random.default_rng(11)
    codes = jnp.asarray(
        rng.integers(0, q, size=(N, L)), dtype=jnp.int8)
    weights = jnp.ones((N,), jnp.float32)
    A = 0.1 * rng.normal(size=(L * q, L * q)).astype(np.float32)
    params = {
        "J": jnp.asarray(0.5 * (A + A.T)),
        "h": jnp.asarray(
            0.1 * rng.normal(size=(L, q)).astype(np.float32)),
    }

    outs = {}
    for m in (mode, ref_mode):
        cfg = PlmConfig(block_size=16, dtype="float32", precision=m,
                        lambda_h=0.01, lambda_J=0.5)
        vg = make_plm_value_and_grad(L, q, cfg, symmetric_params=True)
        v, g = vg(params, codes, weights)
        outs[m] = (float(v), np.asarray(g["J"]), np.asarray(g["h"]))

    v_s, gJ_s, gh_s = outs[mode]
    v_u, gJ_u, gh_u = outs[ref_mode]
    assert v_s == v_u
    np.testing.assert_allclose(gJ_s, gJ_u, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gh_s, gh_u, rtol=1e-5, atol=1e-5)


def test_loss_builder_rejects_unpadded_rows():
    """The public loss/grad builders scan n_pad // block_size blocks;
    a row count that is not a block multiple must raise instead of
    silently dropping the remainder (with N < block_size the 'loss'
    would be just the regularizer)."""
    from evcouplings_tpu.ops.plm import (
        PlmConfig, make_plm_loss, make_plm_value_and_grad,
    )

    L, q, N = 6, 4, 300          # 300 not a multiple of 512
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, q, size=(N, L)), dtype=jnp.int8)
    weights = jnp.ones((N,), jnp.float32)
    params = {
        "J": jnp.zeros((L * q, L * q), jnp.float32),
        "h": jnp.zeros((L, q), jnp.float32),
    }
    with pytest.raises(ValueError, match="multiple of block_size"):
        make_plm_loss(L, q, PlmConfig())(params, codes, weights)
    with pytest.raises(ValueError, match="multiple of block_size"):
        make_plm_value_and_grad(L, q, PlmConfig())(
            params, codes, weights)


def test_adam_final_loss_matches_returned_parameters():
    """Adam chunks log fx at the pre-update iterate; final_loss must
    still be pinned to the RETURNED parameters (one extra eval)."""
    from evcouplings_tpu.ops.plm import (
        PlmConfig, fit_plm, make_plm_loss,
    )
    from evcouplings_tpu.ops.encode import flatten_J, pad_rows

    L, q, N = 6, 4, 24
    rng = np.random.default_rng(5)
    codes = rng.integers(0, q, size=(N, L)).astype(np.int8)
    weights = np.ones(N)
    cfg = PlmConfig(solver="adam", max_iter=7, block_size=8,
                    dtype="float64", conv_tol=0.0, steps_per_call=3)
    fit = fit_plm(codes, weights, q, cfg)

    params = {
        "J": flatten_J(fit.J_ij).astype(jnp.float64),
        "h": jnp.asarray(fit.h_i),
    }
    cp, _ = pad_rows(codes, 8)
    wp, _ = pad_rows(weights, 8)
    loss = make_plm_loss(L, q, cfg)
    expected = float(loss(params, jnp.asarray(cp), jnp.asarray(wp)))
    assert fit.final_loss == pytest.approx(expected, rel=1e-9)


@pytest.mark.parametrize("solver", ["adam", "lbfgs"])
def test_iteration_table_norms_are_per_step(solver):
    """hnorm/Jnorm must be the norms of each row's OWN iterate, not a
    chunk-end value stamped across steps_per_call rows (plmc prints
    ||h|| and ||J|| per iteration)."""
    from evcouplings_tpu.ops.plm import PlmConfig, fit_plm

    L, q, N = 6, 4, 24
    rng = np.random.default_rng(7)
    codes = rng.integers(0, q, size=(N, L)).astype(np.int8)
    weights = np.ones(N)
    cfg = PlmConfig(solver=solver, max_iter=8, block_size=8,
                    dtype="float64", conv_tol=0.0, steps_per_call=4)
    fit = fit_plm(codes, weights, q, cfg)
    table = fit.iteration_table
    assert len(table) == 8
    # within one chunk the iterate moves every step, so must the norms
    chunk = [r["Jnorm"] for r in table[:4]]
    assert len(set(chunk)) == 4
    # the last row's norms match the returned parameters
    assert table[-1]["hnorm"] == pytest.approx(
        float(np.linalg.norm(fit.h_i)), rel=1e-5)
