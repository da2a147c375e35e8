"""Site-sharded asymmetric pseudolikelihood fit (ops/plm_sites.py):
correctness vs the symmetric fit, and 2D (data x model) mesh parity
vs single-device."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from evcouplings_tpu.ops.plm import PlmConfig, fit_plm
from evcouplings_tpu.ops.plm_sites import fit_plm_asym

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



def make_coupled_msa(N=600, L=8, q=4):
    codes = RNG.integers(0, q, size=(N, L))
    codes[:, 5] = (codes[:, 2] + 1) % q
    return codes.astype(np.int8)


def mesh2d(n_data, n_model):
    devs = np.asarray(jax.devices()[:n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(devs, ("data", "model"))


class TestSingleDevice:
    def test_recovers_planted_coupling(self):
        codes = make_coupled_msa()
        cfg = PlmConfig(solver="adam", max_iter=300, block_size=64,
                        lambda_J=0.05, lambda_h=0.01, adam_lr=5e-3)
        res = fit_plm_asym(codes, np.ones(len(codes)), 4, cfg)
        from evcouplings_tpu.ops.scores import cn_scores

        cn = cn_scores(res.J_ij)
        ii, jj = np.triu_indices(8, k=1)
        assert (ii[np.argmax(cn[ii, jj])],
                jj[np.argmax(cn[ii, jj])]) == (2, 5)

    def test_close_to_symmetric_fit(self):
        """Asymmetric + post-hoc symmetrization approximates the
        symmetric optimum: same EC ranking on a planted-structure
        alignment, couplings strongly correlated."""
        codes = make_coupled_msa(N=800)
        w = np.ones(len(codes))
        cfg_a = PlmConfig(solver="adam", max_iter=400, block_size=64,
                          lambda_J=0.05, adam_lr=5e-3)
        cfg_s = PlmConfig(solver="lbfgs", max_iter=200, block_size=64,
                          lambda_J=0.05)
        res_a = fit_plm_asym(codes, w, 4, cfg_a)
        res_s = fit_plm(codes, w, 4, cfg_s)
        from evcouplings_tpu.ops.scores import cn_scores

        cn_a = cn_scores(res_a.J_ij)
        cn_s = cn_scores(res_s.J_ij)
        ii, jj = np.triu_indices(8, k=1)
        # identical top pair, high rank correlation overall
        assert np.argmax(cn_a[ii, jj]) == np.argmax(cn_s[ii, jj])
        r = np.corrcoef(cn_a[ii, jj], cn_s[ii, jj])[0, 1]
        assert r > 0.9

    def test_invalid_solver_rejected(self):
        with pytest.raises(ValueError, match="solver"):
            fit_plm_asym(make_coupled_msa(N=16), np.ones(16), 4,
                         PlmConfig(solver="sgd"))

    def test_unsupported_dtype_rejected(self):
        """float64 must be refused loudly, not silently demoted to
        f32 (this path's masters/accumulators are f32 throughout)."""
        with pytest.raises(ValueError, match="float64"):
            fit_plm_asym(make_coupled_msa(N=16), np.ones(16), 4,
                         PlmConfig(solver="adam", dtype="float64"))

    def test_iteration_table_and_convergence(self):
        codes = make_coupled_msa(N=200)
        recs = []
        cfg = PlmConfig(solver="adam", max_iter=50, block_size=64,
                        steps_per_call=10, conv_tol=0.0,
                        lambda_J=0.1)
        res = fit_plm_asym(codes, np.ones(200), 4, cfg,
                           callback=recs.append)
        assert len(recs) == 50
        assert recs[-1]["fx"] < recs[0]["fx"]
        # plmc invariants on the output
        np.testing.assert_allclose(
            res.J_ij, res.J_ij.transpose(1, 0, 3, 2), atol=1e-12)
        assert np.all(res.J_ij[np.arange(8), np.arange(8)] == 0)


class TestPerSiteLBFGS:
    """solver='lbfgs': batched per-site LBFGS — each site its own
    history/linesearch/convergence, no cross-model collectives."""

    def test_recovers_planted_coupling_in_few_iterations(self):
        from evcouplings_tpu.ops.scores import cn_scores

        codes = make_coupled_msa(N=300)
        cfg = PlmConfig(solver="lbfgs", max_iter=100, block_size=64,
                        steps_per_call=5, lambda_J=0.5)
        res = fit_plm_asym(codes, np.ones(300), 4, cfg)
        # second-order convergence: stops (per-site criteria or
        # rounding guard) well before the iteration cap
        assert res.num_iter < 100
        assert res.converged or res.ls_failed
        cn = cn_scores(res.J_ij)
        iu = np.triu_indices(8, k=1)
        k = np.argmax(cn[iu])
        assert (iu[0][k], iu[1][k]) == (2, 5)

    def test_matches_adam_solution(self):
        from evcouplings_tpu.ops.scores import cn_scores

        codes = make_coupled_msa(N=300)
        res_l = fit_plm_asym(
            codes, np.ones(300), 4,
            PlmConfig(solver="lbfgs", max_iter=100, block_size=64,
                      steps_per_call=5, lambda_J=0.5))
        res_a = fit_plm_asym(
            codes, np.ones(300), 4,
            PlmConfig(solver="adam", max_iter=500, block_size=64,
                      steps_per_call=25, lambda_J=0.5))
        iu = np.triu_indices(8, k=1)
        cn_l = cn_scores(res_l.J_ij)[iu]
        cn_a = cn_scores(res_a.J_ij)[iu]
        # same contact ranking (raw J is NOT compared: 500 Adam
        # iterations are still far from the optimum in the strongly
        # coupled directions that LBFGS resolves — that gap is the
        # point of the second-order solver)
        assert np.corrcoef(cn_l, cn_a)[0, 1] > 0.95
        assert np.argmax(cn_l) == np.argmax(cn_a)

    @pytest.mark.parametrize("n_data,n_model", [(2, 4), (1, 4), (4, 2)])
    def test_mesh_matches_single_device(self, n_data, n_model):
        """Fixed iteration count: the sharded trajectory matches the
        single-device one to float rounding (site padding exercised:
        L=8 over 4 shards needs none, L=6 over 4 does)."""
        L = 6
        codes = RNG.integers(0, 3, size=(128, L)).astype(np.int8)
        w = RNG.uniform(0.5, 1.0, size=128)
        cfg = PlmConfig(solver="lbfgs", max_iter=12, block_size=16,
                        steps_per_call=4, conv_tol=0.0, lambda_J=0.1)
        res1 = fit_plm_asym(codes, w, 3, cfg)
        resM = fit_plm_asym(codes, w, 3, cfg,
                            mesh=mesh2d(n_data, n_model))
        np.testing.assert_allclose(
            resM.J_ij, res1.J_ij, rtol=1e-4, atol=1e-5)
        f1 = [r["fx"] for r in res1.iteration_table]
        fM = [r["fx"] for r in resM.iteration_table]
        np.testing.assert_allclose(fM, f1, rtol=1e-5)

    def test_resume_is_bitwise_identical(self, tmp_path):
        """Interrupt at iteration 8 of 16, resume from the checkpoint:
        the final couplings and history must equal the uninterrupted
        fit exactly (full carried evaluation is serialized)."""
        codes = make_coupled_msa(N=128)
        w = np.ones(128)
        cfg = PlmConfig(solver="lbfgs", max_iter=16, block_size=32,
                        steps_per_call=4, conv_tol=0.0, lambda_J=0.5)

        res_full = fit_plm_asym(codes, w, 4, cfg)

        ck = str(tmp_path / "asym_lbfgs.npz")
        fit_plm_asym(codes, w, 4,
                     PlmConfig(**{**cfg.__dict__, "max_iter": 8}),
                     checkpoint_file=ck, checkpoint_every=4)
        res_resumed = fit_plm_asym(codes, w, 4, cfg,
                                   checkpoint_file=ck,
                                   checkpoint_every=100)
        np.testing.assert_array_equal(res_resumed.J_ij, res_full.J_ij)
        np.testing.assert_array_equal(res_resumed.h_i, res_full.h_i)

    def test_adam_checkpoint_rejected_for_lbfgs(self, tmp_path):
        codes = make_coupled_msa(N=64)
        ck = str(tmp_path / "adam.npz")
        fit_plm_asym(codes, np.ones(64), 4,
                     PlmConfig(solver="adam", max_iter=4,
                               block_size=32),
                     checkpoint_file=ck, checkpoint_every=2)
        # the config fingerprint rejects the cross-solver resume (the
        # solver shapes the trajectory, so it is part of the identity);
        # the solver-specific state checks remain for legacy
        # fingerprint-less checkpoints
        with pytest.raises(ValueError, match="DIFFERENT fit"):
            fit_plm_asym(codes, np.ones(64), 4,
                         PlmConfig(solver="lbfgs", max_iter=4,
                                   block_size=32),
                         checkpoint_file=ck)

    def test_two_phase_layout_rejected(self):
        with pytest.raises(ValueError, match="two_phase"):
            fit_plm_asym(make_coupled_msa(N=16), np.ones(16), 4,
                         PlmConfig(solver="lbfgs",
                                   grad_layout="two_phase"))

    def test_group_penalty_supported(self):
        """The separable group-l1 term rides per site; heavier
        penalty shrinks off-target couplings."""
        codes = make_coupled_msa(N=200)
        res0 = fit_plm_asym(
            codes, np.ones(200), 4,
            PlmConfig(solver="lbfgs", max_iter=40, block_size=64,
                      steps_per_call=5, lambda_J=0.1))
        res1 = fit_plm_asym(
            codes, np.ones(200), 4,
            PlmConfig(solver="lbfgs", max_iter=40, block_size=64,
                      steps_per_call=5, lambda_J=0.1,
                      lambda_group=8.0, group_mode="smoothed"))
        assert (np.linalg.norm(res1.J_ij)
                < 0.9 * np.linalg.norm(res0.J_ij))


class TestGroupPenalty:
    def test_matches_autodiff_oracle(self):
        """lambda_group in the asymmetric fit must equal the autodiff
        value+gradient of the explicit objective (nll + l2 + smoothed
        group-L1 over directed q x q blocks), checked on the first
        recorded iteration (fx and gnorm at the zero start)."""
        import jax
        import jax.numpy as jnp

        L, q, N = 5, 3, 64
        codes = RNG.integers(0, q, size=(N, L)).astype(np.int8)
        w = RNG.uniform(0.5, 1.0, size=N).astype(np.float64)
        lam_h, lam_J, lam_g = 0.01, 0.1, 0.3

        def oracle_value_grad(J, h):
            Jj, hj = jnp.asarray(J, jnp.float32), jnp.asarray(
                h, jnp.float32)
            mask = (
                (jnp.arange(L * q)[:, None] // q)
                != (jnp.arange(L * q)[None, :] // q)
            ).astype(jnp.float32)

            def loss(J, h):
                oh = jax.nn.one_hot(jnp.asarray(codes), q).reshape(
                    N, L * q)
                logits = (oh @ (J * mask).T
                          + h.reshape(L * q)).reshape(N, L, q)
                logp = jax.nn.log_softmax(logits, axis=-1)
                oh_t = jax.nn.one_hot(jnp.asarray(codes), q)
                nll = -jnp.sum(
                    jnp.asarray(w, jnp.float32)[:, None]
                    * jnp.sum(oh_t * logp, axis=-1))
                blocks = J.reshape(L, q, L, q)
                norms = jnp.sqrt(
                    jnp.sum(blocks ** 2, axis=(1, 3)) + 1e-12)
                return (nll + lam_J * jnp.sum(J ** 2)
                        + lam_h * jnp.sum(h ** 2)
                        + lam_g * 0.5 * jnp.sum(norms))

            v, g = jax.value_and_grad(loss, argnums=(0, 1))(Jj, hj)
            return float(v), g

        cfg = PlmConfig(
            solver="adam", max_iter=2, block_size=32, conv_tol=0.0,
            lambda_h=lam_h, lambda_J=lam_J, lambda_group=lam_g,
            # this oracle IS the smoothed objective; the asymmetric
            # path requires the explicit opt-in since round 3
            group_mode="smoothed",
        )
        recs = []
        fit_plm_asym(codes, w, q, cfg, callback=recs.append)

        # iteration 1: params are zeros
        v0, (gJ0, gh0) = oracle_value_grad(
            np.zeros((L * q, L * q)), np.zeros((L, q)))
        # the oracle's group gradient lives on masked entries only
        # (the fit's diag blocks are structurally zero and masked)
        mask = ((np.arange(L * q)[:, None] // q)
                != (np.arange(L * q)[None, :] // q))
        gnorm0 = float(np.sqrt(
            np.sum((np.asarray(gJ0) * mask) ** 2)
            + np.sum(np.asarray(gh0) ** 2)))
        assert recs[0]["fx"] == pytest.approx(v0, rel=1e-4)
        assert recs[0]["gnorm"] == pytest.approx(gnorm0, rel=1e-3)

    def test_group_penalty_shrinks_couplings(self):
        codes = make_coupled_msa(N=300)
        base = dict(solver="adam", max_iter=150, block_size=64,
                    conv_tol=0.0, lambda_J=0.01)
        res0 = fit_plm_asym(codes, np.ones(300), 4,
                            PlmConfig(lambda_group=0.0, **base))
        res1 = fit_plm_asym(codes, np.ones(300), 4,
                            PlmConfig(lambda_group=20.0,
                                      group_mode="smoothed", **base))
        assert (np.abs(res1.J_ij).sum()
                < 0.5 * np.abs(res0.J_ij).sum())


class TestGradLayouts:
    @pytest.mark.parametrize("use_mesh", [False, True])
    def test_two_phase_matches_carried(self, use_mesh):
        """The one-GEMM residual layout must agree with the carried
        accumulator layout (f32: identical summation results up to
        GEMM accumulation order)."""
        codes = make_coupled_msa(N=128)
        w = RNG.uniform(0.5, 1.0, size=128)
        mesh = mesh2d(2, 4) if use_mesh else None
        base = dict(solver="adam", max_iter=15, block_size=16,
                    conv_tol=0.0, lambda_J=0.1)
        res_c = fit_plm_asym(
            codes, w, 4, PlmConfig(grad_layout="carried", **base),
            mesh=mesh)
        res_t = fit_plm_asym(
            codes, w, 4, PlmConfig(grad_layout="two_phase", **base),
            mesh=mesh)
        np.testing.assert_allclose(
            res_t.J_ij, res_c.J_ij, rtol=1e-4, atol=1e-5)
        f_c = [r["fx"] for r in res_c.iteration_table]
        f_t = [r["fx"] for r in res_t.iteration_table]
        np.testing.assert_allclose(f_t, f_c, rtol=1e-5)


class TestCheckpointResume:
    @pytest.mark.parametrize("use_mesh", [False, True])
    def test_resume_is_bitwise_identical(self, tmp_path, use_mesh):
        codes = make_coupled_msa(N=96)
        w = np.ones(96)
        mesh = mesh2d(2, 4) if use_mesh else None
        cfg20 = PlmConfig(solver="adam", max_iter=20, block_size=16,
                          conv_tol=0.0, lambda_J=0.1)
        cfg10 = PlmConfig(solver="adam", max_iter=10, block_size=16,
                          conv_tol=0.0, lambda_J=0.1)
        ref = fit_plm_asym(codes, w, 4, cfg20, mesh=mesh)
        ckpt = str(tmp_path / "asym.ckpt.npz")
        fit_plm_asym(codes, w, 4, cfg10, mesh=mesh,
                     checkpoint_file=ckpt, checkpoint_every=5)
        resumed = fit_plm_asym(codes, w, 4, cfg20, mesh=mesh,
                               checkpoint_file=ckpt,
                               checkpoint_every=5)
        assert resumed.iteration_table[0]["iter"] == 11
        np.testing.assert_array_equal(resumed.J_ij, ref.J_ij)
        np.testing.assert_array_equal(resumed.h_i, ref.h_i)

    @pytest.mark.parametrize("solver", ["adam", "lbfgs"])
    def test_resume_at_max_iter_reports_real_loss(self, tmp_path,
                                                  solver):
        """Re-running an asym fit whose checkpoint already sits at
        max_iter must return the checkpointed parameters with a real
        objective value (not final_loss=NaN from a never-entered
        loop) and no extra iteration rows."""
        codes = make_coupled_msa(N=48)
        w = np.ones(48)
        cfg = PlmConfig(solver=solver, max_iter=6, block_size=16,
                        conv_tol=0.0, lambda_J=0.1)

        ckpt = str(tmp_path / "asym.ckpt.npz")
        first = fit_plm_asym(codes, w, 4, cfg, checkpoint_file=ckpt,
                             checkpoint_every=3)
        rerun = fit_plm_asym(codes, w, 4, cfg, checkpoint_file=ckpt,
                             checkpoint_every=3)

        assert len(rerun.iteration_table) == 0
        assert rerun.num_iter == first.num_iter
        assert np.isfinite(rerun.final_loss)
        np.testing.assert_allclose(
            rerun.final_loss, first.final_loss, rtol=1e-4
        )
        np.testing.assert_array_equal(rerun.J_ij, first.J_ij)

    def test_adam_final_loss_matches_returned_parameters(self):
        """The adam chunks record fx at the pre-update iterate;
        final_loss must nevertheless price the RETURNED parameters
        (strictly below the last recorded pre-update fx on a
        descending fit)."""
        codes = make_coupled_msa(N=96)
        w = np.ones(96)
        cfg = PlmConfig(solver="adam", max_iter=12, block_size=16,
                        steps_per_call=4, conv_tol=0.0, lambda_J=0.1)
        res = fit_plm_asym(codes, w, 4, cfg)
        assert np.isfinite(res.final_loss)
        assert res.final_loss < res.iteration_table[-1]["fx"]

    def test_iteration_table_carries_norm_columns(self):
        """Both solvers' rows carry the plmc table's ||h|| / ||J||
        columns, like the symmetric fit (schema-consistent CSVs under
        auto-routing)."""
        codes = make_coupled_msa(N=48)
        w = np.ones(48)
        for solver in ("adam", "lbfgs"):
            res = fit_plm_asym(
                codes, w, 4,
                PlmConfig(solver=solver, max_iter=4, block_size=16,
                          conv_tol=0.0, lambda_J=0.1),
            )
            row = res.iteration_table[-1]
            assert row["Jnorm"] > 0
            assert row["hnorm"] >= 0
            assert np.isfinite(row["hnorm"])

    def test_symmetric_checkpoint_rejected_clearly(self, tmp_path):
        """A checkpoint written by the symmetric fitter must be
        rejected with a clear message, not a KeyError."""
        codes = make_coupled_msa(N=48)
        w = np.ones(48)
        ckpt = str(tmp_path / "sym.ckpt.npz")
        from evcouplings_tpu.ops.plm import fit_plm

        fit_plm(codes, w, 4,
                PlmConfig(solver="adam", max_iter=3, block_size=16),
                checkpoint_file=ckpt)
        with pytest.raises(ValueError, match="asymmetric"):
            fit_plm_asym(codes, w, 4,
                         PlmConfig(solver="adam", max_iter=5,
                                   block_size=16),
                         checkpoint_file=ckpt)

    def test_mismatched_padding_rejected(self, tmp_path):
        """A checkpoint written at one model-axis size cannot resume
        at another (site padding differs)."""
        codes = make_coupled_msa(N=96)[:, :6].copy()  # L=6
        w = np.ones(96)
        ckpt = str(tmp_path / "asym.ckpt.npz")
        cfg = PlmConfig(solver="adam", max_iter=5, block_size=16,
                        conv_tol=0.0)
        fit_plm_asym(codes, w, 4, cfg, checkpoint_file=ckpt)  # L_pad=6
        with pytest.raises(ValueError, match="model-axis"):
            fit_plm_asym(codes, w, 4, cfg, mesh=mesh2d(2, 4),
                         checkpoint_file=ckpt)  # L_pad=8


class TestMesh:
    @pytest.mark.parametrize("n_data,n_model", [(2, 4), (4, 2), (1, 8)])
    def test_matches_single_device(self, n_data, n_model):
        """2D-sharded fit must match the single-device asymmetric fit
        (site padding exercised: L=6 over 4 model shards)."""
        L = 6
        codes = RNG.integers(0, 3, size=(128, L)).astype(np.int8)
        w = RNG.uniform(0.5, 1.0, size=128)
        cfg = PlmConfig(solver="adam", max_iter=25, block_size=16,
                        steps_per_call=5, conv_tol=0.0, lambda_J=0.1)
        res1 = fit_plm_asym(codes, w, 3, cfg)
        resM = fit_plm_asym(codes, w, 3, cfg,
                            mesh=mesh2d(n_data, n_model))
        np.testing.assert_allclose(
            resM.J_ij, res1.J_ij, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            resM.h_i, res1.h_i, rtol=1e-5, atol=1e-6)
        f1 = [r["fx"] for r in res1.iteration_table]
        fM = [r["fx"] for r in resM.iteration_table]
        np.testing.assert_allclose(fM, f1, rtol=1e-5)

    def test_row_padding_exercised(self):
        """N not divisible by block x n_data: padded rows carry zero
        weight and must not change the result."""
        L = 8
        codes = RNG.integers(0, 3, size=(100, L)).astype(np.int8)
        w = np.ones(100)
        cfg = PlmConfig(solver="adam", max_iter=10, block_size=16,
                        conv_tol=0.0, lambda_J=0.1)
        res1 = fit_plm_asym(codes, w, 3, cfg)
        resM = fit_plm_asym(codes, w, 3, cfg, mesh=mesh2d(2, 4))
        # padding differs (112 vs 128 rows) so f32 summation order
        # differs; agreement is to accumulation noise only
        np.testing.assert_allclose(
            resM.J_ij, res1.J_ij, rtol=1e-3, atol=1e-4)


def test_asym_exact_group_l1_refused_at_ops_level():
    """fit_plm_asym only implements the smoothed group penalty; the
    default group_mode='prox' with lambda_group > 0 must refuse loudly
    (same contract as fit_plm) instead of silently fitting a different
    objective."""
    from evcouplings_tpu.ops.plm import PlmConfig
    from evcouplings_tpu.ops.plm_sites import fit_plm_asym

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(16, 5)).astype(np.int8)
    w = np.ones(16)
    with pytest.raises(ValueError, match="smoothed"):
        fit_plm_asym(codes, w, 4, PlmConfig(
            solver="adam", lambda_group=2.0, block_size=8, max_iter=2))
    # explicit smoothed opt-in runs (and honors cfg.group_eps)
    fit = fit_plm_asym(codes, w, 4, PlmConfig(
        solver="adam", lambda_group=2.0, group_mode="smoothed",
        group_eps=1e-8, block_size=8, max_iter=2, conv_tol=0.0))
    assert np.isfinite(fit.final_loss)
