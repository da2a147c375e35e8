"""Site-sharded asymmetric pseudolikelihood fit — the large-L scaling
path.

The symmetric fit (ops/plm.py, plmc semantics — reference wrapper
couplings/tools.py:126-307) replicates the (Lq, Lq) coupling matrix on
every device: J + gradient + Adam moments is ~16 bytes/entry f32,
which caps single-chip L around ~900 (16 GB HBM) and makes the
symmetrization a global operation.

Pseudolikelihood decomposes into L INDEPENDENT per-site multinomial
regressions coupled only through the shared-parameter symmetrization.
Dropping the in-fit tie — each directed coupling J[r -> j] optimized
independently, symmetrized ONCE after convergence as
0.5 (J + J^T) — is the standard asymmetric pseudolikelihood
(Ekeberg et al., J Comput Phys 2014); the reference pipeline has no
equivalent (plmc is symmetric-only).

On TPU this buys perfect model parallelism: sites shard along a
"model" mesh axis (each device owns the (L_loc*q, Lq) row block of J
plus its optimizer state), MSA rows shard along "data". A step is:
one-hot @ J_loc^T logits, per-site softmax residuals, residual^T @
one-hot gradient — all local — followed by a single psum of the local
gradient over "data" only. NO collective ever crosses the "model"
axis during the fit; ICI traffic is the data-parallel gradient
reduction, identical to the symmetric path's. Scaling in L is
therefore linear in devices for both memory and FLOPs.

Solvers: Adam (elementwise, shard-local, cheapest per step) and
per-site LBFGS (_make_lbfgs_site_chunk). A GLOBAL LBFGS would need
every linesearch dot product psum-merged across "model" — but the
asymmetric objective is L independent regressions, so instead each
site runs its OWN batched LBFGS (own history, own linesearch step
size, own convergence flag); all dot products reduce over the site's
parameter axis only, keeping the step communication-free across
"model" exactly like Adam, with second-order convergence.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from evcouplings_tpu.ops.plm import (
    PlmConfig,
    PlmFitResult,
    _check_ckpt_fingerprint,
    _precision,
    fit_fingerprint,
)
from evcouplings_tpu.ops._jax_compat import (
    pvary as _pvary,
    shard_map,
)
from evcouplings_tpu.ops.plm_update import ADAM_B1, ADAM_B2, ADAM_EPS


def _pad_to(n, multiple):
    return ((n + multiple - 1) // multiple) * multiple


def _site_mask(l_loc, L_pad, q, m_idx, dtype):
    """(l_loc*q, L_pad*q) mask zeroing each local site's own q-block
    (no self-couplings) — the asymmetric analogue of the symmetric
    path's diagonal-block mask."""
    row_site = m_idx * l_loc + jnp.arange(l_loc * q) // q
    col_site = jnp.arange(L_pad * q) // q
    return (row_site[:, None] != col_site[None, :]).astype(dtype)


def _make_block_residual(l_loc, q, block, prec):
    """Shared per-block math of the asymmetric fit: logits GEMM,
    per-site softmax, per-site block NLL, weighted residual.

    Returns block_residual(J_eff, h_c, rows, wb, oh, m_idx) ->
    (nll_b (l_loc,) f32 — this block's NLL contribution per LOCAL
    site, weighted residual (block, l_loc, q) f32)."""
    f32 = jnp.float32

    def block_residual(J_eff, h_c, rows, wb, oh, m_idx):
        logits = (
            jnp.dot(oh, J_eff.T, precision=prec.exact_lhs)
            + h_c.reshape(l_loc * q)
        ).reshape(block, l_loc, q)
        logz = jax.nn.logsumexp(
            logits.astype(f32), axis=-1, keepdims=True)
        # local slice of this row's one-hot = the target labels
        tgt = lax.dynamic_slice_in_dim(
            rows, m_idx * l_loc, l_loc, axis=1)      # (block, l_loc)
        valid = (tgt >= 0).astype(f32)
        oh_t = jax.nn.one_hot(tgt, q, dtype=f32)
        logp = logits.astype(f32) - logz
        nll_b = -jnp.sum(
            wb[:, None] * valid * jnp.sum(oh_t * logp, axis=-1),
            axis=0)
        r = (jnp.exp(logp) - oh_t) * (
            wb[:, None] * valid)[..., None]
        return nll_b, r

    return block_residual


def _make_local_step(L, L_pad, l_loc, q, cfg, manual_axes=(),
                     two_phase=False):
    """Per-device chunk: steps_per_call Adam steps on the local site
    shard. Runs identically single-device (manual_axes == ()); under
    shard_map the freshly-created scan carries must be marked varying
    over the mesh axes (lax.pvary) for the vma type system.

    two_phase mirrors the symmetric path's grad layout
    (ops/plm.py PlmConfig.grad_layout): phase 1 streams blocks through
    the logits GEMM writing bf16 residuals as scan outputs, phase 2
    computes dJ as ONE K = N_local GEMM residual^T @ one-hot against a
    precomputed one-hot — removing the per-block f32 accumulator round
    trips that cost the carried layout ~40% on v5e."""
    dtype = jnp.dtype(cfg.dtype)
    f32 = jnp.float32
    prec = _precision(cfg.precision)
    lq_pad = L_pad * q
    block = cfg.block_size
    steps = max(1, int(cfg.steps_per_call))

    _block_residual = _make_block_residual(l_loc, q, block, prec)

    def local_vg(J_loc, h_loc, codes, w, m_idx, oh_all):
        """Closed-form loss + gradient for the local site block.

        codes: (N_loc, L_pad) int8 local row shard; w: (N_loc,);
        oh_all: precomputed (N_loc, lq_pad) one-hot (two_phase) or
        None (carried — one-hot built per block on the fly).
        Returns (nll, dJ (l_loc*q, lq_pad) f32, dh (l_loc, q) f32) —
        the caller psums over "data"."""
        mask = _site_mask(l_loc, L_pad, q, m_idx, dtype)
        J_eff = (J_loc.astype(dtype) * mask)
        h_c = h_loc.astype(dtype)

        n_loc = codes.shape[0]
        n_blocks = max(1, n_loc // block)

        if two_phase:
            def body(nll_acc, blk):
                rows = lax.dynamic_slice_in_dim(
                    codes, blk * block, block)
                wb = lax.dynamic_slice_in_dim(w, blk * block, block)
                oh = lax.dynamic_slice_in_dim(
                    oh_all, blk * block, block)
                nll_b, r = _block_residual(
                    J_eff, h_c, rows, wb, oh, m_idx)
                return nll_acc + jnp.sum(nll_b), \
                    r.reshape(block, l_loc * q).astype(dtype)

            init = jnp.zeros((), f32)
            if manual_axes:
                init = _pvary(init, manual_axes)
            nll, r_blocks = lax.scan(
                body, init, jnp.arange(n_blocks))
            r_all = r_blocks.reshape(n_loc, l_loc * q)
            dJ = lax.dot_general(
                r_all, oh_all, (((0,), (0,)), ((), ())),
                precision=prec.exact_rhs, preferred_element_type=f32,
            )
            dh = jnp.sum(
                r_all.astype(f32), axis=0).reshape(l_loc, q)
        else:
            def body(carry, blk):
                nll_acc, dJ_acc, dh_acc = carry
                rows = lax.dynamic_slice_in_dim(
                    codes, blk * block, block)
                wb = lax.dynamic_slice_in_dim(w, blk * block, block)
                oh = jax.nn.one_hot(rows, q, dtype=dtype).reshape(
                    block, lq_pad)                  # code -1 -> zero row
                nll_b, r = _block_residual(
                    J_eff, h_c, rows, wb, oh, m_idx)
                nll_b = jnp.sum(nll_b)
                r2 = r.reshape(block, l_loc * q).astype(dtype)
                # f32 GEMM output: without preferred_element_type the
                # bf16 block contribution would be rounded to bf16
                # BEFORE entering the f32 accumulator
                dJ_b = jnp.dot(r2.T, oh, precision=prec.exact_rhs,
                               preferred_element_type=f32)
                dh_b = jnp.sum(r, axis=0)
                return (nll_acc + nll_b, dJ_acc + dJ_b,
                        dh_acc + dh_b), None

            init = (jnp.zeros((), f32),
                    jnp.zeros((l_loc * q, lq_pad), f32),
                    jnp.zeros((l_loc, q), f32))
            if manual_axes:
                init = jax.tree.map(
                    lambda a: _pvary(a, manual_axes), init)
            (nll, dJ, dh), _ = lax.scan(
                body, init, jnp.arange(n_blocks))
        # self-block gradient is excluded from the model by the mask
        dJ = dJ * _site_mask(l_loc, L_pad, q, m_idx, f32)
        return nll, dJ, dh

    def step_chunk_local(J_loc, h_loc, state, codes, w, m_idx,
                         has_data_axis, oh_all=None):
        """steps_per_call Adam iterations; carries loss/gnorm metrics
        per step (same record the symmetric fit emits)."""

        def one(carry, _):
            J_loc, h_loc, mu_J, nu_J, mu_h, nu_h, cnt = carry
            nll, dJ, dh = local_vg(
                J_loc, h_loc, codes, w, m_idx, oh_all)
            if has_data_axis:
                nll = lax.psum(nll, "data")
                dJ = lax.psum(dJ, "data")
                dh = lax.psum(dh, "data")
            # l2 regularization per DIRECTED coupling (asymmetric
            # convention: each direction carries the full lambda_J;
            # the post-fit average then matches the symmetric
            # regularizer's scale)
            dJ = dJ + 2.0 * cfg.lambda_J * J_loc
            dh = dh + 2.0 * cfg.lambda_h * h_loc
            reg = (cfg.lambda_J * jnp.sum(J_loc ** 2)
                   + cfg.lambda_h * jnp.sum(h_loc ** 2))
            if cfg.lambda_group > 0:
                # smoothed group-L1 over the local directed (r, j)
                # q x q blocks — same 0.5 factor and epsilon as the
                # symmetric path (ops/plm.py), which counts each
                # unordered pair once via the double-counted full sum
                blocks = J_loc.reshape(l_loc, q, L_pad, q)
                norms = jnp.sqrt(
                    jnp.sum(blocks ** 2, axis=(1, 3)) + cfg.group_eps)
                reg = reg + cfg.lambda_group * 0.5 * jnp.sum(norms)
                dJ = dJ + (
                    cfg.lambda_group * 0.5
                    * blocks / norms[:, None, :, None]
                ).reshape(l_loc * q, lq_pad)
            value = nll + reg
            gsq = jnp.sum(dJ ** 2) + jnp.sum(dh ** 2)
            xsq = jnp.sum(J_loc ** 2) + jnp.sum(h_loc ** 2)
            if has_data_axis:
                # nll/reg cover the LOCAL sites only (rows were
                # already psum-merged over "data"): sum shards
                gsq = lax.psum(gsq, "model")
                xsq = lax.psum(xsq, "model")
                value = lax.psum(value, "model")

            cnt = cnt + 1
            cf = cnt.astype(f32)
            bc1i = 1.0 / (1.0 - ADAM_B1 ** cf)
            bc2i = 1.0 / (1.0 - ADAM_B2 ** cf)

            def adam(p, g, mu, nu):
                mu = ADAM_B1 * mu + (1.0 - ADAM_B1) * g
                nu = ADAM_B2 * nu + (1.0 - ADAM_B2) * g * g
                p = p - cfg.adam_lr * (mu * bc1i) / (
                    jnp.sqrt(nu * bc2i) + ADAM_EPS)
                return p, mu, nu

            J_loc, mu_J, nu_J = adam(J_loc, dJ, mu_J, nu_J)
            h_loc, mu_h, nu_h = adam(h_loc, dh, mu_h, nu_h)
            # post-update field/coupling norms: the plmc iteration
            # table's ||h|| / ||J|| columns (same trailing pair the
            # symmetric fit emits)
            hsq2 = jnp.sum(h_loc ** 2)
            Jsq2 = jnp.sum(J_loc ** 2)
            if has_data_axis:
                hsq2 = lax.psum(hsq2, "model")
                Jsq2 = lax.psum(Jsq2, "model")
            rec = jnp.stack([
                value, jnp.sqrt(gsq), jnp.sqrt(xsq),
                jnp.sqrt(hsq2), jnp.sqrt(Jsq2),
            ])
            return (J_loc, h_loc, mu_J, nu_J, mu_h, nu_h, cnt), rec

        carry = (J_loc, h_loc) + state
        carry, metrics = lax.scan(one, carry, None, length=steps)
        return carry[0], carry[1], carry[2:], metrics

    return step_chunk_local


def _make_local_vg_site(L, L_pad, l_loc, q, cfg, manual_axes=()):
    """Per-site objective + gradient for the local site shard, with
    the separable per-site regularizers INCLUDED:

        f_r = nll_r + lambda_J ||J_r||^2 + lambda_h ||h_r||^2
              [+ lambda_group * 0.5 * sum_j ||J_rj||_F]

    Returns local_vg(J_loc, h_loc, codes, w, m_idx) ->
    (f (l_loc,) f32, dJ (l_loc*q, lq_pad) f32, dh (l_loc, q) f32);
    the data term is psum-merged over "data" inside (the regularizer
    must be added exactly once, after the merge)."""
    dtype = jnp.dtype(cfg.dtype)
    f32 = jnp.float32
    prec = _precision(cfg.precision)
    lq_pad = L_pad * q
    block = cfg.block_size
    has_data = "data" in manual_axes
    block_residual = _make_block_residual(l_loc, q, block, prec)

    def local_vg(J_loc, h_loc, codes, w, m_idx):
        mask = _site_mask(l_loc, L_pad, q, m_idx, dtype)
        J_eff = J_loc.astype(dtype) * mask
        h_c = h_loc.astype(dtype)
        n_blocks = max(1, codes.shape[0] // block)

        def body(carry, blk):
            nll_acc, dJ_acc, dh_acc = carry
            rows = lax.dynamic_slice_in_dim(codes, blk * block, block)
            wb = lax.dynamic_slice_in_dim(w, blk * block, block)
            oh = jax.nn.one_hot(rows, q, dtype=dtype).reshape(
                block, lq_pad)
            nll_b, r = block_residual(J_eff, h_c, rows, wb, oh, m_idx)
            r2 = r.reshape(block, l_loc * q).astype(dtype)
            dJ_b = jnp.dot(r2.T, oh, precision=prec.exact_rhs,
                           preferred_element_type=f32)
            dh_b = jnp.sum(r, axis=0)
            return (nll_acc + nll_b, dJ_acc + dJ_b,
                    dh_acc + dh_b), None

        init = (jnp.zeros((l_loc,), f32),
                jnp.zeros((l_loc * q, lq_pad), f32),
                jnp.zeros((l_loc, q), f32))
        if manual_axes:
            init = jax.tree.map(
                lambda a: _pvary(a, manual_axes), init)
        (nll, dJ, dh), _ = lax.scan(body, init, jnp.arange(n_blocks))
        dJ = dJ * _site_mask(l_loc, L_pad, q, m_idx, f32)
        if has_data:
            nll = lax.psum(nll, "data")
            dJ = lax.psum(dJ, "data")
            dh = lax.psum(dh, "data")

        # separable per-site regularizers (same convention as the
        # Adam path: full lambda_J per DIRECTED coupling)
        J_rows = J_loc.reshape(l_loc, q * lq_pad)
        f = (nll
             + cfg.lambda_J * jnp.sum(J_rows ** 2, axis=1)
             + cfg.lambda_h * jnp.sum(h_loc ** 2, axis=1))
        dJ = dJ + 2.0 * cfg.lambda_J * J_loc
        dh = dh + 2.0 * cfg.lambda_h * h_loc
        if cfg.lambda_group > 0:
            blocks = J_loc.reshape(l_loc, q, L_pad, q)
            norms = jnp.sqrt(
                jnp.sum(blocks ** 2, axis=(1, 3)) + cfg.group_eps)
            f = f + cfg.lambda_group * 0.5 * jnp.sum(norms, axis=1)
            dJ = dJ + (
                cfg.lambda_group * 0.5
                * blocks / norms[:, None, :, None]
            ).reshape(l_loc * q, lq_pad)
        return f, dJ, dh

    return local_vg


def _make_local_value_site(L, L_pad, l_loc, q, cfg, manual_axes=()):
    """Value-only variant of _make_local_vg_site (same per-site f
    convention, regularizers included). Used for final-loss pinning,
    where the gradient accumulators of the full kernel would double
    the cost of the evaluation only to be discarded."""
    dtype = jnp.dtype(cfg.dtype)
    f32 = jnp.float32
    prec = _precision(cfg.precision)
    lq_pad = L_pad * q
    block = cfg.block_size
    has_data = "data" in manual_axes
    block_residual = _make_block_residual(l_loc, q, block, prec)

    def local_value(J_loc, h_loc, codes, w, m_idx):
        mask = _site_mask(l_loc, L_pad, q, m_idx, dtype)
        J_eff = J_loc.astype(dtype) * mask
        h_c = h_loc.astype(dtype)
        n_blocks = max(1, codes.shape[0] // block)

        def body(nll_acc, blk):
            rows = lax.dynamic_slice_in_dim(codes, blk * block, block)
            wb = lax.dynamic_slice_in_dim(w, blk * block, block)
            oh = jax.nn.one_hot(rows, q, dtype=dtype).reshape(
                block, lq_pad)
            # the unused residual (and its upstream work) is dead code
            # XLA eliminates; only the nll pass remains
            nll_b, _ = block_residual(J_eff, h_c, rows, wb, oh, m_idx)
            return nll_acc + nll_b, None

        init = jnp.zeros((l_loc,), f32)
        if manual_axes:
            init = _pvary(init, manual_axes)
        nll, _ = lax.scan(body, init, jnp.arange(n_blocks))
        if has_data:
            nll = lax.psum(nll, "data")

        J_rows = J_loc.reshape(l_loc, q * lq_pad)
        f = (nll
             + cfg.lambda_J * jnp.sum(J_rows ** 2, axis=1)
             + cfg.lambda_h * jnp.sum(h_loc ** 2, axis=1))
        if cfg.lambda_group > 0:
            blocks = J_loc.reshape(l_loc, q, L_pad, q)
            norms = jnp.sqrt(
                jnp.sum(blocks ** 2, axis=(1, 3)) + cfg.group_eps)
            f = f + cfg.lambda_group * 0.5 * jnp.sum(norms, axis=1)
        return f

    return local_value


def _make_lbfgs_site_chunk(L, L_pad, l_loc, q, cfg, manual_axes=()):
    """Batched per-site LBFGS for the asymmetric fit.

    The asymmetric pseudolikelihood is L INDEPENDENT per-site convex
    regressions, so LBFGS runs per site with its own history, step
    size, linesearch, and convergence flag — all batched over the
    local site axis, every evaluation one blocked GEMM pass over the
    data shard. No collective crosses the "model" axis; the only
    communication is the per-evaluation data-axis psum the Adam path
    pays too (plus one model-axis psum per STEP for the aggregate
    metrics row). Linesearch semantics per site match the scalar
    engine (ops/lbfgs.py): libLBFGS backtracking strong Wolfe with the
    ulp-resolution guard; unresolved sites freeze with a per-site
    ls_failed flag while the rest keep iterating.

    Memory: two (m, l_loc, D) history arrays with D = q*(L_pad*q + 1)
    — about (2m+2)x the per-shard coupling block, the classic LBFGS
    footprint; shard sites over more devices (model_shards) or lower
    memory_size if HBM is tight.

    Returns chunk(J_loc, h_loc, state, codes, w, m_idx) ->
    (J_loc, h_loc, state, metrics (steps, 7)) with metrics rows
    [value, ||g||, ||x||, n_unfrozen_sites, n_failed_sites, ||h||,
    ||J||] aggregated over all sites (psum over "model").
    """
    from evcouplings_tpu.ops.lbfgs import (
        _C1, _C2, _GROW, _SHRINK, _MAX_LS, _MIN_CURVATURE,
    )

    f32 = jnp.float32
    m = cfg.memory_size
    max_ls = _MAX_LS
    lq_pad = L_pad * q
    d_j = q * lq_pad
    d_site = d_j + q
    steps = max(1, int(cfg.steps_per_call))
    has_model = "model" in manual_axes
    local_vg = _make_local_vg_site(L, L_pad, l_loc, q, cfg,
                                   manual_axes=manual_axes)

    def to_x(J_loc, h_loc):
        return jnp.concatenate([
            J_loc.astype(f32).reshape(l_loc, d_j),
            h_loc.astype(f32).reshape(l_loc, q),
        ], axis=1)

    def from_x(x):
        return (x[:, :d_j].reshape(l_loc * q, lq_pad),
                x[:, d_j:].reshape(l_loc, q))

    def vg_x(x, codes, w, m_idx):
        J_loc, h_loc = from_x(x)
        f, dJ, dh = local_vg(J_loc, h_loc, codes, w, m_idx)
        g = jnp.concatenate([
            dJ.reshape(l_loc, d_j), dh.reshape(l_loc, q)
        ], axis=1)
        return f, g

    def step(x, st, codes, w, m_idx):
        frozen = st["converged"] | st["ls_failed"]
        g = st["grad"]
        f0 = st["value"]

        # batched two-loop over the per-site histories (static
        # chronological indices, like the scalar engine)
        qv = g
        alphas = [None] * m
        for i in range(m - 1, -1, -1):
            a = st["rho"][i] * jnp.sum(st["s_hist"][i] * qv, axis=1)
            alphas[i] = a
            qv = qv - a[:, None] * st["y_hist"][i]
        qv = qv * st["gamma"][:, None]
        for i in range(m):
            b = st["rho"][i] * jnp.sum(st["y_hist"][i] * qv, axis=1)
            qv = qv + (alphas[i] - b)[:, None] * st["s_hist"][i]
        d = -qv

        dphi0 = jnp.sum(g * d, axis=1)
        bad = dphi0 >= 0
        d = jnp.where(bad[:, None], -g, d)
        dphi0 = jnp.where(bad, -jnp.sum(g * g, axis=1), dphi0)
        d = jnp.where(frozen[:, None], 0.0, d)

        dnorm = jnp.sqrt(jnp.sum(d * d, axis=1))
        t0 = jnp.where(
            st["count"] == 0, 1.0 / jnp.maximum(dnorm, 1e-30), 1.0
        ).astype(f32)
        t0 = jnp.where(frozen, 0.0, t0)
        eps_f = jnp.finfo(f32).eps

        # per-site linesearch: one batched evaluation per pass; sites
        # already resolved re-evaluate at their accepted point (same
        # inputs -> bitwise-identical values, so the carry stays
        # consistent) until ALL local sites resolve
        def cond(c):
            done, n = c[5], c[6]
            return jnp.logical_and(~jnp.all(done), n < max_ls)

        def body(c):
            t_next, t, f_t, g_t, ok, done, n = c
            t_eval = jnp.where(done, t, t_next)
            f_e, g_e = vg_x(x + t_eval[:, None] * d, codes, w, m_idx)
            dphi = jnp.sum(g_e * d, axis=1)
            armijo = f_e <= f0 + _C1 * t_eval * dphi0
            too_short = dphi < _C2 * dphi0
            overshoot = dphi > -_C2 * dphi0
            tiny = t_eval * jnp.abs(dphi0) <= eps_f * jnp.abs(f0)
            ok_e = armijo & (~too_short & ~overshoot | tiny)
            fail_e = tiny & ~armijo

            upd = ~done
            t = jnp.where(upd, t_eval, t)
            f_t = jnp.where(upd, f_e, f_t)
            g_t = jnp.where(upd[:, None], g_e, g_t)
            ok = ok | (upd & ok_e)
            done = done | (upd & (ok_e | fail_e))
            t_prop = jnp.where(
                ~armijo | overshoot, t_eval * _SHRINK,
                jnp.where(too_short, t_eval * _GROW, t_eval),
            )
            t_next = jnp.where(done, t, t_prop)
            return t_next, t, f_t, g_t, ok, done, n + 1

        ok0 = jnp.zeros((l_loc,), bool)
        n0 = jnp.zeros((), jnp.int32)
        if has_model:
            # fresh constants become model-varying in the body: ok
            # through the per-site tests, and n through the while trip
            # count (each model shard's linesearch resolves in its own
            # number of passes — the vma system cannot infer that, so
            # declare it, which also makes the nevals psum below sound)
            ok0 = _pvary(ok0, ("model",))
            n0 = _pvary(n0, ("model",))
        carry0 = (t0, t0, f0, g, ok0, frozen, n0)
        _, t, f_t, g_t, ok, _, n_ls = lax.while_loop(
            cond, body, carry0
        )

        # per-site rounding failure / max_ls exhaustion: freeze
        ok = ok & ~frozen
        t = jnp.where(ok, t, 0.0)
        f_t = jnp.where(ok, f_t, f0)
        g_t = jnp.where(ok[:, None], g_t, g)
        new_fail = ~ok & ~frozen

        x_new = x + t[:, None] * d

        s = t[:, None] * d
        y = g_t - g
        sy = jnp.sum(s * y, axis=1)
        accept = ok & (sy > _MIN_CURVATURE)
        # per-site conditional chronological roll
        s_roll = jnp.concatenate([st["s_hist"][1:], s[None]], axis=0)
        y_roll = jnp.concatenate([st["y_hist"][1:], y[None]], axis=0)
        s_hist = jnp.where(accept[None, :, None], s_roll, st["s_hist"])
        y_hist = jnp.where(accept[None, :, None], y_roll, st["y_hist"])
        rho_new = jnp.where(
            accept, 1.0 / jnp.maximum(sy, _MIN_CURVATURE), 0.0
        ).astype(f32)
        rho = jnp.where(
            accept[None, :],
            jnp.concatenate([st["rho"][1:], rho_new[None]], axis=0),
            st["rho"],
        )
        gamma = jnp.where(
            accept, sy / jnp.maximum(jnp.sum(y * y, axis=1), 1e-30),
            st["gamma"],
        ).astype(f32)

        # each model shard's linesearch runs its own number of
        # passes; sum them so nevals is a true total, identical on
        # every shard (the state spec declares it replicated)
        if has_model:
            n_ls = lax.psum(n_ls, "model")
        st_new = dict(
            s_hist=s_hist, y_hist=y_hist, rho=rho, gamma=gamma,
            value=f_t, grad=g_t,
            converged=st["converged"],
            ls_failed=st["ls_failed"] | new_fail,
            count=st["count"] + 1,
            nevals=st["nevals"] + n_ls,
        )
        return x_new, st_new

    def chunk(J_loc, h_loc, st, codes, w, m_idx):
        x0 = to_x(J_loc, h_loc)

        def _fold_convergence(x, st):
            """Mark sites meeting the gradient criterion at (x, st)."""
            gnorm_site = jnp.sqrt(jnp.sum(st["grad"] ** 2, axis=1))
            xnorm_site = jnp.sqrt(jnp.sum(x ** 2, axis=1))
            conv = gnorm_site <= cfg.conv_tol * jnp.maximum(
                1.0, xnorm_site)
            return dict(st, converged=st["converged"] | conv)

        def scan_body(carry, _):
            x, st = carry
            x2, st2 = step(x, st, codes, w, m_idx)
            # fold convergence at the POST-step iterate, so the
            # metrics row of the step that converges already reports
            # n_unfrozen == 0 (no extra pass-through iteration, and a
            # fit converging exactly at max_iter is still reported
            # converged)
            st2 = _fold_convergence(x2, st2)

            val = jnp.sum(st2["value"])
            gsq = jnp.sum(st2["grad"] ** 2)
            xsq = jnp.sum(x2 ** 2)
            # split field/coupling norms for the plmc table's
            # ||h|| / ||J|| columns (trailing pair, like the
            # symmetric fit)
            Jsq = jnp.sum(x2[:, :d_j] ** 2)
            hsq = jnp.sum(x2[:, d_j:] ** 2)
            n_unfrozen = jnp.sum(
                (~(st2["converged"] | st2["ls_failed"])).astype(f32))
            n_failed = jnp.sum(st2["ls_failed"].astype(f32))
            if has_model:
                val = lax.psum(val, "model")
                gsq = lax.psum(gsq, "model")
                xsq = lax.psum(xsq, "model")
                Jsq = lax.psum(Jsq, "model")
                hsq = lax.psum(hsq, "model")
                n_unfrozen = lax.psum(n_unfrozen, "model")
                n_failed = lax.psum(n_failed, "model")
            rec = jnp.stack([
                val, jnp.sqrt(gsq), jnp.sqrt(xsq),
                n_unfrozen, n_failed,
                jnp.sqrt(hsq), jnp.sqrt(Jsq),
            ])
            return (x2, st2), rec

        # convergence already achieved at the incoming iterate (e.g.
        # padding sites, or resume from a converged checkpoint) must
        # freeze those sites before the first step
        st = _fold_convergence(x0, st)
        (x, st), metrics = lax.scan(
            scan_body, (x0, st), None, length=steps)
        J2, h2 = from_x(x)
        return J2, h2, st, metrics

    def init_vg(J_loc, h_loc, codes, w, m_idx):
        """Objective (value, grad) at (J, h) — fills the carried
        evaluation of a fresh state. Shares vg_x with the step loop,
        which the carried-evaluation invariant depends on."""
        return vg_x(to_x(J_loc, h_loc), codes, w, m_idx)

    return chunk, init_vg


def init_lbfgs_site_state(l_loc, d_site, m):
    """Zero-initialized per-site LBFGS state pytree (value/grad filled
    by the first evaluation)."""
    f32 = jnp.float32
    return dict(
        s_hist=jnp.zeros((m, l_loc, d_site), f32),
        y_hist=jnp.zeros((m, l_loc, d_site), f32),
        rho=jnp.zeros((m, l_loc), f32),
        gamma=jnp.ones((l_loc,), f32),
        value=jnp.zeros((l_loc,), f32),
        grad=jnp.zeros((l_loc, d_site), f32),
        converged=jnp.zeros((l_loc,), bool),
        ls_failed=jnp.zeros((l_loc,), bool),
        count=jnp.zeros((), jnp.int32),
        nevals=jnp.zeros((), jnp.int32),
    )


def fit_plm_asym(codes, weights, num_symbols,
                 cfg: PlmConfig = PlmConfig(solver="adam"),
                 mesh=None, callback=None, checkpoint_file=None,
                 checkpoint_every=50):
    """Fit a Potts model by ASYMMETRIC pseudolikelihood maximization,
    site-sharded over the mesh "model" axis and row-sharded over
    "data"; symmetrize once at the end.

    Same inputs/outputs as ops.plm.fit_plm. mesh, if given, must have
    axes ("data", "model"); sites are padded to a multiple of the
    model-axis size, rows to a multiple of the data-axis size
    (padding rows carry zero weight, padding sites never receive
    gradient).

    Solvers: "adam" (elementwise, cheapest per step) or "lbfgs"
    (batched PER-SITE LBFGS, _make_lbfgs_site_chunk — each site runs
    its own history/linesearch/convergence since the asymmetric
    objective is L independent regressions; typically converges in
    far fewer iterations). Neither solver ever communicates across
    the "model" axis during the fit.

    checkpoint_file: every checkpoint_every iterations, the directed
    couplings, fields, full solver state (Adam moments, or the
    per-site LBFGS histories + carried evaluation), and iteration
    count are gathered to the host and written atomically; an
    existing file resumes the fit bitwise (the checkpoint stores the
    site-PADDED arrays, so resuming requires the same mesh model-axis
    size and the same solver).
    """
    if cfg.solver not in ("adam", "lbfgs"):
        raise ValueError(
            "fit_plm_asym supports solver='adam' or 'lbfgs' "
            "(got {!r})".format(cfg.solver))
    if cfg.lambda_group > 0 and cfg.group_mode != "smoothed":
        # same loud-refusal contract as fit_plm (ops/plm.py): this
        # path only implements the SMOOTHED group penalty, and a
        # default-prox caller must not silently get a different
        # objective than requested
        raise ValueError(
            "fit_plm_asym only implements the SMOOTHED group-L1 "
            "approximation; lambda_group > 0 requires an explicit "
            "group_mode='smoothed' here, or the symmetric fit with "
            "solver='fista' for the exact penalty."
        )
    if cfg.dtype not in ("float32", "bfloat16"):
        # masters / Adam state / accumulators are f32 throughout this
        # path; honoring float64 would silently demote — refuse
        # instead (x64 parity runs use the symmetric fitter)
        raise ValueError(
            "fit_plm_asym supports dtype 'float32' or 'bfloat16' "
            "(got {!r}); use the symmetric fit for float64 parity "
            "runs".format(cfg.dtype))
    codes = np.asarray(codes)
    weights = np.asarray(weights, dtype=np.float64)
    N, L = codes.shape
    q = int(num_symbols)

    if mesh is not None:
        n_data = mesh.shape["data"]
        n_model = mesh.shape["model"]
    else:
        n_data = n_model = 1

    L_pad = _pad_to(L, n_model)
    l_loc = L_pad // n_model
    block = min(cfg.block_size, max(8, N))
    cfg = PlmConfig(**{**cfg.__dict__, "block_size": block})
    n_pad = _pad_to(max(N, block * n_data), block * n_data)

    codes_p = np.full((n_pad, L_pad), -1, dtype=np.int8)
    codes_p[:N, :L] = codes
    w_p = np.zeros(n_pad, dtype=np.float32)
    w_p[:N] = weights

    f32 = jnp.float32
    lq_pad = L_pad * q
    J = jnp.zeros((lq_pad, lq_pad), dtype=f32)
    h = jnp.zeros((L_pad, q), dtype=f32)
    # grad layout: the one-GEMM residual layout exists here too
    # (grad_layout="two_phase") but MEASURED NO-WIN for the asymmetric
    # fit on v5e (9.95 vs 9.55 ms/iter at N=16k, L=160, bf16, block
    # 2048; 12.5 at block 8192) — the carried accumulator is already
    # only (l_loc*q, lq_pad) per shard and its round trips overlap
    # with the MXU phases. "auto" therefore resolves to carried, the
    # opposite of the symmetric path's resolution (ops/plm.py).
    # Block/chaining sweep (same shape, carried layout): block 1024 +
    # steps_per_call 60 reaches 7.2 ms/iter (365M seq*site/s) vs 9.97
    # at the old block-2048/spc-10 default — small blocks win here,
    # and deep chaining amortizes the host dispatch; the production
    # default block for this path is 1024 (couplings/fitter.py).
    compute_dtype = jnp.dtype(cfg.dtype)
    if cfg.grad_layout not in ("auto", "carried", "two_phase"):
        raise ValueError(
            "Unknown grad_layout: {}".format(cfg.grad_layout))
    two_phase = cfg.grad_layout == "two_phase"
    if two_phase and cfg.solver == "lbfgs":
        raise ValueError(
            "grad_layout='two_phase' is not supported with "
            "solver='lbfgs' (the per-site engine uses the carried "
            "layout)")

    axes = ("data", "model") if mesh is not None else ()

    # data arrays (common to both solvers)
    if mesh is None:
        codes_d = jnp.asarray(codes_p)
        w_d = jnp.asarray(w_p)
    else:
        codes_d = jax.device_put(
            jnp.asarray(codes_p),
            NamedSharding(mesh, P("data", None)))
        w_d = jax.device_put(
            jnp.asarray(w_p), NamedSharding(mesh, P("data")))

    d_j = q * lq_pad
    d_site = d_j + q
    lbfgs_specs = dict(
        s_hist=P(None, "model", None), y_hist=P(None, "model", None),
        rho=P(None, "model"), gamma=P("model"),
        value=P("model"), grad=P("model", None),
        converged=P("model"), ls_failed=P("model"),
        count=P(), nevals=P(),
    )

    if cfg.solver == "adam":
        zeros_like = lambda a: jnp.zeros_like(a)
        state = (zeros_like(J), zeros_like(J), zeros_like(h),
                 zeros_like(h), jnp.zeros((), jnp.int32))
        init_vg = None

        local = _make_local_step(
            L, L_pad, l_loc, q, cfg, manual_axes=axes,
            two_phase=two_phase,
        )

        if mesh is None:
            @jax.jit
            def chunk(J, h, state, codes_d, w_d, oh_d):
                m_idx = jnp.zeros((), jnp.int32)
                return local(J, h, state, codes_d, w_d, m_idx, False,
                             oh_all=oh_d)
            if two_phase:
                oh_d = jax.jit(
                    lambda c: jax.nn.one_hot(
                        c, q, dtype=compute_dtype
                    ).reshape(c.shape[0], lq_pad)
                )(codes_d)
            else:
                oh_d = None
        else:
            oh_spec = P("data", None) if two_phase else P()

            def shard_fn(J, h, state, codes_d, w_d, oh_d):
                m_idx = lax.axis_index("model")
                J2, h2, state2, metrics = local(
                    J, h, state, codes_d, w_d, m_idx, True,
                    oh_all=oh_d if two_phase else None)
                return J2, h2, state2, metrics

            chunk = jax.jit(shard_map(
                shard_fn, mesh=mesh,
                in_specs=(
                    P("model", None),       # J row-sharded by site
                    P("model", None),       # h sharded by site
                    (P("model", None), P("model", None),
                     P("model", None), P("model", None), P()),
                    P("data", None),        # rows sharded
                    P("data"),
                    oh_spec,
                ),
                out_specs=(
                    P("model", None), P("model", None),
                    (P("model", None), P("model", None),
                     P("model", None), P("model", None), P()),
                    P(),                    # metrics replicated
                ),
            ))
            if two_phase:
                oh_d = jax.jit(
                    lambda c: jax.nn.one_hot(
                        c, q, dtype=compute_dtype
                    ).reshape(c.shape[0], lq_pad),
                    out_shardings=NamedSharding(mesh, P("data", None)),
                )(codes_d)
            else:
                # zero-size placeholder keeps the shard_map arity fixed
                oh_d = jax.device_put(
                    jnp.zeros((0, 0), compute_dtype),
                    NamedSharding(mesh, P()))
            J = jax.device_put(
                J, NamedSharding(mesh, P("model", None)))
            h = jax.device_put(
                h, NamedSharding(mesh, P("model", None)))
            state = jax.device_put(
                state,
                (NamedSharding(mesh, P("model", None)),
                 NamedSharding(mesh, P("model", None)),
                 NamedSharding(mesh, P("model", None)),
                 NamedSharding(mesh, P("model", None)),
                 NamedSharding(mesh, P())),
            )
    else:                                   # per-site LBFGS
        state = init_lbfgs_site_state(L_pad, d_site, cfg.memory_size)
        lb_chunk, lb_init_vg = _make_lbfgs_site_chunk(
            L, L_pad, l_loc, q, cfg, manual_axes=axes)

        oh_d = None
        if mesh is None:
            @jax.jit
            def _chunk1(J, h, state, codes_d, w_d):
                return lb_chunk(J, h, state, codes_d, w_d,
                                jnp.zeros((), jnp.int32))

            @jax.jit
            def init_vg(J, h, codes_d, w_d):
                return lb_init_vg(J, h, codes_d, w_d,
                                  jnp.zeros((), jnp.int32))
        else:
            def _lb_shard(J, h, state, codes_d, w_d):
                m_idx = lax.axis_index("model")
                return lb_chunk(J, h, state, codes_d, w_d, m_idx)

            _chunk1 = jax.jit(shard_map(
                _lb_shard, mesh=mesh,
                in_specs=(P("model", None), P("model", None),
                          lbfgs_specs, P("data", None), P("data")),
                out_specs=(P("model", None), P("model", None),
                           lbfgs_specs, P()),
            ))

            def _init_shard(J, h, codes_d, w_d):
                m_idx = lax.axis_index("model")
                return lb_init_vg(J, h, codes_d, w_d, m_idx)

            init_vg = jax.jit(shard_map(
                _init_shard, mesh=mesh,
                in_specs=(P("model", None), P("model", None),
                          P("data", None), P("data")),
                out_specs=(P("model"), P("model", None)),
            ))
            J = jax.device_put(
                J, NamedSharding(mesh, P("model", None)))
            h = jax.device_put(
                h, NamedSharding(mesh, P("model", None)))
            state = jax.device_put(state, {
                k: NamedSharding(mesh, s)
                for k, s in lbfgs_specs.items()
            })

        def chunk(J, h, state, codes_d, w_d, oh_d):
            del oh_d
            return _chunk1(J, h, state, codes_d, w_d)

    import os

    def _put_model(arr):
        if mesh is None:
            return jnp.asarray(arr)
        return jax.device_put(
            jnp.asarray(arr), NamedSharding(mesh, P("model", None)))

    def _to_host(arr):
        """Materialize an array that may be sharded across processes
        (multi-host model sharding: the local process cannot address
        the other hosts' site shards directly)."""
        if hasattr(arr, "is_fully_addressable") \
                and not arr.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(arr, tiled=True))
        return np.asarray(arr)

    start_iter = 0
    fingerprint = (
        fit_fingerprint(codes, weights, q, cfg)
        if checkpoint_file is not None else None
    )
    needs_init_eval = cfg.solver == "lbfgs"
    have_ckpt = (checkpoint_file is not None
                 and os.path.exists(checkpoint_file))
    if checkpoint_file is not None and jax.process_count() > 1:
        # only process 0 writes checkpoints, but every process makes
        # its own resume decision from the filesystem; divergent
        # decisions desynchronize the collectives (deadlock) — fail
        # loudly instead (same guard as the symmetric fit)
        from jax.experimental import multihost_utils
        views = np.asarray(multihost_utils.process_allgather(
            np.asarray([1.0 if have_ckpt else 0.0])
        ))
        if float(views.min()) != float(views.max()):
            raise ValueError(
                "checkpoint_file {!r} is visible on some processes "
                "but not others: mid-fit checkpointing in "
                "multi-process runs requires a filesystem shared by "
                "all processes".format(checkpoint_file)
            )
    if have_ckpt:
        ckpt = np.load(checkpoint_file)
        _check_ckpt_fingerprint(ckpt, fingerprint, checkpoint_file)
        if ckpt["J"].shape != (lq_pad, lq_pad):
            raise ValueError(
                "Checkpoint {} does not match padded problem shape "
                "(L_pad={}, q={}) — asymmetric resume requires the "
                "same mesh model-axis size".format(
                    checkpoint_file, L_pad, q))
        if cfg.solver == "adam":
            if "mu_J" not in ckpt.files:
                raise ValueError(
                    "Checkpoint {} carries no Adam state — it cannot "
                    "resume an asymmetric adam fit (was it written "
                    "by the lbfgs solver or the symmetric "
                    "fitter?)".format(checkpoint_file))
            J = _put_model(ckpt["J"])
            h = _put_model(ckpt["h"])
            state = (
                _put_model(ckpt["mu_J"]), _put_model(ckpt["nu_J"]),
                _put_model(ckpt["mu_h"]), _put_model(ckpt["nu_h"]),
                jnp.asarray(ckpt["count"]),
            )
            if mesh is not None:
                state = state[:4] + (jax.device_put(
                    state[4], NamedSharding(mesh, P())),)
        else:
            missing = {
                "lbfgs_" + k for k in lbfgs_specs
            } - set(ckpt.files)
            if missing:
                raise ValueError(
                    "Checkpoint {} carries no per-site LBFGS state "
                    "({} missing) — it cannot resume an asymmetric "
                    "lbfgs fit".format(
                        checkpoint_file, sorted(missing)))
            if ckpt["lbfgs_s_hist"].shape != (
                    cfg.memory_size, L_pad, d_site):
                raise ValueError(
                    "Checkpoint {} LBFGS history shape {} does not "
                    "match (m={}, L_pad={}, D={})".format(
                        checkpoint_file, ckpt["lbfgs_s_hist"].shape,
                        cfg.memory_size, L_pad, d_site))
            J = _put_model(ckpt["J"])
            h = _put_model(ckpt["h"])
            state = {
                k: jnp.asarray(ckpt["lbfgs_" + k])
                for k in lbfgs_specs
            }
            if mesh is not None:
                state = jax.device_put(state, {
                    k: NamedSharding(mesh, s)
                    for k, s in lbfgs_specs.items()
                })
            # full carried evaluation restored: bitwise resume, no
            # re-evaluation needed
            needs_init_eval = False
        start_iter = int(ckpt["iteration"])
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            its = np.asarray(multihost_utils.process_allgather(
                np.asarray([float(start_iter)])
            ))
            if float(its.min()) != float(its.max()):
                raise ValueError(
                    "checkpoint {!r} iteration differs across "
                    "processes ({}) — stale per-host copies?".format(
                        checkpoint_file, sorted(set(its.ravel())))
                )

    if needs_init_eval:
        # per-site LBFGS carries (value, grad) of the current iterate
        f0, g0 = init_vg(J, h, codes_d, w_d)
        state = dict(state, value=f0, grad=g0)

    def save_checkpoint(J, h, state, iteration):
        arrays = {
            "J": _to_host(J), "h": _to_host(h),
            "iteration": np.asarray(iteration),
            "fingerprint": np.asarray(fingerprint),
        }
        if cfg.solver == "adam":
            arrays.update(
                mu_J=_to_host(state[0]), nu_J=_to_host(state[1]),
                mu_h=_to_host(state[2]), nu_h=_to_host(state[3]),
                count=np.asarray(state[4]),
            )
        else:
            arrays.update({
                "lbfgs_" + k: _to_host(v) for k, v in state.items()
            })
        # every process participates in the gathers above (they are
        # collectives), but only ONE writes: concurrent truncating
        # writes to the same path on a shared filesystem interleave
        # and corrupt the checkpoint
        if jax.process_index() != 0:
            return
        tmp = checkpoint_file + ".tmp.npz"
        np.savez(tmp, **arrays)
        os.replace(tmp, checkpoint_file)

    def _objective_at(J_cur, h_cur):
        """Total per-site objective at the given parameters (the
        metrics fx convention: sum over all sites, regularizers
        included). Compiled lazily — only the adam final-loss pin and
        the never-ran-loop resume fallbacks need it — and value-only
        (no gradient accumulators)."""
        local_eval = _make_local_value_site(
            L, L_pad, l_loc, q, cfg, manual_axes=axes
        )
        if mesh is None:
            @jax.jit
            def total(J_cur, h_cur, c, w):
                f = local_eval(
                    J_cur, h_cur, c, w, jnp.zeros((), jnp.int32)
                )
                return jnp.sum(f)
        else:
            def _eval_shard(J_cur, h_cur, c, w):
                m_idx = lax.axis_index("model")
                f = local_eval(J_cur, h_cur, c, w, m_idx)
                return lax.psum(jnp.sum(f), "model")

            total = jax.jit(shard_map(
                _eval_shard, mesh=mesh,
                in_specs=(P("model", None), P("model", None),
                          P("data", None), P("data")),
                out_specs=P(),
            ))
        return float(np.asarray(total(J_cur, h_cur, codes_d, w_d)))

    import time
    t0 = time.time()
    table = []
    converged = False
    ls_failed = False
    stopped = False
    value = float("nan")
    it = start_iter
    last_ckpt = start_iter
    steps = max(1, int(cfg.steps_per_call))

    # a resumed per-site LBFGS state with every site already frozen
    # (converged or linesearch-failed) must not dispatch another
    # chunk: its steps would be pass-throughs that duplicate the
    # final iterate's row and drift the checkpoint iteration counter
    # by one per resume (same guard as the symmetric fit)
    if cfg.solver == "lbfgs" and start_iter > 0:
        conv_h = np.asarray(_to_host(state["converged"]), dtype=bool)
        fail_h = np.asarray(_to_host(state["ls_failed"]), dtype=bool)
        if bool(np.all(conv_h | fail_h)):
            stopped = True
            ls_failed = bool(np.any(fail_h))
            converged = not ls_failed

    last_metrics = None
    while it < cfg.max_iter and not stopped:
        n_steps = min(steps, cfg.max_iter - it)
        J, h, state, metrics = chunk(J, h, state, codes_d, w_d, oh_d)
        metrics = np.asarray(metrics, dtype=np.float64)
        last_metrics = metrics
        now = time.time() - t0
        for k in range(n_steps):
            it += 1
            value, gnorm, xnorm = metrics[k][:3]
            rec = {"iter": it, "fx": value, "gnorm": gnorm,
                   "xnorm": xnorm, "hnorm": metrics[k][-2],
                   "Jnorm": metrics[k][-1], "time": now}
            table.append(rec)
            if callback is not None:
                callback(rec)
            if cfg.solver == "lbfgs":
                # per-site criteria govern: cols [3, 4] carry the
                # count of still-active sites and of sites frozen by
                # linesearch failure; the fit converged iff every
                # site met the gradient criterion
                if metrics[k][3] == 0:
                    stopped = True
                    ls_failed = metrics[k][4] > 0
                    converged = not ls_failed
                    break
            elif gnorm <= cfg.conv_tol * max(1.0, xnorm):
                converged = True
                stopped = True
                break

        if (checkpoint_file is not None
                and it - last_ckpt >= checkpoint_every):
            save_checkpoint(J, h, state, it)
            last_ckpt = it

    if checkpoint_file is not None and it > last_ckpt:
        save_checkpoint(J, h, state, it)

    if cfg.solver == "adam":
        # the adam chunk records fx at the PRE-update iterate, so the
        # last row lags the returned parameters by up to
        # steps_per_call updates (the chunk may overshoot max_iter or
        # the convergence break); pin final_loss to the parameters
        # actually returned, like the symmetric fit
        value = _objective_at(J, h)
    elif last_metrics is not None:
        # per-site LBFGS records fx at the accepted iterates, but a
        # chunk may overshoot max_iter with live steps for unfrozen
        # sites; the final metrics row prices the parameters actually
        # returned (all-frozen rows repeat the frozen objective, so
        # this matches the recorded value when nothing overshot)
        value = float(last_metrics[-1][0])
    elif np.isnan(value):
        # the loop never dispatched (resume at/past max_iter, or an
        # all-frozen resumed state): the per-site LBFGS state carries
        # the objective of the current iterate
        value = float(np.sum(np.asarray(
            _to_host(state["value"]), dtype=np.float64
        )))

    # directed couplings -> shared-parameter form, once
    J_dir = _to_host(J).astype(np.float64)
    lq = L * q
    J_dir = J_dir.reshape(L_pad, q, L_pad, q)[:L, :, :L, :] \
        .reshape(lq, lq)
    from evcouplings_tpu.ops.encode import unflatten_J

    J_ij = unflatten_J(0.5 * (J_dir + J_dir.T), L, q)
    h_i = _to_host(h).astype(np.float64)[:L]

    return PlmFitResult(
        J_ij=J_ij, h_i=h_i, iteration_table=table,
        # TOTAL iterations the returned parameters received (resume-
        # aware, like the symmetric fit)
        num_iter=it, converged=converged, final_loss=value,
        ls_failed=ls_failed,
    )
