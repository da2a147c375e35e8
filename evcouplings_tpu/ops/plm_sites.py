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

Solver: Adam (elementwise, shard-local). LBFGS would need every
linesearch dot product psum-merged across "model"; Adam is the
production path at these scales and keeps the step communication-free.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:                      # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from evcouplings_tpu.ops.plm import PlmConfig, PlmFitResult, _precision
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

    def _block_residual(J_eff, h_c, rows, wb, oh, m_idx):
        """Shared per-block math: (nll_b, weighted softmax residual
        (block, l_loc, q) f32)."""
        logits = (
            jnp.dot(oh, J_eff.T, precision=prec)
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
            wb[:, None] * valid * jnp.sum(oh_t * logp, axis=-1))
        r = (jnp.exp(logp) - oh_t) * (
            wb[:, None] * valid)[..., None]
        return nll_b, r

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
                return nll_acc + nll_b, \
                    r.reshape(block, l_loc * q).astype(dtype)

            init = jnp.zeros((), f32)
            if manual_axes:
                init = lax.pvary(init, manual_axes)
            nll, r_blocks = lax.scan(
                body, init, jnp.arange(n_blocks))
            r_all = r_blocks.reshape(n_loc, l_loc * q)
            dJ = lax.dot_general(
                r_all, oh_all, (((0,), (0,)), ((), ())),
                precision=prec, preferred_element_type=f32,
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
                r2 = r.reshape(block, l_loc * q).astype(dtype)
                # f32 GEMM output: without preferred_element_type the
                # bf16 block contribution would be rounded to bf16
                # BEFORE entering the f32 accumulator
                dJ_b = jnp.dot(r2.T, oh, precision=prec,
                               preferred_element_type=f32)
                dh_b = jnp.sum(r, axis=0)
                return (nll_acc + nll_b, dJ_acc + dJ_b,
                        dh_acc + dh_b), None

            init = (jnp.zeros((), f32),
                    jnp.zeros((l_loc * q, lq_pad), f32),
                    jnp.zeros((l_loc, q), f32))
            if manual_axes:
                init = jax.tree.map(
                    lambda a: lax.pvary(a, manual_axes), init)
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
                    jnp.sum(blocks ** 2, axis=(1, 3)) + 1e-12)
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
            rec = jnp.stack([value, jnp.sqrt(gsq), jnp.sqrt(xsq)])
            return (J_loc, h_loc, mu_J, nu_J, mu_h, nu_h, cnt), rec

        carry = (J_loc, h_loc) + state
        carry, metrics = lax.scan(one, carry, None, length=steps)
        return carry[0], carry[1], carry[2:], metrics

    return step_chunk_local


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
    gradient). Only the Adam solver is supported (see module
    docstring).

    checkpoint_file: every checkpoint_every iterations, the directed
    couplings, fields, Adam moments, and iteration count are gathered
    to the host and written atomically; an existing file resumes the
    fit bitwise (the checkpoint stores the site-PADDED arrays, so
    resuming requires the same mesh model-axis size).
    """
    if cfg.solver != "adam":
        raise ValueError(
            "fit_plm_asym supports solver='adam' only "
            "(got {!r})".format(cfg.solver))
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
    zeros_like = lambda a: jnp.zeros_like(a)
    state = (zeros_like(J), zeros_like(J), zeros_like(h),
             zeros_like(h), jnp.zeros((), jnp.int32))

    # grad layout: the one-GEMM residual layout exists here too
    # (grad_layout="two_phase") but MEASURED NO-WIN for the asymmetric
    # fit on v5e (9.95 vs 9.55 ms/iter at N=16k, L=160, bf16, block
    # 2048; 12.5 at block 8192) — the carried accumulator is already
    # only (l_loc*q, lq_pad) per shard and its round trips overlap
    # with the MXU phases. "auto" therefore resolves to carried, the
    # opposite of the symmetric path's resolution (ops/plm.py).
    compute_dtype = jnp.dtype(cfg.dtype)
    if cfg.grad_layout not in ("auto", "carried", "two_phase"):
        raise ValueError(
            "Unknown grad_layout: {}".format(cfg.grad_layout))
    two_phase = cfg.grad_layout == "two_phase"

    local = _make_local_step(
        L, L_pad, l_loc, q, cfg,
        manual_axes=("data", "model") if mesh is not None else (),
        two_phase=two_phase,
    )

    if mesh is None:
        @jax.jit
        def chunk(J, h, state, codes_d, w_d, oh_d):
            m_idx = jnp.zeros((), jnp.int32)
            return local(J, h, state, codes_d, w_d, m_idx, False,
                         oh_all=oh_d)
        codes_d = jnp.asarray(codes_p)
        w_d = jnp.asarray(w_p)
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
                P("model", None),           # J row-sharded by site
                P("model", None),           # h sharded by site
                (P("model", None), P("model", None),
                 P("model", None), P("model", None), P()),
                P("data", None),            # rows sharded
                P("data"),
                oh_spec,
            ),
            out_specs=(
                P("model", None), P("model", None),
                (P("model", None), P("model", None),
                 P("model", None), P("model", None), P()),
                P(),                        # metrics replicated
            ),
        ))
        codes_d = jax.device_put(
            jnp.asarray(codes_p),
            NamedSharding(mesh, P("data", None)))
        w_d = jax.device_put(
            jnp.asarray(w_p), NamedSharding(mesh, P("data")))
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
        J = jax.device_put(J, NamedSharding(mesh, P("model", None)))
        h = jax.device_put(h, NamedSharding(mesh, P("model", None)))
        state = jax.device_put(
            state,
            (NamedSharding(mesh, P("model", None)),
             NamedSharding(mesh, P("model", None)),
             NamedSharding(mesh, P("model", None)),
             NamedSharding(mesh, P("model", None)),
             NamedSharding(mesh, P())),
        )

    import os

    def _put_model(arr):
        if mesh is None:
            return jnp.asarray(arr)
        return jax.device_put(
            jnp.asarray(arr), NamedSharding(mesh, P("model", None)))

    start_iter = 0
    if checkpoint_file is not None and os.path.exists(checkpoint_file):
        ckpt = np.load(checkpoint_file)
        if "mu_J" not in ckpt.files:
            raise ValueError(
                "Checkpoint {} was not written by the asymmetric "
                "fitter (missing its Adam state) — it cannot resume "
                "a parametrization='asymmetric' fit".format(
                    checkpoint_file))
        if ckpt["J"].shape != (lq_pad, lq_pad):
            raise ValueError(
                "Checkpoint {} does not match padded problem shape "
                "(L_pad={}, q={}) — asymmetric resume requires the "
                "same mesh model-axis size".format(
                    checkpoint_file, L_pad, q))
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
        start_iter = int(ckpt["iteration"])

    def save_checkpoint(J, h, state, iteration):
        tmp = checkpoint_file + ".tmp.npz"
        np.savez(
            tmp,
            J=np.asarray(J), h=np.asarray(h),
            mu_J=np.asarray(state[0]), nu_J=np.asarray(state[1]),
            mu_h=np.asarray(state[2]), nu_h=np.asarray(state[3]),
            count=np.asarray(state[4]),
            iteration=np.asarray(iteration),
        )
        os.replace(tmp, checkpoint_file)

    import time
    t0 = time.time()
    table = []
    converged = False
    value = float("nan")
    it = start_iter
    last_ckpt = start_iter
    steps = max(1, int(cfg.steps_per_call))
    while it < cfg.max_iter and not converged:
        n_steps = min(steps, cfg.max_iter - it)
        J, h, state, metrics = chunk(J, h, state, codes_d, w_d, oh_d)
        metrics = np.asarray(metrics, dtype=np.float64)
        now = time.time() - t0
        for k in range(n_steps):
            it += 1
            value, gnorm, xnorm = metrics[k]
            rec = {"iter": it, "fx": value, "gnorm": gnorm,
                   "xnorm": xnorm, "time": now}
            table.append(rec)
            if callback is not None:
                callback(rec)
            if gnorm <= cfg.conv_tol * max(1.0, xnorm):
                converged = True
                break

        if (checkpoint_file is not None
                and it - last_ckpt >= checkpoint_every):
            save_checkpoint(J, h, state, it)
            last_ckpt = it

    if checkpoint_file is not None and it > last_ckpt:
        save_checkpoint(J, h, state, it)

    # directed couplings -> shared-parameter form, once
    J_dir = np.asarray(J, dtype=np.float64)
    lq = L * q
    J_dir = J_dir.reshape(L_pad, q, L_pad, q)[:L, :, :L, :] \
        .reshape(lq, lq)
    J_sym = 0.5 * (J_dir + J_dir.T)
    J_ij = J_sym.reshape(L, q, L, q).transpose(0, 2, 1, 3)
    J_ij[np.arange(L), np.arange(L)] = 0.0
    h_i = np.asarray(h, dtype=np.float64)[:L]

    return PlmFitResult(
        J_ij=J_ij, h_i=h_i, iteration_table=table,
        num_iter=len(table), converged=converged, final_loss=value,
    )
