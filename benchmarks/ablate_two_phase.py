"""
Ablation of the two-phase PLM step (block 8192, bf16) — where do the
6.3 ms go?  Variants build up the step piecewise:

  fwd        phase-1 scan, forward GEMM + logZ/nll only (no residual)
  resid      phase-1 scan incl. softmax residual write (no dJh GEMM)
  grad       + phase-2 dJh GEMM (full closed-form gradient, no reg)
  reg        + regularizer/symmetrization epilogue on dJ
  full       + Adam update (the production step)

Timing per the TPU tunnel rules: chain steps on-device (lax.scan),
chain dispatches through carried params, block_until_ready the carry.
"""

import json
import sys
import time

import numpy as np

N, L, Q = 16384, 160, 21
STEPS_PER_CALL = 30
WARMUP_CALLS = 2
BENCH_CALLS = 3


def run(mode, block_size=8192):
    import jax
    import jax.numpy as jnp
    import optax

    from evcouplings_tpu.ops.plm import (
        PlmConfig, _augmented_width, _diag_block_mask, _precision,
        build_augmented_onehot,
    )

    cfg = PlmConfig(block_size=block_size, precision="default",
                    dtype="bfloat16", solver="adam")
    dtype = jnp.bfloat16
    acc = jnp.float32
    prec = _precision(cfg.precision)
    lq = L * Q
    lq_aug = _augmented_width(lq)

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, Q, size=(N, L)), dtype=jnp.int8)
    weights = jnp.ones((N,), dtype=jnp.float32)
    oh_all = jax.jit(
        lambda c: build_augmented_onehot(c, Q, dtype)
    )(codes)
    num_blocks = N // block_size

    def phase1(J_aug, want_resid):
        seg = (
            jax.lax.broadcasted_iota(jnp.int32, (lq, L), 0) // Q
            == jax.lax.broadcasted_iota(jnp.int32, (lq, L), 1)
        ).astype(dtype)

        def body(nll, block_idx):
            start = block_idx * block_size
            oh_aug = jax.lax.dynamic_slice_in_dim(
                oh_all, start, block_size, 0)
            oh = oh_aug[:, :lq]
            c = jax.lax.dynamic_slice_in_dim(codes, start, block_size, 0)
            w = jax.lax.dynamic_slice_in_dim(
                weights, start, block_size, 0).astype(dtype)

            logits = jax.lax.dot_general(
                oh_aug, J_aug,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=dtype, precision=prec)
            rowmax = jnp.max(logits, axis=1, keepdims=True)
            e = jnp.exp(logits - rowmax)
            Z = jax.lax.dot_general(
                e, seg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc, precision=prec)
            m_acc = (c >= 0).astype(acc)
            obs = jnp.sum(oh * logits, axis=1).astype(acc)
            logZ = jnp.sum(
                (jnp.log(Z) + rowmax.astype(acc)) * m_acc, axis=1)
            nll = nll - jnp.dot(
                w.astype(acc), obs - logZ, precision=prec,
                preferred_element_type=acc)
            if not want_resid:
                return nll, jnp.zeros((), dtype)
            rz = (m_acc / Z).astype(dtype)
            bcast = jax.lax.dot_general(
                rz, seg, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=dtype, precision=prec)
            r = w[:, None] * (e * bcast - oh)
            return nll, r.astype(dtype)

        return jax.lax.scan(
            body, jnp.zeros((), acc),
            jnp.arange(num_blocks, dtype=jnp.int32))

    # static weighted pair-count matrix for the "counts" variant:
    # C_aug = (w . OH_aug)^T @ OH  (f32, built once per fit).  Then
    # dJh = P^T @ OH - C^T with P = w*softmax*m, and the observed
    # energy term collapses to <J_aug, C> so phase 1 never touches
    # the unaugmented one-hot elementwise.
    def build_counts(oh_all, weights):
        wo = oh_all * weights[:, None].astype(dtype)
        return jax.lax.dot_general(
            wo, oh_all[:, :lq],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc, precision=prec)

    C_aug = jax.jit(build_counts)(oh_all, weights)

    def phase1_counts(J_aug):
        seg = (
            jax.lax.broadcasted_iota(jnp.int32, (lq, L), 0) // Q
            == jax.lax.broadcasted_iota(jnp.int32, (lq, L), 1)
        ).astype(dtype)

        def body(logZsum, block_idx):
            start = block_idx * block_size
            oh_aug = jax.lax.dynamic_slice_in_dim(
                oh_all, start, block_size, 0)
            c = jax.lax.dynamic_slice_in_dim(codes, start, block_size, 0)
            w = jax.lax.dynamic_slice_in_dim(
                weights, start, block_size, 0).astype(dtype)

            logits = jax.lax.dot_general(
                oh_aug, J_aug,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=dtype, precision=prec)
            rowmax = jnp.max(logits, axis=1, keepdims=True)
            e = jnp.exp(logits - rowmax)
            Z = jax.lax.dot_general(
                e, seg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc, precision=prec)
            m_acc = (c >= 0).astype(acc)
            logZ = jnp.sum(
                (jnp.log(Z) + rowmax.astype(acc)) * m_acc, axis=1)
            logZsum = logZsum + jnp.dot(
                w.astype(acc), logZ, precision=prec,
                preferred_element_type=acc)
            rz = (m_acc / Z).astype(dtype)
            bcast = jax.lax.dot_general(
                rz, seg, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=dtype, precision=prec)
            p = w[:, None] * (e * bcast)
            return logZsum, p.astype(dtype)

        return jax.lax.scan(
            body, jnp.zeros((), acc),
            jnp.arange(num_blocks, dtype=jnp.int32))

    def grad_step_counts(params):
        J_aug = make_j_aug(params)
        logZsum, p_all = phase1_counts(J_aug)
        dJh = jax.lax.dot_general(
            p_all.reshape(N, lq), oh_all,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc, precision=prec)
        dJh = dJh - C_aug.T
        obs = jnp.vdot(J_aug[:lq + 1].astype(acc),
                       C_aug[:lq + 1])
        nll = logZsum - obs
        dJ_eff = dJh[:, :lq]
        dh = dJh[:, lq]
        P_f = params["J"].astype(acc)
        S = dJ_eff + cfg.lambda_J * P_f
        mask_f = _diag_block_mask(L, Q, acc)
        dP = 0.5 * (S + S.T) * mask_f
        h_f = params["h"].astype(acc)
        value = (nll + cfg.lambda_h * jnp.sum(h_f ** 2)
                 + cfg.lambda_J * 0.5
                 * jnp.sum((0.5 * (P_f + P_f.T) * mask_f) ** 2))
        return value, {
            "J": dP, "h": dh.reshape(L, Q) + 2.0 * cfg.lambda_h * h_f}

    def make_j_aug(params):
        mask = _diag_block_mask(L, Q, dtype)
        P_c = params["J"].astype(dtype)
        J_eff = 0.5 * (P_c + P_c.T) * mask
        h_c = params["h"].astype(dtype)
        return jnp.concatenate(
            [J_eff, h_c.reshape(1, lq),
             jnp.zeros((lq_aug - lq - 1, lq), dtype=dtype)], axis=0)

    def grad_step(params, with_reg):
        J_aug = make_j_aug(params)
        nll, r_all = phase1(J_aug, True)
        dJh = jax.lax.dot_general(
            r_all.reshape(N, lq), oh_all,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc, precision=prec)
        dJ_eff = dJh[:, :lq]
        dh = dJh[:, lq]
        if not with_reg:
            return nll, {"J": dJ_eff, "h": dh.reshape(L, Q)}
        P_f = params["J"].astype(acc)
        S = dJ_eff + cfg.lambda_J * P_f
        mask_f = _diag_block_mask(L, Q, acc)
        dP = 0.5 * (S + S.T) * mask_f
        h_f = params["h"].astype(acc)
        value = (nll + cfg.lambda_h * jnp.sum(h_f ** 2)
                 + cfg.lambda_J * 0.5
                 * jnp.sum((0.5 * (P_f + P_f.T) * mask_f) ** 2))
        return value, {
            "J": dP, "h": dh.reshape(L, Q) + 2.0 * cfg.lambda_h * h_f}

    params = {
        "J": jnp.zeros((lq, lq), dtype=jnp.float32),
        "h": jnp.zeros((L, Q), dtype=jnp.float32),
    }
    opt = optax.adam(cfg.adam_lr)
    state = opt.init(params)

    @jax.jit
    def step_chunk(params, state):
        def body(carry, _):
            params, state = carry
            if mode == "fwd":
                nll, _ = phase1(make_j_aug(params), False)
                params = {"J": params["J"] + nll * 1e-20,
                          "h": params["h"] + nll * 1e-20}
                return (params, state), nll
            if mode == "resid":
                nll, r_all = phase1(make_j_aug(params), True)
                # cheap data-dependent chain so the residual write
                # cannot be elided: fold one residual row into params
                chain = jnp.sum(
                    r_all.reshape(N, lq)[0].astype(acc)) * 1e-20
                params = {"J": params["J"] + (nll + chain) * 1e-20,
                          "h": params["h"] + nll * 1e-20}
                return (params, state), nll
            if mode in ("grad", "reg"):
                value, grad = grad_step(params, mode == "reg")
                params = {"J": params["J"] - 1e-9 * grad["J"],
                          "h": params["h"] - 1e-9 * grad["h"]}
                return (params, state), value
            if mode == "counts":
                value, grad = grad_step_counts(params)
            else:
                value, grad = grad_step(params, True)
            updates, state = opt.update(grad, state, params)
            return (optax.apply_updates(params, updates), state), value
        (params, state), values = jax.lax.scan(
            body, (params, state), None, length=STEPS_PER_CALL)
        return params, state, values

    for _ in range(WARMUP_CALLS):
        params, state, values = step_chunk(params, state)
    jax.block_until_ready(params)

    t0 = time.perf_counter()
    for _ in range(BENCH_CALLS):
        params, state, values = step_chunk(params, state)
    jax.block_until_ready(params)
    elapsed = time.perf_counter() - t0

    thr = N * L * BENCH_CALLS * STEPS_PER_CALL / elapsed
    ms = elapsed / (BENCH_CALLS * STEPS_PER_CALL) * 1e3
    print(json.dumps({"variant": mode, "block": block_size,
                      "ms_per_step": round(ms, 3),
                      "seq_site_per_s": round(thr / 1e6, 1)}),
          flush=True)


if __name__ == "__main__":
    modes = [m for m in sys.argv[1:] if not m.isdigit()] or [
        "fwd", "resid", "grad", "reg", "full"]
    blocks = [int(b) for b in sys.argv[1:] if b.isdigit()] or [8192]
    for b in blocks:
        for m in modes:
            run(m, block_size=b)

# Measured (v5e tunnel, block 8192, N=16384 L=160 q=21, 2026-08-17):
#   fwd 3.08ms | +resid 3.46 | +dJh GEMM 5.75 | +reg 6.32 | +Adam 6.68
#   counts variant 6.82ms (no win over in-block residual subtraction)
# Two GEMMs at the 209 TFLOP/s bare-matmul rate would be ~3.6ms, so the
# step is ~1.9x pure-GEMM; reg+Adam epilogue = 0.92ms of HBM-bound
# traffic over (Lq,Lq) f32 arrays -> fused-update Pallas candidate.
