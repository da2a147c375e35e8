"""
Experiment: two-phase PLM gradient — residual materialization + one
K=N GEMM — vs the production carried-f32-accumulator scan.

Hypothesis: the (Lq, Lq_aug) f32 dJh accumulator carried through the
block scan round-trips HBM once per block (~92 MB x num_blocks per
step). Writing the per-block residuals r (bf16, 110 MB total) as scan
ys and computing dJh = r_all^T @ oh_all in ONE dot_general afterwards
replaces that traffic with ~0.5 GB total and gives the MXU a K=16384
contraction.

Timing per the TPU tunnel rules: chain steps on-device via lax.scan,
chain dispatches through carried params, block_until_ready on output.
"""

import json
import sys
import time

import numpy as np

N, L, Q = 16384, 160, 21
STEPS_PER_CALL = 30
WARMUP_CALLS = 2
BENCH_CALLS = 3


def run(block_size, from_codes=False):
    import jax
    import jax.numpy as jnp
    import optax

    from evcouplings_tpu.ops.plm import (
        PlmConfig, _augmented_width, _diag_block_mask, _precision,
    )

    cfg = PlmConfig(block_size=block_size, precision="default",
                    dtype="bfloat16", solver="adam")
    dtype = jnp.bfloat16
    acc = jnp.float32
    prec = _precision(cfg.precision)
    lq = L * Q
    lq_aug = _augmented_width(lq)

    rng = np.random.default_rng(0)
    codes_np = rng.integers(0, Q, size=(N, L)).astype(np.int8)
    codes = jnp.asarray(codes_np)
    weights = jnp.ones((N,), dtype=jnp.float32)

    # one-hot of the full MSA, ones-augmented, built ONCE per fit
    # (static across steps): (N, lq_aug) bf16
    def build_oh_all(codes):
        oh = jax.nn.one_hot(codes, Q, dtype=dtype).reshape(N, lq)
        return jnp.concatenate(
            [oh, jnp.ones((N, 1), dtype=dtype),
             jnp.zeros((N, lq_aug - lq - 1), dtype=dtype)], axis=1)

    oh_all = (None if from_codes
              else jax.jit(build_oh_all)(codes))

    num_blocks = N // block_size

    def vg(params, oh_all, codes, weights):
        mask = _diag_block_mask(L, Q, dtype)
        P_c = params["J"].astype(dtype)
        J_eff = 0.5 * (P_c + P_c.T) * mask
        h_c = params["h"].astype(dtype)
        J_aug = jnp.concatenate(
            [J_eff, h_c.reshape(1, lq),
             jnp.zeros((lq_aug - lq - 1, lq), dtype=dtype)], axis=0)

        seg = (
            jax.lax.broadcasted_iota(jnp.int32, (lq, L), 0) // Q
            == jax.lax.broadcasted_iota(jnp.int32, (lq, L), 1)
        ).astype(dtype)

        def body(nll, block_idx):
            start = block_idx * block_size
            c = jax.lax.dynamic_slice_in_dim(
                codes, start, block_size, 0)
            if from_codes:
                oh_aug = jnp.concatenate(
                    [jax.nn.one_hot(c, Q, dtype=dtype).reshape(
                        block_size, lq),
                     jnp.ones((block_size, 1), dtype=dtype),
                     jnp.zeros((block_size, lq_aug - lq - 1),
                               dtype=dtype)], axis=1)
            else:
                oh_aug = jax.lax.dynamic_slice_in_dim(
                    oh_all, start, block_size, 0)
            oh = oh_aug[:, :lq]
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

            rz = (m_acc / Z).astype(dtype)
            bcast = jax.lax.dot_general(
                rz, seg, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=dtype, precision=prec)
            r = w[:, None] * (e * bcast - oh)
            return nll, r.astype(dtype)

        nll, r_all = jax.lax.scan(
            body, jnp.zeros((), acc),
            jnp.arange(num_blocks, dtype=jnp.int32))

        # ONE GEMM, K = N: dJh = r_all^T @ oh_all (f32 out)
        if from_codes:
            oh_gemm = jnp.concatenate(
                [jax.nn.one_hot(codes, Q, dtype=dtype).reshape(N, lq),
                 jnp.ones((N, 1), dtype=dtype),
                 jnp.zeros((N, lq_aug - lq - 1), dtype=dtype)],
                axis=1)
        else:
            oh_gemm = oh_all
        dJh = jax.lax.dot_general(
            r_all.reshape(N, lq), oh_gemm,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc, precision=prec)

        dJ_eff = dJh[:, :lq]
        dh = dJh[:, lq]
        reg_value = (
            cfg.lambda_h * jnp.sum(h_c.astype(acc) ** 2)
            + cfg.lambda_J * 0.5 * jnp.sum(J_eff.astype(acc) ** 2))
        P_f = params["J"].astype(acc)
        S = dJ_eff + cfg.lambda_J * P_f
        mask_f = _diag_block_mask(L, Q, acc)
        dP = 0.5 * (S + S.T) * mask_f
        value = nll + reg_value
        grads = {
            "J": dP.astype(params["J"].dtype),
            "h": (dh.reshape(L, Q)
                  + 2.0 * cfg.lambda_h * params["h"].astype(acc)
                  ).astype(params["h"].dtype),
        }
        return value, grads

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
            value, grad = vg(params, None if from_codes else oh_all,
                             codes, weights)
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
    print(json.dumps({"variant": ("two_phase_codes" if from_codes
                                  else "two_phase"),
                      "block": block_size,
                      "ms_per_step": round(ms, 3),
                      "seq_site_per_s": round(thr / 1e6, 1)}),
          flush=True)


if __name__ == "__main__":
    from_codes = "--from-codes" in sys.argv
    blocks = [int(b) for b in sys.argv[1:]
              if not b.startswith("-")] or [512, 1024, 2048]
    for b in blocks:
        run(b, from_codes=from_codes)
