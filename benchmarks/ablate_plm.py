"""
Ablation bench for the PLM fused step (runs on the real TPU chip).

Measures seq*site/s for block-size sweep and epilogue ablations so we
know where the non-matmul time goes. Timing rules per the TPU tunnel:
chain steps on-device (lax.scan), chain calls through carried params,
block_until_ready on the carried output.
"""

import json
import sys
import time

import numpy as np

N, L, Q = 16384, 160, 21
STEPS_PER_CALL = 30
WARMUP_CALLS = 2
BENCH_CALLS = 3


def run_variant(name, block_size=2048, mode="full"):
    import jax
    import jax.numpy as jnp
    import optax

    from evcouplings_tpu.ops.plm import PlmConfig, make_plm_value_and_grad

    cfg = PlmConfig(block_size=block_size, precision="default",
                    dtype="bfloat16", solver="adam")
    vg = make_plm_value_and_grad(L, Q, cfg)

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, Q, size=(N, L)), dtype=jnp.int8)
    weights = jnp.ones((N,), dtype=jnp.float32)

    params = {
        "J": jnp.zeros((L * Q, L * Q), dtype=jnp.float32),
        "h": jnp.zeros((L, Q), dtype=jnp.float32),
    }
    opt = optax.adam(cfg.adam_lr)
    state = opt.init(params)

    if mode == "full":
        @jax.jit
        def step_chunk(params, state):
            def body(carry, _):
                params, state = carry
                value, grad = vg(params, codes, weights)
                updates, state = opt.update(grad, state, params)
                return (optax.apply_updates(params, updates), state), value
            (params, state), values = jax.lax.scan(
                body, (params, state), None, length=STEPS_PER_CALL)
            return params, state, values
    elif mode == "grad_only":
        # no optimizer: chain grad into params additively so nothing is
        # elidable, measuring value+grad without Adam traffic
        @jax.jit
        def step_chunk(params, state):
            def body(params, _):
                value, grad = vg(params, codes, weights)
                params = jax.tree.map(
                    lambda p, g: p - 1e-6 * g, params, grad)
                return params, value
            params, values = jax.lax.scan(
                body, params, None, length=STEPS_PER_CALL)
            return params, state, values
    elif mode == "matmul_only":
        # the two bare GEMMs per block, nothing else: ceiling
        lq = L * Q
        oh_blocks = jax.nn.one_hot(
            codes.reshape(-1, block_size, L), Q,
            dtype=jnp.bfloat16).reshape(-1, block_size, lq)

        @jax.jit
        def step_chunk(params, state):
            def body(J, _):
                def blk(dJ, oh):
                    logits = jax.lax.dot_general(
                        oh, J.astype(jnp.bfloat16),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.bfloat16)
                    dJ = dJ + jax.lax.dot_general(
                        logits, oh,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return dJ, ()
                dJ, _ = jax.lax.scan(
                    blk, jnp.zeros((lq, lq), jnp.float32), oh_blocks)
                return J - 1e-6 * dJ, ()
            J, _ = jax.lax.scan(
                body, params["J"], None, length=STEPS_PER_CALL)
            return {"J": J, "h": params["h"]}, state, ()
    else:
        raise ValueError(mode)

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
    print(json.dumps({"variant": name, "block": block_size, "mode": mode,
                      "ms_per_step": round(ms, 3),
                      "seq_site_per_s": round(thr / 1e6, 1)}), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    if which == "sweep":
        for b in (1024, 2048, 4096, 8192, 16384):
            run_variant(f"block{b}", block_size=b)
    elif which == "modes":
        for m in ("matmul_only", "grad_only", "full"):
            run_variant(m, block_size=2048, mode=m)
        for m in ("matmul_only", "grad_only", "full"):
            run_variant(m, block_size=4096, mode=m)
    else:
        run_variant(which, block_size=int(sys.argv[2]), mode=sys.argv[3])
