"""Per-component timing of the native LBFGS iteration on TPU:
(a) one closed-form vg evaluation, (b) the two-loop direction,
(c) a full chained chunk. Tunnel-safe: chained inputs + host fetch."""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from evcouplings_tpu.ops.plm import PlmConfig, make_plm_value_and_grad
from evcouplings_tpu.ops.lbfgs import (
    _two_loop_direction, init_lbfgs_state, make_lbfgs_chunk,
)


def timed(label, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        # force a host fetch so the tunnel cannot elide the dispatch
        leaf = jax.tree.leaves(out)[0]
        _ = float(leaf.reshape(-1)[0])
    dt = (time.time() - t0) / reps * 1e3
    print(f"{label}: {dt:.2f} ms")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--length", type=int, default=160)
    ap.add_argument("--q", type=int, default=21)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--precision", default=None)
    args = ap.parse_args()

    N, L, q = args.n, args.length, args.q
    rng = np.random.default_rng(0)
    codes = jnp.asarray(
        rng.integers(0, q, size=(N, L), dtype=np.int8))
    w = jnp.asarray(rng.uniform(0.5, 1.0, size=N).astype(np.float32))

    prec = args.precision or (
        "default" if args.dtype == "bfloat16" else "highest")
    cfg = PlmConfig(solver="lbfgs", block_size=args.block,
                    dtype=args.dtype, precision=prec, conv_tol=0.0)
    vg_fn = make_plm_value_and_grad(L, q, cfg, symmetric_params=True)
    lq = L * q
    dsize = lq * lq
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    def vg_flat(x, codes, w):
        p = {"J": x[:dsize].reshape(lq, lq).astype(dt),
             "h": x[dsize:].reshape(L, q).astype(dt)}
        v, g = vg_fn(p, codes, w)
        return v.astype(jnp.float32), jnp.concatenate(
            [g["J"].reshape(-1), g["h"].reshape(-1)]
        ).astype(jnp.float32)

    x = jnp.zeros(dsize + lq, jnp.float32)
    vg_j = jax.jit(vg_flat)
    print(f"shapes: N={N} L={L} q={q} block={args.block} "
          f"dtype={args.dtype} prec={prec}")
    v, g = timed("vg eval", vg_j, x, codes, w)

    st = init_lbfgs_state(x, v, g)
    # populate history with fake but well-scaled pairs
    key = jax.random.PRNGKey(0)
    for i in range(5):
        s = jax.random.normal(
            jax.random.fold_in(key, 100 + i), (dsize + lq,),
            jnp.float32) * 1e-3
        y = jax.random.normal(
            jax.random.fold_in(key, i), (dsize + lq,), jnp.float32)
        st["s_hist"] = st["s_hist"].at[i].set(s)
        st["y_hist"] = st["y_hist"].at[i].set(y)
        st["rho"] = st["rho"].at[i].set(1.0 / float(jnp.dot(s, y)))
    st["count"] = jnp.asarray(5, jnp.int32)

    two_loop = jax.jit(lambda s: _two_loop_direction(s, 5))
    timed("two-loop direction", two_loop, st)

    for spc in (1, 10):
        chunk = jax.jit(make_lbfgs_chunk(
            vg_flat, m=5, steps_per_call=spc, conv_tol=0.0))
        t0 = time.time()
        x2, st2, m = chunk(x, st, codes, w)
        jax.block_until_ready(m)
        print(f"chunk spc={spc}: compile+run {time.time()-t0:.1f}s")
        t0 = time.time()
        x2, st2, m = chunk(x2, st2, codes, w)
        _ = float(m[0, 0])
        dtc = (time.time() - t0) * 1e3
        ne = int(st2["nevals"]) - int(st["nevals"])
        print(f"chunk spc={spc}: warm {dtc:.2f} ms total, "
              f"{dtc/spc:.2f} ms/iter, evals in 2nd chunk={ne}")
        st = st2
        x = x2


if __name__ == "__main__":
    main()
