"""Per-iteration wall time of the native scan-chained LBFGS
(ops/lbfgs.py) through fit_plm at headline PLM shapes, vs the
~40 ms/iter the optax.lbfgs + zoom path measured on TPU v5e.

Timing is tunnel-safe: iterations are chained on-device via
steps_per_call and the host loop's own metrics fetch forces a sync
every chunk, so per-dispatch latency (~5 ms) is amortized.
"""

import argparse
import time

import numpy as np

from evcouplings_tpu.ops.plm import PlmConfig, fit_plm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--length", type=int, default=160)
    ap.add_argument("--q", type=int, default=21)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--steps-per-call", type=int, default=10)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    codes = rng.integers(0, args.q, size=(args.n, args.length),
                         dtype=np.int8)
    weights = rng.uniform(0.5, 1.0, size=args.n)

    cfg = PlmConfig(
        solver="lbfgs", max_iter=args.iters, conv_tol=0.0,
        block_size=args.block, dtype=args.dtype,
        steps_per_call=args.steps_per_call,
        precision="default" if args.dtype == "bfloat16" else "highest",
    )

    records = []
    t_first = [None]

    def cb(rec):
        if t_first[0] is None:
            t_first[0] = time.time()
        records.append(rec)

    t0 = time.time()
    res = fit_plm(codes, weights, args.q, cfg, callback=cb)
    total = time.time() - t0

    # wall time after the first chunk returned (drops compile time)
    warm = total - (t_first[0] - t0)
    warm_iters = len(records) - args.steps_per_call
    per_iter = warm / max(1, warm_iters) * 1e3
    seq_sites = args.n * args.length * warm_iters / warm
    print(f"iters={len(records)} total={total:.2f}s "
          f"warm_per_iter={per_iter:.2f}ms "
          f"throughput={seq_sites/1e6:.1f}M seq*site/s "
          f"final_fx={res.final_loss:.4f}")


if __name__ == "__main__":
    main()
