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
    ap.add_argument("--precision", default=None,
                    help="matmul precision override "
                         "(default|high|highest)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    codes = rng.integers(0, args.q, size=(args.n, args.length),
                         dtype=np.int8)
    weights = rng.uniform(0.5, 1.0, size=args.n)

    cfg = PlmConfig(
        solver="lbfgs", max_iter=args.iters, conv_tol=0.0,
        block_size=args.block, dtype=args.dtype,
        steps_per_call=args.steps_per_call,
        precision=args.precision or (
            "default" if args.dtype == "bfloat16" else "highest"),
    )

    # records arrive in per-chunk bursts from the host loop; timestamp
    # each and reconstruct chunk boundaries so timing can exclude the
    # first chunk (compile) and the last (may contain frozen
    # passthrough rows after an on-device stop)
    stamps = []

    def cb(rec):
        stamps.append((time.time(), rec["iter"], rec["fx"]))

    t0 = time.time()
    res = fit_plm(codes, weights, args.q, cfg, callback=cb)
    total = time.time() - t0

    bursts = [[stamps[0]]]
    for s in stamps[1:]:
        if s[0] - bursts[-1][-1][0] > 2e-3:
            bursts.append([])
        bursts[-1].append(s)
    if len(bursts) >= 4:
        t_start = bursts[0][-1][0]
        t_end = bursts[-2][-1][0]
        iters = bursts[-2][-1][1] - bursts[0][-1][1]
        warm = t_end - t_start
    else:
        warm = total
        iters = len(stamps)
    per_iter = warm / max(1, iters) * 1e3
    seq_sites = args.n * args.length * iters / warm
    print(f"iters_total={len(stamps)} timed={iters} "
          f"total={total:.1f}s per_iter={per_iter:.2f}ms "
          f"throughput={seq_sites/1e6:.1f}M seq*site/s "
          f"final_fx={res.final_loss:.4f} "
          f"converged={res.converged}")


if __name__ == "__main__":
    main()
