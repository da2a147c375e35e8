"""
Data-parallel scaling benchmark for the PLM fitter (BASELINE.md
scaling target: >= 0.8 scaling efficiency at >= 2 hosts with MSA
rows sharded over the mesh and gradients psum-merged).

Two modes (--mode, default "both"):

- weak: every device receives a fixed number of rows
  (--rows-per-device), so the ideal aggregate throughput grows
  linearly with the mesh size; efficiency = (throughput_d / d) /
  throughput_1. On a real pod slice this measures ICI collective
  overhead — the BASELINE scaling number.
- strong: the TOTAL row count is fixed (rows_per_device x the largest
  mesh) and sharded over d devices; efficiency = throughput_d /
  throughput_1 (ideal 1.0). Total FLOPs are constant across mesh
  sizes, so this isolates the overhead the sharded program +
  collectives add — meaningful even on VIRTUAL devices that share
  host cores, where weak scaling is bounded by 1/d by construction.

On a single chip (or CPU) run with virtual devices (--virtual N sets
XLA_FLAGS=--xla_force_host_platform_device_count=N and forces the CPU
backend): that validates the sharded program and collective layout,
and the strong-mode efficiency is a real overhead measurement; the
weak-mode numbers are then labeled with an explanatory note.

Prints one JSON line per (mode, mesh size):
  {"metric": "plm_weak_scaling"|"plm_strong_scaling", "devices": d,
   "value": <seq*site/s aggregate>, "efficiency": <vs 1 device>, ...}
and writes the same records as one driver-capturable JSON artifact
(--out, default SCALING.json in the working directory).
"""

import argparse
import json
import os
import sys
import time


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--virtual", type=int, default=None,
                   help="use N virtual CPU devices instead of real chips")
    p.add_argument("--rows-per-device", type=int, default=4096)
    p.add_argument("--sites", type=int, default=160)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--mode", choices=("weak", "strong", "both"),
                   default="both")
    p.add_argument("--out", default="SCALING.json",
                   help="JSON artifact with all per-mesh records "
                        "('' disables)")
    return p.parse_args()


def main():
    args = parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count={}".format(
                args.virtual
            )
        ).strip()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from evcouplings_tpu.ops.plm import PlmConfig, make_plm_loss
    from evcouplings_tpu.parallel import make_mesh, replicate, shard_rows

    L, Q = args.sites, 21
    n_devices_avail = len(jax.devices())
    backend = jax.default_backend()

    mesh_sizes = [
        d for d in (1, 2, 4, 8, 16, 32, 64) if d <= n_devices_avail
    ]

    cfg = PlmConfig(
        block_size=min(2048, args.rows_per_device),
        precision="default", dtype="bfloat16", solver="adam",
    )
    rng = np.random.default_rng(0)

    def measure(d, N):
        """Mean step time for N total rows sharded over d devices."""
        mesh = make_mesh(d)
        codes = rng.integers(0, Q, size=(N, L)).astype(np.int8)
        weights = np.ones((N,), dtype=np.float32)

        loss = make_plm_loss(L, Q, cfg, mesh=mesh)
        # pad each shard to a block multiple: the loss scans
        # n_local // block_size blocks, so unpadded remainder rows
        # would silently drop out of the objective while the
        # throughput below still counted them (padding rows enter
        # with weight 0 and contribute nothing)
        codes_d, _ = shard_rows(codes, mesh, pad_multiple=cfg.block_size)
        w_d, _ = shard_rows(weights, mesh, pad_multiple=cfg.block_size)

        params = replicate({
            "J": jnp.zeros((L * Q, L * Q), dtype=jnp.float32),
            "h": jnp.zeros((L, Q), dtype=jnp.float32),
        }, mesh)
        opt = optax.adam(cfg.adam_lr)
        state = replicate(opt.init(params), mesh)

        @jax.jit
        def step(params, state):
            value, grad = jax.value_and_grad(loss)(params, codes_d, w_d)
            updates, state = opt.update(grad, state, params)
            return optax.apply_updates(params, updates), state, value

        # force a host FETCH (not just block_until_ready) to sync:
        # through the axon remote-compile tunnel, block_until_ready on
        # a small output can return before the work completes
        for _ in range(args.warmup):
            params, state, value = step(params, state)
        float(value)

        t0 = time.perf_counter()
        for _ in range(args.steps):
            params, state, value = step(params, state)
        float(value)
        return (time.perf_counter() - t0) / args.steps

    records = []

    def run_mode(mode):
        base_throughput = None
        for d in mesh_sizes:
            # weak: per-device rows fixed; strong: total rows fixed at
            # the largest mesh's aggregate so every d divides it
            N = args.rows_per_device * (
                d if mode == "weak" else mesh_sizes[-1]
            )
            dt = measure(d, N)
            throughput = N * L / dt
            if base_throughput is None:
                base_throughput = throughput
            if mode == "weak":
                efficiency = (throughput / d) / base_throughput
            else:
                efficiency = throughput / base_throughput

            record = {
                "metric": "plm_{}_scaling".format(mode),
                "devices": d,
                "backend": backend,
                # virtual CPU devices SHARE the host's cores, so WEAK
                # scaling cannot be efficient there by construction —
                # those numbers validate the sharded program +
                # collective layout only; the STRONG numbers (constant
                # total FLOPs) measure real sharding overhead even on
                # virtual devices (see module docstring)
                "note": (
                    "virtual devices share host cores; weak efficiency "
                    "is bounded by 1/d here, see strong records"
                    if backend == "cpu" and mode == "weak" else None
                ),
                "rows_per_device": args.rows_per_device,
                "total_rows": N,
                "sites": L,
                "value": round(throughput, 1),
                "unit": "seq*site/s aggregate",
                "step_ms": round(dt * 1e3, 2),
                "efficiency": round(efficiency, 3),
            }
            records.append(record)
            print(json.dumps(record))
            sys.stdout.flush()

    if args.mode in ("weak", "both"):
        run_mode("weak")
    if args.mode in ("strong", "both"):
        run_mode("strong")

    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "metric": "plm_scaling",
                "records": records,
            }, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
