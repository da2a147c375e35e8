"""
Data-parallel scaling benchmark for the PLM fitter (BASELINE.md
scaling target: >= 0.8 weak-scaling efficiency at >= 2 hosts with MSA
rows sharded over the mesh and gradients psum-merged).

Weak scaling: every device receives a fixed number of rows
(N_PER_DEVICE), so the ideal aggregate throughput grows linearly with
the mesh size; efficiency = (throughput_d / d) / throughput_1.

On a real pod slice this measures ICI collective overhead. On a single
chip (or CPU) it can still be run with virtual devices
(--virtual N sets XLA_FLAGS=--xla_force_host_platform_device_count=N
and forces the CPU backend), which validates the sharded program and
collective layout but measures host-parallel rather than ICI scaling
— the numbers are then labeled backend "cpu" accordingly.

Prints one JSON line per mesh size:
  {"metric": "plm_weak_scaling", "devices": d,
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

    records = []
    base_throughput = None
    for d in mesh_sizes:
        mesh = make_mesh(d)
        N = args.rows_per_device * d

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
        dt = (time.perf_counter() - t0) / args.steps

        throughput = N * L / dt
        if base_throughput is None:
            base_throughput = throughput
        efficiency = (throughput / d) / base_throughput

        record = {
            "metric": "plm_weak_scaling",
            "devices": d,
            "backend": backend,
            # virtual CPU devices SHARE the host's cores, so weak
            # scaling cannot be efficient there by construction — the
            # cpu numbers validate the sharded program + collective
            # layout, not ICI scaling (see module docstring)
            "note": (
                "virtual devices share host cores; validates program, "
                "not ICI scaling" if backend == "cpu" else None
            ),
            "rows_per_device": args.rows_per_device,
            "sites": L,
            "value": round(throughput, 1),
            "unit": "seq*site/s aggregate",
            "step_ms": round(dt * 1e3, 2),
            "efficiency": round(efficiency, 3),
        }
        records.append(record)
        print(json.dumps(record))
        sys.stdout.flush()

    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "metric": "plm_weak_scaling",
                "records": records,
            }, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
