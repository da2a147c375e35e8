"""
Scaling quickstart: the two sharding regimes of the Potts fit on a
device mesh.

1. Data parallel (symmetric fit, plmc semantics): MSA rows shard along
   a "data" axis, J replicated, gradients psum-merged.
2. Data x model parallel (asymmetric fit): sites — rows of J plus
   optimizer state — additionally shard along a "model" axis, for L
   beyond single-chip HBM (the symmetric fit caps out near L~900 on a
   16 GB chip). No collective crosses the model axis during the fit.

    python examples/generate_data.py     # once
    python examples/scaling_quickstart.py

With fewer than 8 real devices the script creates 8 virtual CPU
devices, so the sharding (and its results) can be inspected anywhere;
on a real TPU slice the same code scales across chips.
"""

import os

# virtualize 8 CPU devices BEFORE jax import if no multi-chip platform
# (append so a preexisting XLA_FLAGS value is preserved)
if "--xla_force_host_platform_device_count" not in \
        os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data")


def main():
    import jax

    if os.environ.get("EVCOUPLINGS_JAX_PLATFORM"):
        # explicit platform choice: honor it WITHOUT probing
        # jax.devices() first (probing initializes the default
        # accelerator backend, which the env var exists to avoid)
        jax.config.update(
            "jax_platforms", os.environ["EVCOUPLINGS_JAX_PLATFORM"]
        )
        devices = jax.devices()[:8]
        if len(devices) < 8:
            # the chosen platform has too few chips for the 2x4 mesh:
            # fall back to the 8 virtual CPU devices like below
            jax.config.update("jax_platforms", "cpu")
            devices = jax.devices("cpu")[:8]
    elif len(jax.devices()) < 8:
        # single-chip (or CPU-only) host: fall back to the 8 virtual
        # CPU devices created via XLA_FLAGS above
        jax.config.update("jax_platforms", "cpu")
        devices = jax.devices("cpu")[:8]
    else:
        devices = jax.devices()[:8]
    print("devices:", [str(d) for d in devices])

    from jax.sharding import Mesh

    from evcouplings_tpu.align.alignment import Alignment
    from evcouplings_tpu.ops.plm import PlmConfig, fit_plm
    from evcouplings_tpu.ops.plm_sites import fit_plm_asym
    from evcouplings_tpu.ops.scores import cn_scores
    from evcouplings_tpu.align.alignment import map_matrix

    ali = Alignment.from_path(os.path.join(DATA, "demo_monomer.a2m"))
    codes = map_matrix(ali.matrix, ali.alphabet_map).astype(np.int8)
    N, L = codes.shape
    q = len(ali.alphabet)
    weights = np.ones(N)
    print("alignment: {} x {}, q={}".format(N, L, q))

    # --- regime 1: rows data-parallel over all 8 devices ---
    mesh_dp = Mesh(np.asarray(devices), ("data",))
    res_dp = fit_plm(
        codes, weights, q,
        PlmConfig(solver="lbfgs", max_iter=60, block_size=32,
                  lambda_J=16.0),
        mesh=mesh_dp,
    )
    print("data-parallel symmetric fit: {} iters, loss {:.2f}".format(
        res_dp.num_iter, res_dp.final_loss))

    # --- regime 2: 2 x 4 data x model mesh, site-sharded asym fit ---
    mesh_2d = Mesh(np.asarray(devices).reshape(2, 4),
                   ("data", "model"))
    res_2d = fit_plm_asym(
        codes, weights, q,
        PlmConfig(solver="adam", max_iter=300, block_size=32,
                  steps_per_call=25, lambda_J=16.0),
        mesh=mesh_2d,
    )
    print("data x model asymmetric fit: {} iters, loss {:.2f}".format(
        res_2d.num_iter, res_2d.final_loss))

    # both regimes find the same top couplings
    for name, res in (("dp", res_dp), ("2d", res_2d)):
        cn = cn_scores(res.J_ij)
        ii, jj = np.triu_indices(L, k=1)
        order = np.argsort(cn[ii, jj])[::-1][:4]
        pairs = sorted((int(ii[k]), int(jj[k])) for k in order)
        print("{} top-4 coupled column pairs: {}".format(name, pairs))


if __name__ == "__main__":
    main()
