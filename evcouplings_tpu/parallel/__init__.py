"""
Multi-device / multi-host parallelism helpers.

The framework's scaling axis is N (alignment rows): the reweighting
identity counts, frequency counts, and PLM gradients all reduce over
rows, so rows are sharded along one mesh axis ("data"), parameters and
per-site statistics replicated, and per-shard contributions merged
with psum (see BASELINE.md north star; absent from the reference,
which is single-node OpenMP — SURVEY.md §2.8).

Entry points:
- make_mesh(): device mesh with one "data" axis (all local/global
  devices by default)
- distributed_initialize(): jax.distributed bring-up for multi-host
  pod slices
- shard_rows() / replicate(): device_put with the matching shardings
- num_cluster_members_sharded(): row-sharded O(N^2 L) reweighting
- (the PLM fitter takes the mesh directly: ops.plm.fit_plm(mesh=...))
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def distributed_initialize(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Initialize jax.distributed for a multi-host run (no-op for a
    single process). Arguments default to auto-detection from the
    TPU environment."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_devices=None, axis=DATA_AXIS):
    """1D device mesh over the first n_devices global devices (all by
    default), with a single data-parallel axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(n_data=None, n_model=1):
    """2D ("data", "model") mesh: MSA rows shard along "data", sites
    (rows of the directed coupling matrix) along "model" — the mesh
    regime of the site-sharded asymmetric PLM fit
    (ops.plm_sites.fit_plm_asym). n_data defaults to all remaining
    devices after the model axis is carved out."""
    devices = jax.devices()
    n_model = int(n_model or 1)
    if n_data is None:
        n_data = max(1, len(devices) // n_model)
    total = n_data * n_model
    if total > len(devices):
        raise ValueError(
            "Mesh {}x{} needs {} devices, only {} available".format(
                n_data, n_model, total, len(devices))
        )
    return Mesh(
        np.asarray(devices[:total]).reshape(n_data, n_model),
        (DATA_AXIS, "model"),
    )


def data_sharding(mesh, axis=DATA_AXIS):
    """Rows sharded along the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh):
    """Fully replicated across the mesh."""
    return NamedSharding(mesh, P())


def shard_rows(array, mesh, axis=DATA_AXIS, pad_multiple=None):
    """Put an array on the mesh with axis 0 sharded (optionally padding
    axis 0 to a multiple of mesh size x pad_multiple first).

    Returns (sharded array, original row count).
    """
    from evcouplings_tpu.ops.encode import pad_rows

    array, n = pad_rows(
        np.asarray(array), mesh.devices.size * (pad_multiple or 1)
    )
    return jax.device_put(array, data_sharding(mesh, axis)), n


def replicate(tree, mesh):
    """Replicate a pytree across the mesh."""
    return jax.device_put(tree, replicated_sharding(mesh))


def num_cluster_members_sharded(matrix_mapped, identity_threshold,
                                mesh=None, block_size=1024):
    """Row-sharded sequence reweighting: each device computes the
    neighbor counts of its row shard against the full (replicated)
    code matrix; no collective needed for the counts themselves.

    Same contract as ops.weights.num_cluster_members.
    """
    from evcouplings_tpu.ops._jax_compat import shard_map

    from evcouplings_tpu.ops.encode import pad_rows
    from evcouplings_tpu.ops.weights import (
        _identity_count_threshold,
        _neighbor_count_scan,
    )

    if mesh is None:
        mesh = make_mesh()

    matrix_mapped = np.asarray(matrix_mapped)
    n, L = matrix_mapped.shape
    num_symbols = int(matrix_mapped.max()) + 1
    min_count = _identity_count_threshold(L, identity_threshold)

    n_dev = mesh.devices.size
    block = min(block_size, max(8, ((n + 7) // 8) * 8))
    codes, _ = pad_rows(
        matrix_mapped.astype(np.int8), block * n_dev
    )

    codes_sharded = jax.device_put(
        jnp.asarray(codes), data_sharding(mesh)
    )
    codes_full = jax.device_put(
        jnp.asarray(codes), replicated_sharding(mesh)
    )

    def shard_fn(rows_local, all_codes):
        # count neighbors of the local rows against all valid rows —
        # the same blocked core as the single-device kernel
        # (ops.weights._neighbor_count_scan), with the column operand
        # being the full replicated matrix
        oh_all = jax.nn.one_hot(
            all_codes, num_symbols, dtype=jnp.int8
        ).reshape(all_codes.shape[0], -1)
        return _neighbor_count_scan(
            rows_local, oh_all, min_count, num_symbols, block, n
        )

    counts = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
    ))(codes_sharded, codes_full)

    return np.asarray(counts)[:n].astype(np.float64)
