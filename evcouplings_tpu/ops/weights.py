"""
O(N^2 L) sequence-identity reweighting on the MXU.

Replaces the reference numba kernels `num_cluster_members`
(evcouplings/align/alignment.py:1192-1233) and `identities_to_seq`
(alignment.py:1156-1189).

TPU-first design: the pairwise identity count between two integer-coded
sequences equals the inner product of their one-hot encodings, so the whole
N x N identity matrix is a (N, L*q) @ (L*q, N) int8 matmul with int32
accumulation — exact integer arithmetic on the MXU. The N x N matrix is
never materialized: rows are processed in static-size blocks via lax.scan,
and each (B, N) tile is immediately thresholded and reduced to per-row
neighbor counts. Across a device mesh, rows are sharded along the "data"
axis and the per-row counts need no collective (each row's count only needs
the full matrix, which is replicated); see evcouplings_tpu.parallel for the
sharded wrapper.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from evcouplings_tpu.ops.encode import pad_rows


def _identity_count_threshold(L, identity_threshold):
    """Smallest integer k with k / L >= identity_threshold (exact, f64).

    Thresholding integer identity counts against an integer cutoff avoids
    any float-division edge cases on device.
    """
    k = int(math.ceil(identity_threshold * L))
    while k > 0 and (k - 1) / L >= identity_threshold:
        k -= 1
    while k <= L and k / L < identity_threshold:
        k += 1
    return k


def _neighbor_count_scan(rows, oh_cols, min_identity_count,
                         num_symbols, block_size, n_valid_cols,
                         rows_are_onehot=False):
    """Blocked neighbor-count core shared by the single-device kernel
    and the row-sharded wrapper (parallel.num_cluster_members_sharded):
    counts, for each row of `rows`, the columns of `oh_cols` (an
    (N_cols, Lq) int8 one-hot) whose identity reaches the cutoff.

    rows: (n_rows, L) int8 codes — or, with rows_are_onehot, their
    precomputed (n_rows, Lq) one-hot. Columns >= n_valid_cols are
    padding and never count. Returns (n_rows,) int32.
    """
    n_rows = rows.shape[0]
    n_cols = oh_cols.shape[0]

    # mask so padding columns never count as neighbors of valid rows
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (1, n_cols), 1)
        < n_valid_cols
    )

    num_blocks = n_rows // block_size

    def body(_, block_idx):
        start = block_idx * block_size
        blk = jax.lax.dynamic_slice_in_dim(
            rows, start, block_size, axis=0
        )
        oh_rows = blk if rows_are_onehot else jax.nn.one_hot(
            blk, num_symbols, dtype=jnp.int8
        ).reshape(block_size, -1)
        # (B, Lq) @ (Lq, N) on the MXU, exact int32 accumulation
        ids = jax.lax.dot_general(
            oh_rows, oh_cols,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        is_neighbor = (ids >= min_identity_count) & valid
        return None, jnp.sum(is_neighbor.astype(jnp.int32), axis=1)

    _, counts = jax.lax.scan(
        body, None, jnp.arange(num_blocks, dtype=jnp.int32)
    )
    return counts.reshape(n_rows)


@functools.partial(
    jax.jit, static_argnames=("num_symbols", "block_size", "n_valid")
)
def _neighbor_counts(codes, min_identity_count, num_symbols, block_size,
                     n_valid):
    """Per-sequence neighbor counts at an integer identity cutoff.

    codes : (N_pad, L) int8 device array (rows >= n_valid are padding)
    Returns (N_pad,) int32 neighbor counts (padding rows contain garbage).
    """
    n_pad, L = codes.shape
    oh = jax.nn.one_hot(codes, num_symbols, dtype=jnp.int8)  # (N_pad, L, q)
    oh = oh.reshape(n_pad, L * num_symbols)
    return _neighbor_count_scan(
        oh, oh, min_identity_count, num_symbols, block_size, n_valid,
        rows_are_onehot=True,
    )


def _pick_block_size(n, L, num_symbols):
    """Row-block size: MXU-aligned, bounded so the (B, N) int32 tile and the
    (B, Lq) operand stay comfortably inside HBM headroom."""
    # target <= ~256 MB for the (B, N) int32 identity tile
    max_rows_tile = max(256 * 1024 * 1024 // max(4 * n, 1), 8)
    b = min(4096, max_rows_tile, n)
    # round down to a multiple of 8 (f32 sublane) but at least 8
    return max(8, (b // 8) * 8)


def _use_pallas_path(n, L, num_symbols):
    """Use the Pallas streaming kernel on real TPU hardware for large
    alignments (avoids the N x L*q one-hot in HBM and is faster there);
    the XLA path remains the default elsewhere (CPU tests, small N).

    The kernel's VMEM footprint grows with L (two full (block, L) code
    tiles plus the one-hot chunk tiles and the (block, block) int32
    ids tile), so long alignments (e.g. concatenated complexes) must
    stay on the XLA path rather than fail Mosaic compilation against
    the ~16 MB VMEM limit."""
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return False
    if platform not in ("tpu", "axon") or n < 4096:
        return False
    if num_symbols > 127:
        # the kernel's int8 code cast cannot represent larger codes
        return False

    # tile feasibility lives next to the kernel (shared formula)
    from evcouplings_tpu.ops.weights_pallas import (
        _VMEM_BUDGET, kernel_vmem_bytes,
    )

    return kernel_vmem_bytes(L, num_symbols) <= _VMEM_BUDGET


def num_cluster_members(matrix_mapped, identity_threshold):
    """Number of cluster members (inverse sequence weight) per sequence.

    For each sequence, counts sequences (including itself) with pairwise
    identity >= identity_threshold; identity is #matching columns / L with
    gap symbols participating (reference alignment.py:1192-1233 semantics).

    Parameters
    ----------
    matrix_mapped : np.array (N, L) of int codes
    identity_threshold : float

    Returns
    -------
    np.array (N,) float64 — cluster sizes (>= 1.0)
    """
    matrix_mapped = np.asarray(matrix_mapped)
    n, L = matrix_mapped.shape
    num_symbols = int(matrix_mapped.max()) + 1

    min_count = _identity_count_threshold(L, identity_threshold)

    if _use_pallas_path(n, L, num_symbols):
        from evcouplings_tpu.ops.weights_pallas import (
            num_cluster_members_pallas,
        )

        return num_cluster_members_pallas(
            matrix_mapped, identity_threshold,
            num_symbols=num_symbols, min_count=min_count,
        )

    block = _pick_block_size(n, L, num_symbols)
    padded, _ = pad_rows(matrix_mapped.astype(np.int8), block)

    counts = _neighbor_counts(
        jnp.asarray(padded), min_count, num_symbols, block, n
    )
    return np.asarray(counts)[:n].astype(np.float64)


@functools.partial(jax.jit, static_argnames=("num_symbols",))
def _identities_kernel(seq_codes, codes, num_symbols):
    oh_m = jax.nn.one_hot(codes, num_symbols, dtype=jnp.int8)
    oh_s = jax.nn.one_hot(seq_codes, num_symbols, dtype=jnp.int8)
    n, L = codes.shape
    return jax.lax.dot_general(
        oh_m.reshape(n, -1), oh_s.reshape(-1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def identities_to_seq(seq_mapped, matrix_mapped):
    """Number of identities of every alignment row to a target sequence.

    Parity: reference alignment.py:1156-1189.
    """
    matrix_mapped = np.asarray(matrix_mapped)
    seq_mapped = np.asarray(seq_mapped)
    num_symbols = int(max(matrix_mapped.max(), seq_mapped.max())) + 1
    ids = _identities_kernel(
        jnp.asarray(seq_mapped.astype(np.int8)),
        jnp.asarray(matrix_mapped.astype(np.int8)),
        num_symbols,
    )
    return np.asarray(ids).astype(np.float64)
