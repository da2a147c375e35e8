"""
Pallas TPU kernel for O(N^2 L) sequence-identity reweighting.

Replaces the XLA path in evcouplings_tpu.ops.weights for large MSAs:
the XLA one-hot matmul materializes the (N, L*q) one-hot in HBM
(~N*L*q bytes — 3.4 GB for a 1M-row UniRef alignment at L=160), while
this kernel keeps only the int8 code matrix (N*L bytes) in HBM and
expands one-hot blocks on the fly in VMEM, feeding the MXU directly:

  grid (i_block, j_block):
    VMEM <- codes[iB], codes[jB]                  (B x L int8 each)
    for L-chunk: one-hot expand both in VMEM, ids += oh_i @ oh_j^T
    counts[iB] += row-sum(ids >= min_count & j valid)

The (B, N) identity tile never exists; the j grid dimension
accumulates into the (B, 1) per-row counts output block.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evcouplings_tpu.ops.encode import pad_rows

# row-block size: MXU-aligned; two (B, L_CHUNK*q) int8 one-hot blocks
# plus the (B, B) int32 ids tile stay under VMEM. Tuned on TPU v5e
# (N=32768, L=160): 7.5 G row-pairs/s at block 1024 (7.3 at 512),
# while never materializing the one-hot in HBM.
_BLOCK = 1024
# columns expanded per inner step: one-hot width = _L_CHUNK * q
_L_CHUNK = 192

# feasibility budget: 13.5 MB against the ~16 MB scoped-VMEM limit —
# headroom for iota/cast intermediates the estimate does not model
# (the measured-good headline shape L=160, q=21 sits at ~13.0 MB)
_VMEM_BUDGET = int(13.5 * 1024 * 1024)


def kernel_vmem_bytes(L, num_symbols, block=_BLOCK, l_chunk=_L_CHUNK):
    """Approximate scoped-VMEM footprint of one grid step, for tile
    feasibility checks (the dispatch in ops/weights.py and the wrapper
    below both test it against _VMEM_BUDGET)."""
    l_padded = ((L + l_chunk - 1) // l_chunk) * l_chunk
    return (
        # pipelined input code tiles are DOUBLE-buffered by Pallas
        2 * (2 * block * l_padded)                # code tiles (int8)
        + 2 * block * l_chunk * num_symbols       # one-hot (int8)
        + block * block * 4                       # ids tile (int32)
        + block * 4                               # counts
    )


def pad_codes_for_kernel(matrix_mapped, block=_BLOCK, l_chunk=_L_CHUNK):
    """Kernel-contract input layout: rows padded to a block multiple,
    columns padded to the chunk width, padding code -1 everywhere (it
    one-hot-expands to all-zero, contributing no identity counts).
    Shared by the wrapper below and the benchmark harness — the kernel
    REJECTS misaligned shapes rather than truncating them."""
    matrix_mapped = np.asarray(matrix_mapped)
    n, L = matrix_mapped.shape
    codes, _ = pad_rows(matrix_mapped.astype(np.int8), block)
    l_extra = (-L) % l_chunk
    if l_extra:
        codes = np.pad(
            codes, [(0, 0), (0, l_extra)], constant_values=-1
        )
    codes[n:] = -1
    return codes


def _reweight_kernel(ci_ref, cj_ref, out_ref, *, num_symbols,
                     min_count, n_valid, num_l_chunks, block,
                     l_chunk):
    """One (i_block, j_block) tile: accumulate neighbor counts of the
    i-rows against the j-rows."""
    j_blk = pl.program_id(1)
    q = num_symbols
    chunk_cols = l_chunk * q

    def body(chunk, ids):
        start = chunk * l_chunk
        ci = ci_ref[:, pl.ds(start, l_chunk)].astype(jnp.int32)
        cj = cj_ref[:, pl.ds(start, l_chunk)].astype(jnp.int32)

        # 2D one-hot expansion in VMEM (3D->2D reshapes with a non-
        # lane-aligned minor dim don't lower in Mosaic):
        # pltpu.repeat tiles the codes q times along lanes, so column
        # c holds code index c % C and symbol c // C — a column
        # permutation of the canonical one-hot that is identical for
        # both operands and therefore leaves the inner product
        # unchanged. Padding code -1 matches no symbol.
        sym = (
            jax.lax.broadcasted_iota(
                jnp.int32, (block, chunk_cols), 1
            ) // l_chunk
        )
        oh_i = (
            pltpu.repeat(ci, repeats=q, axis=1) == sym
        ).astype(jnp.int8)
        oh_j = (
            pltpu.repeat(cj, repeats=q, axis=1) == sym
        ).astype(jnp.int8)

        # (B, Cq) @ (Cq, B) on the MXU, exact int32 accumulation.
        # Measured on v5e: int8 operands beat bf16 operands here
        # (4.84 vs 7.3 G pairs/s) — the one-hot is VMEM-traffic
        # bound, so halving operand bytes wins over MXU rate.
        return ids + jax.lax.dot_general(
            oh_i, oh_j,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    ids = jax.lax.fori_loop(
        0, num_l_chunks, body,
        jnp.zeros((block, block), dtype=jnp.int32),
    )

    # count neighbors among the valid j rows of this tile
    j_global = j_blk * block + jax.lax.broadcasted_iota(
        jnp.int32, (block, block), 1
    )
    is_neighbor = (ids >= min_count) & (j_global < n_valid)
    partial = jnp.sum(
        is_neighbor.astype(jnp.int32), axis=1, keepdims=True
    )

    # j grid dimension accumulates into the same (B, 1) output block
    @pl.when(j_blk == 0)
    def _():
        out_ref[:] = partial

    @pl.when(j_blk != 0)
    def _():
        out_ref[:] = out_ref[:] + partial


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_symbols", "min_count", "n_valid", "block", "l_chunk",
        "interpret",
    ),
)
def _neighbor_counts_pallas(codes, num_symbols, min_count, n_valid,
                            block=_BLOCK, l_chunk=_L_CHUNK,
                            interpret=False):
    """codes: (N_pad, L_pad) int8, N_pad % block == 0,
    L_pad % l_chunk == 0. Returns (N_pad, 1) int32 neighbor counts."""
    n_pad, l_pad = codes.shape
    if n_pad % block or l_pad % l_chunk:
        # floor-dividing the grid would silently DROP the remainder
        # rows/columns from both operand sides (wrong counts, garbage
        # tail rows) — reject instead
        raise ValueError(
            "codes shape ({}, {}) violates the kernel contract "
            "N_pad % block == 0 and L_pad % l_chunk == 0 (block={}, "
            "l_chunk={}); pad inputs with pad_codes_for_kernel".format(
                n_pad, l_pad, block, l_chunk
            )
        )
    num_blocks = n_pad // block
    num_l_chunks = l_pad // l_chunk

    kernel = functools.partial(
        _reweight_kernel,
        num_symbols=num_symbols,
        min_count=min_count,
        n_valid=n_valid,
        num_l_chunks=num_l_chunks,
        block=block,
        l_chunk=l_chunk,
    )

    flops = 2 * n_pad * n_pad * l_pad * num_symbols
    return pl.pallas_call(
        kernel,
        grid=(num_blocks, num_blocks),
        in_specs=[
            pl.BlockSpec(
                (block, l_pad), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block, l_pad), lambda i, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block, 1), lambda i, j: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            # the grid re-fetches the full j code matrix once per
            # i-block (plus the i tiles and the counts output)
            bytes_accessed=(num_blocks + 1) * n_pad * l_pad
            + 4 * n_pad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(codes, codes)


def num_cluster_members_pallas(matrix_mapped, identity_threshold,
                               block=_BLOCK, l_chunk=_L_CHUNK,
                               interpret=False, num_symbols=None,
                               min_count=None):
    """Cluster sizes (inverse sequence weights) via the Pallas kernel;
    same contract as ops.weights.num_cluster_members. num_symbols /
    min_count may be passed through by a dispatcher that already
    derived them (saves a second host scan of the code matrix)."""
    from evcouplings_tpu.ops.weights import _identity_count_threshold

    matrix_mapped = np.asarray(matrix_mapped)
    n, L = matrix_mapped.shape
    if num_symbols is None:
        num_symbols = int(matrix_mapped.max()) + 1
    if num_symbols > 127:
        # the int8 cast below would wrap codes >= 128 negative, where
        # they silently match nothing (undercounted identities)
        raise ValueError(
            "Pallas reweighting kernel supports at most 127 symbol "
            "codes (got num_symbols={}); use the XLA path".format(
                num_symbols
            )
        )
    if min_count is None:
        min_count = _identity_count_threshold(L, identity_threshold)
    if (not interpret
            and kernel_vmem_bytes(L, num_symbols, block, l_chunk)
            > _VMEM_BUDGET):
        raise ValueError(
            "Pallas reweighting tiles (block={}, l_chunk={}) exceed "
            "the VMEM budget at L={}, q={} ({} > {} bytes); shrink "
            "the tiles or use the XLA path".format(
                block, l_chunk, L, num_symbols,
                kernel_vmem_bytes(L, num_symbols, block, l_chunk),
                _VMEM_BUDGET,
            )
        )

    codes = pad_codes_for_kernel(matrix_mapped, block, l_chunk)
    counts = _neighbor_counts_pallas(
        jnp.asarray(codes), num_symbols, min_count, n,
        block=block, l_chunk=l_chunk, interpret=interpret,
    )
    return np.asarray(counts)[:n, 0].astype(np.float64)
