"""
Weighted single-site and pairwise symbol frequencies on the MXU.

Replaces the reference numba kernels `frequencies`
(evcouplings/align/alignment.py:1078-1106) and `pair_frequencies`
(alignment.py:1109-1153).

TPU-first design: f_i is a weighted one-hot reduction over sequences;
f_ij is the Gram matrix of the weighted one-hot MSA,
  f_ij[i,j,a,b] = sum_n w_n onehot[n,i,a] onehot[n,j,b]
  => (L*q, N) @ (N, L*q) matmul,
blocked over N via lax.scan so the one-hot never exceeds a fixed working
set. Counts accumulate in float32 (tree-reduced by XLA); pass
dtype=jnp.float64 on a CPU/x64 backend for bit-level parity work.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from evcouplings_tpu.ops.encode import pad_rows


@functools.partial(
    jax.jit, static_argnames=("num_symbols", "block_size", "dtype")
)
def _fi_kernel(codes, weights, num_symbols, block_size, dtype):
    n_pad, L = codes.shape
    num_blocks = n_pad // block_size

    def body(acc, block_idx):
        start = block_idx * block_size
        c = jax.lax.dynamic_slice_in_dim(codes, start, block_size, 0)
        w = jax.lax.dynamic_slice_in_dim(weights, start, block_size, 0)
        oh = jax.nn.one_hot(c, num_symbols, dtype=dtype)  # (B, L, q)
        return acc + jnp.einsum(
            "n,nlq->lq", w.astype(dtype), oh,
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        ), None

    init = jnp.zeros((L, num_symbols), dtype=dtype)
    acc, _ = jax.lax.scan(
        body, init, jnp.arange(num_blocks, dtype=jnp.int32)
    )
    return acc


def frequencies(matrix_mapped, seq_weights, num_symbols, dtype=jnp.float32):
    """Weighted relative single-site frequencies, (L x num_symbols).

    Parity: reference alignment.py:1078-1106 (normalized by sum of weights).
    """
    matrix_mapped = np.asarray(matrix_mapped)
    seq_weights = np.asarray(seq_weights, dtype=np.float64)
    n, L = matrix_mapped.shape

    block = min(8192, max(8, ((n + 7) // 8) * 8))
    codes, _ = pad_rows(matrix_mapped.astype(np.int8), block)
    w, _ = pad_rows(seq_weights, block)  # zero-weighted padding rows

    # weights enter in the KERNEL dtype: a hard float32 cast would
    # defeat the documented dtype=jnp.float64 bit-parity mode
    fi = _fi_kernel(
        jnp.asarray(codes), jnp.asarray(w, dtype=dtype),
        num_symbols, block, dtype,
    )
    return np.asarray(fi, dtype=np.float64) / seq_weights.sum()


@functools.partial(
    jax.jit, static_argnames=("num_symbols", "block_size", "dtype")
)
def _fij_kernel(codes, weights, num_symbols, block_size, dtype):
    n_pad, L = codes.shape
    num_blocks = n_pad // block_size
    lq = L * num_symbols

    def body(acc, block_idx):
        start = block_idx * block_size
        c = jax.lax.dynamic_slice_in_dim(codes, start, block_size, 0)
        w = jax.lax.dynamic_slice_in_dim(weights, start, block_size, 0)
        oh = jax.nn.one_hot(c, num_symbols, dtype=dtype).reshape(-1, lq)
        oh_w = oh * w.astype(dtype)[:, None]
        # (Lq, B) @ (B, Lq) on the MXU
        return acc + jax.lax.dot_general(
            oh_w, oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        ), None

    init = jnp.zeros((lq, lq), dtype=dtype)
    acc, _ = jax.lax.scan(
        body, init, jnp.arange(num_blocks, dtype=jnp.int32)
    )
    return acc.reshape(L, num_symbols, L, num_symbols).transpose(0, 2, 1, 3)


def pair_frequencies(matrix_mapped, seq_weights, num_symbols, fi,
                     dtype=jnp.float32):
    """Weighted relative pairwise frequencies, (L x L x q x q).

    The diagonal blocks are overwritten with f_ij[i,i,a,a] = f_i[i,a]
    (zero elsewhere), matching reference alignment.py:1109-1153.
    """
    matrix_mapped = np.asarray(matrix_mapped)
    seq_weights = np.asarray(seq_weights, dtype=np.float64)
    n, L = matrix_mapped.shape

    block = min(4096, max(8, ((n + 7) // 8) * 8))
    codes, _ = pad_rows(matrix_mapped.astype(np.int8), block)
    w, _ = pad_rows(seq_weights, block)

    fij = np.asarray(
        _fij_kernel(
            jnp.asarray(codes), jnp.asarray(w, dtype=dtype),
            num_symbols, block, dtype,
        ),
        dtype=np.float64,
    ) / seq_weights.sum()

    # replace diagonal blocks: f_ij[i,i,a,b] = f_i[i,a] * delta_ab
    idx = np.arange(L)
    diag = np.zeros((L, num_symbols, num_symbols))
    diag[:, np.arange(num_symbols), np.arange(num_symbols)] = np.asarray(fi)
    fij[idx, idx] = diag
    return fij
