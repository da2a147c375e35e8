"""
Evolutionary-coupling scores: Frobenius norm (FN), APC-corrected norm (CN),
mutual information (raw/APC).

Replaces the score computation in reference
evcouplings/couplings/model.py:744-827 (`apc`, `_calculate_ecs`).
FN/CN definitions follow Ekeberg et al., Phys Rev E, 2013; APC follows
Dunn et al., Bioinformatics, 2008.
"""

import functools

import jax
import numpy as np
import jax.numpy as jnp

from evcouplings_tpu.ops.gauge import zero_sum_gauge, zero_sum_gauge_device


def apc(matrix):
    """Average product correction with zeroed diagonal.

    Uses the reference's finite-size convention: column means and the total
    mean are rescaled by L / (L - 1) (reference model.py:744-775).
    """
    matrix = np.asarray(matrix)
    L = matrix.shape[0]
    if L != matrix.shape[1]:
        raise ValueError("Input matrix is not symmetric: {}".format(matrix.shape))

    col_means = matrix.mean(axis=0) * L / (L - 1)
    matrix_mean = matrix.mean() * L / (L - 1)

    correction = np.outer(col_means, col_means) / matrix_mean
    corrected = matrix - correction
    corrected[np.diag_indices(L)] = 0
    return corrected


def fn_scores(J_ij):
    """Frobenius norms of the zero-sum-gauge couplings, (L, L), zero diag."""
    J0 = zero_sum_gauge(J_ij)
    return np.sqrt(np.sum(J0 ** 2, axis=(2, 3)))


def cn_scores(J_ij):
    """APC-corrected Frobenius norm scores."""
    return apc(fn_scores(J_ij))


def mi_scores(f_ij, f_i):
    """Mutual information per pair from pair/single frequencies, (L, L).

    MI[i,j] = sum_{a,b: f_ij>0} f_ij log(f_ij / (f_i(a) f_j(b))); the
    diagonal is zeroed (it would be the column entropy otherwise) to match
    the reference, which only fills i < j.
    """
    f_ij = np.asarray(f_ij)
    f_i = np.asarray(f_i)
    L = f_i.shape[0]

    m = f_i[:, None, :, None] * f_i[None, :, None, :]   # (L, L, q, q)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(f_ij > 0, f_ij / np.where(m > 0, m, 1.0), 1.0)
        terms = np.where(f_ij > 0, f_ij * np.log(ratio), 0.0)
    mi = terms.sum(axis=(2, 3))
    mi[np.diag_indices(L)] = 0.0
    return mi


def all_scores(J_ij, f_ij, f_i):
    """Convenience: (fn, cn, mi_raw, mi_apc) with a single gauge pass."""
    fn = fn_scores(J_ij)
    cn = apc(fn)
    mi_raw = mi_scores(f_ij, f_i)
    mi_apc = apc(mi_raw)
    return fn, cn, mi_raw, mi_apc


# ---------------------------------------------------------------------------
# JAX device path (used for scoring directly after a device-side fit)
# ---------------------------------------------------------------------------

def apc_device(matrix):
    L = matrix.shape[0]
    col_means = jnp.mean(matrix, axis=0) * L / (L - 1)
    matrix_mean = jnp.mean(matrix) * L / (L - 1)
    corrected = matrix - jnp.outer(col_means, col_means) / matrix_mean
    return jnp.where(jnp.eye(L, dtype=bool), 0.0, corrected)


def fn_cn_scores_device(J_ij):
    """FN + CN scores on device from an (L, L, q, q) coupling tensor."""
    J0 = zero_sum_gauge_device(J_ij)
    fn = jnp.sqrt(jnp.sum(J0 ** 2, axis=(2, 3)))
    return fn, apc_device(fn)


def mi_scores_device(f_ij, f_i):
    """Device-side mutual information, same semantics as mi_scores
    (terms counted only where f_ij > 0, diagonal zeroed)."""
    L = f_i.shape[0]
    m = f_i[:, None, :, None] * f_i[None, :, None, :]
    live = f_ij > 0
    ratio = jnp.where(live, f_ij, 1.0) / jnp.where(m > 0, m, 1.0)
    mi = jnp.sum(
        jnp.where(live, f_ij * jnp.log(ratio), 0.0), axis=(2, 3)
    )
    return jnp.where(jnp.eye(L, dtype=bool), 0.0, mi)


@functools.partial(
    jax.jit,
    static_argnames=(
        "min_identity_count", "num_symbols", "block_size", "n_valid"
    ),
)
def _mi_apc_fused(codes, min_identity_count, num_symbols, block_size,
                  n_valid):
    """The whole MI+APC scoring chain as ONE device dispatch:
    identity-threshold reweighting -> weighted f_i / f_ij -> MI -> APC.

    Fusing matters off the hot path too: the step-by-step chain
    (ops.weights -> ops.frequencies -> mi_scores -> apc) makes five
    dispatches with host round-trips between them, including a ~32 MB
    f_ij fetch — through the remote TPU tunnel that is ~0.8 s of
    latency for ~15 ms of compute at N=4096, L=96. One dispatch
    returns only the two (L, L) score matrices.

    codes: (N_pad, L) int8, rows >= n_valid are padding. Returns
    (mi_raw, mi_apc), float32.
    """
    from evcouplings_tpu.ops.weights import _neighbor_count_scan

    n_pad, L = codes.shape
    lq = L * num_symbols

    oh8 = jax.nn.one_hot(codes, num_symbols, dtype=jnp.int8).reshape(
        n_pad, lq
    )
    counts = _neighbor_count_scan(
        oh8, oh8, min_identity_count, num_symbols, block_size, n_valid,
        rows_are_onehot=True,
    )
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (n_pad,), 0) < n_valid
    )
    w = jnp.where(
        valid, 1.0 / jnp.maximum(counts, 1).astype(jnp.float32), 0.0
    )

    oh = oh8.astype(jnp.float32)
    w_sum = jnp.sum(w)
    fi = (
        jax.lax.dot_general(
            w, oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(L, num_symbols)
        / w_sum
    )
    fij = (
        jax.lax.dot_general(
            oh * w[:, None], oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(L, num_symbols, L, num_symbols).transpose(0, 2, 1, 3)
        / w_sum
    )
    # diagonal blocks: f_ij[i,i,a,b] = f_i[i,a] * delta_ab
    diag = fi[:, :, None] * jnp.eye(num_symbols, dtype=fi.dtype)
    fij = jnp.where(
        jnp.eye(L, dtype=bool)[:, :, None, None], diag[:, None], fij
    )

    mi_raw = mi_scores_device(fij, fi)
    return mi_raw, apc_device(mi_raw)


def mi_apc_from_codes(matrix_mapped, identity_threshold,
                      num_symbols=None):
    """MI + APC coupling scores straight from an integer-coded MSA in
    one device dispatch (reweighting at identity_threshold, weighted
    frequency counts, mutual information, APC).

    Numerics are float32 on device (vs the float64 host chain through
    ops.frequencies); EC rank agreement is gated by
    tests/test_ops.py. Returns (mi_raw, mi_apc) as float64 numpy.
    """
    from evcouplings_tpu.ops.encode import pad_rows
    from evcouplings_tpu.ops.weights import (
        _identity_count_threshold, _pick_block_size,
    )

    matrix_mapped = np.asarray(matrix_mapped)
    n, L = matrix_mapped.shape
    if num_symbols is None:
        num_symbols = int(matrix_mapped.max()) + 1

    block = _pick_block_size(n, L, num_symbols)
    padded, _ = pad_rows(matrix_mapped.astype(np.int8), block)
    mi_raw, mi_apc = _mi_apc_fused(
        jnp.asarray(padded),
        _identity_count_threshold(L, identity_threshold),
        num_symbols, block, n,
    )
    return (
        np.asarray(mi_raw, dtype=np.float64),
        np.asarray(mi_apc, dtype=np.float64),
    )
