"""
Evolutionary-coupling scores: Frobenius norm (FN), APC-corrected norm (CN),
mutual information (raw/APC).

Replaces the score computation in reference
evcouplings/couplings/model.py:744-827 (`apc`, `_calculate_ecs`).
FN/CN definitions follow Ekeberg et al., Phys Rev E, 2013; APC follows
Dunn et al., Bioinformatics, 2008.
"""

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
