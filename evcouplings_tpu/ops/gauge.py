"""
Zero-sum gauge transform of the coupling tensor.

Replaces the reference numba kernel `_zero_sum_gauge`
(evcouplings/couplings/model.py:179-233): for each pair (i, j),
J0[i,j,a,b] = J[i,j,a,b] - mean_a J[i,j,:,b]... specifically
row/column/total mean subtraction so every ij-submatrix has zero row and
column sums. Fully vectorized over (L, L, q, q); the diagonal blocks
(i == j) stay zero.
"""

import numpy as np
import jax.numpy as jnp


def zero_sum_gauge(J_ij):
    """Vectorized zero-sum gauge (numpy host path, dtype-preserving)."""
    J_ij = np.asarray(J_ij)
    L = J_ij.shape[0]

    avg_a = J_ij.mean(axis=3, keepdims=True)      # mean over b: (L,L,q,1)
    avg_b = J_ij.mean(axis=2, keepdims=True)      # mean over a: (L,L,1,q)
    avg_ab = J_ij.mean(axis=(2, 3), keepdims=True)

    J0 = J_ij - avg_a - avg_b + avg_ab
    J0[np.arange(L), np.arange(L)] = 0.0
    return J0


def zero_sum_gauge_device(J_ij):
    """JAX device path (jit-compatible; used inside the fitter/scores)."""
    L = J_ij.shape[0]
    avg_a = jnp.mean(J_ij, axis=3, keepdims=True)
    avg_b = jnp.mean(J_ij, axis=2, keepdims=True)
    avg_ab = jnp.mean(J_ij, axis=(2, 3), keepdims=True)
    J0 = J_ij - avg_a - avg_b + avg_ab
    eye = jnp.eye(L, dtype=bool)[:, :, None, None]
    return jnp.where(eye, 0.0, J0)
