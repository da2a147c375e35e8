"""
MSA integer/one-hot encodings for accelerator kernels.

The alignment's character matrix is remapped to integer codes on the host
(align.alignment.map_matrix); these helpers move codes onto the device and
expand to one-hot where a kernel wants MXU-shaped operands.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def device_codes(matrix_mapped, dtype=jnp.int8):
    """Move an integer-coded MSA (N x L) onto the default device.

    int8 is sufficient for q <= 127 symbol alphabets and quarters HBM
    traffic relative to int32.
    """
    return jnp.asarray(np.asarray(matrix_mapped), dtype=dtype)


@functools.partial(jax.jit, static_argnames=("num_symbols", "dtype"))
def one_hot(codes, num_symbols, dtype=jnp.float32):
    """One-hot encode integer codes: (...,) -> (..., num_symbols)."""
    return jax.nn.one_hot(codes, num_symbols, dtype=dtype)


def pad_rows(array, multiple):
    """Pad axis 0 of a numpy array with zeros up to a multiple of `multiple`.

    Returns (padded_array, original_length). Static-shape padding keeps XLA
    from recompiling per MSA size and keeps tiles MXU-aligned.
    """
    n = array.shape[0]
    n_pad = (-n) % multiple
    if n_pad == 0:
        return array, n
    pad_width = [(0, n_pad)] + [(0, 0)] * (array.ndim - 1)
    return np.pad(array, pad_width), n


def flatten_J(J_ij):
    """(L, L, q, q) coupling tensor -> flat (Lq, Lq) matrix with
    J_flat[(i, a), (j, b)] = J[i, j, a, b].

    THE layout invariant tying the PLM fitters, Hamiltonian kernels,
    and samplers together — conditional logits for a one-hot row are
    then plain matrix products against this matrix. Single-sourced
    here so the transpose convention cannot drift between modules.
    """
    L, _, q, _ = J_ij.shape
    return jnp.asarray(J_ij).transpose(0, 2, 1, 3).reshape(L * q, L * q)


def unflatten_J(J_flat, L, q, zero_diag=True):
    """Inverse of flatten_J: (Lq, Lq) -> (L, L, q, q) float64 numpy,
    optionally zeroing the L diagonal q x q self-blocks (they carry no
    meaning in the pair-coupling tensor)."""
    # an OWNED writable copy: np.asarray would alias the input (the
    # diagonal zeroing then mutates the caller's array in place) or,
    # for jax-backed f64 arrays, yield a read-only view that crashes
    # the assignment
    J = np.array(J_flat, dtype=np.float64, copy=True).reshape(
        L, q, L, q
    ).transpose(0, 2, 1, 3)
    if zero_diag:
        J[np.arange(L), np.arange(L)] = 0.0
    return J
