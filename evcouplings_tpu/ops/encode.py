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
