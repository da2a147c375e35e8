"""JAX API compatibility shims for the ops kernels."""

import jax


def pvary(x, axes):
    """Mark a value as varying over the given manual mesh axes.

    jax >= 0.9 deprecates lax.pvary in favor of
    lax.pcast(..., to="varying"); older versions only have pvary.
    """
    try:
        return jax.lax.pcast(x, axes, to="varying")
    except (AttributeError, TypeError):
        return jax.lax.pvary(x, axes)
