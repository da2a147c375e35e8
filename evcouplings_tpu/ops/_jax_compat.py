"""JAX / optax API compatibility shims for the ops kernels — every
version-dependent name resolution lives here, once."""

import jax

try:
    from jax import shard_map
except ImportError:                      # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # noqa: F401


def pvary(x, axes):
    """Mark a value as varying over the given manual mesh axes.

    jax >= 0.9 deprecates lax.pvary in favor of
    lax.pcast(..., to="varying"); older versions only have pvary.
    """
    try:
        return jax.lax.pcast(x, axes, to="varying")
    except (AttributeError, TypeError):
        return jax.lax.pvary(x, axes)


def tree_norm(tree):
    """optax >= 0.2.5 renames tree_l2_norm to tree_norm (same l2
    default)."""
    import optax

    fn = getattr(optax.tree_utils, "tree_norm", None)
    if fn is None:                       # pragma: no cover - older optax
        fn = optax.tree_utils.tree_l2_norm
    return fn(tree)
