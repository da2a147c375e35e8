"""
Batched Gibbs sampling from Potts models on TPU.

No counterpart exists in the reference (EVcouplings infers models but
cannot draw sequences from them); sampling closes the scientific loop
— sequences generated from a model with known couplings let the whole
inference stack be validated end-to-end — and provides the generative
path for sequence design.

TPU-first design: the sampler state is the one-hot matrix
(S, L*q) so each site update is one (S, Lq) @ (Lq, q) MXU matmul
against the site's coupling rows; a sweep is a `lax.fori_loop` over
sites and the sweep chain a `lax.scan`, all jit-compiled with static
shapes. Categorical draws use the Gumbel trick on jax PRNG keys.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


# the (L, L, q, q) <-> (Lq, Lq) layout is single-sourced in ops.encode
from evcouplings_tpu.ops.encode import flatten_J as _flatten_J


@functools.partial(
    jax.jit, static_argnames=("n_samples", "n_sweeps", "thin")
)
def _gibbs_chain(J_flat, h_flat, key, init_codes, n_samples, n_sweeps,
                 thin, beta):
    lq = h_flat.shape[0]
    L = init_codes.shape[1]
    q = lq // L
    dtype = J_flat.dtype

    def one_hot_flat(codes):
        return jax.nn.one_hot(codes, q, dtype=dtype).reshape(
            n_samples, lq
        )

    def update_site(i, state):
        codes, oh, key = state
        key, subkey = jax.random.split(key)

        # conditional logits of site i for every chain: the site's
        # q coupling rows against the full one-hot context
        rows = jax.lax.dynamic_slice_in_dim(J_flat, i * q, q, 0)
        logits = oh @ rows.T + jax.lax.dynamic_slice_in_dim(
            h_flat, i * q, q, 0
        )[None, :]
        # the site's own context contribution is zero because the
        # diagonal q x q blocks of J are zero by model convention
        new_sym = jax.random.categorical(subkey, beta * logits, axis=-1)

        codes = jax.lax.dynamic_update_slice_in_dim(
            codes, new_sym[:, None].astype(codes.dtype), i, axis=1
        )
        new_block = jax.nn.one_hot(new_sym, q, dtype=dtype)
        oh = jax.lax.dynamic_update_slice_in_dim(
            oh, new_block, i * q, axis=1
        )
        return codes, oh, key

    def sweep(state, _):
        codes, oh, key = jax.lax.fori_loop(
            0, L, update_site, state
        )
        return (codes, oh, key), None

    def thinned_block(state, _):
        state, _ = jax.lax.scan(sweep, state, None, length=thin)
        return state, state[0]

    state = (init_codes, one_hot_flat(init_codes), key)
    n_keep = n_sweeps // thin
    state, kept = jax.lax.scan(
        thinned_block, state, None, length=n_keep
    )
    # remainder sweeps beyond the last thinned block still run, so the
    # final states always reflect exactly n_sweeps sweeps
    rem = n_sweeps % thin
    if rem:
        state, _ = jax.lax.scan(sweep, state, None, length=rem)
    return state[0], kept


def gibbs_sample(J_ij, h_i, n_samples, n_sweeps, key=None, seed=0,
                 init_codes=None, beta=1.0, thin=None,
                 dtype=jnp.float32):
    """Draw sequences from a Potts model by blocked Gibbs sampling.

    Parameters
    ----------
    J_ij : (L, L, q, q) couplings (zero diagonal blocks)
    h_i : (L, q) fields
    n_samples : number of parallel chains (one sequence each)
    n_sweeps : full site sweeps per chain
    key : jax PRNG key (or use `seed`)
    init_codes : optional (n_samples, L) int initial states; random
        uniform if absent
    beta : inverse temperature
    thin : if set, additionally return every `thin`-th sweep of every
        chain (trajectory of shape (n_sweeps//thin, n_samples, L))
    dtype : compute dtype of the logit matmuls

    Returns
    -------
    codes : (n_samples, L) int8 final states
    trajectory : as above, or None when `thin` is None
    """
    J_ij = np.asarray(J_ij)
    h_i = np.asarray(h_i)
    L, q = h_i.shape

    if key is None:
        key = jax.random.PRNGKey(seed)
    if init_codes is None:
        key, subkey = jax.random.split(key)
        init_codes = jax.random.randint(
            subkey, (n_samples, L), 0, q, dtype=jnp.int8
        )
    else:
        init_codes = jnp.asarray(init_codes, dtype=jnp.int8)

    return_traj = thin is not None
    if return_traj and not 0 < thin <= n_sweeps:
        raise ValueError(
            "thin must be in [1, n_sweeps] (got thin={}, "
            "n_sweeps={})".format(thin, n_sweeps)
        )
    thin = thin or max(1, n_sweeps)

    J_flat = _flatten_J(J_ij).astype(dtype)
    h_flat = jnp.asarray(h_i, dtype=dtype).reshape(L * q)

    codes, kept = _gibbs_chain(
        J_flat, h_flat, key, init_codes,
        int(n_samples), int(n_sweeps), int(thin),
        jnp.asarray(beta, dtype=dtype),
    )
    codes = np.asarray(codes, dtype=np.int8)
    return (codes, np.asarray(kept)) if return_traj else (codes, None)


def sample_from_model(model, n_samples, n_sweeps=500, **kwargs):
    """Sample sequences from a CouplingsModel; returns them as strings
    over the model's alphabet."""
    codes, _ = gibbs_sample(
        model.J_ij, model.h_i, n_samples, n_sweeps, **kwargs
    )
    alphabet = np.asarray(model.alphabet)
    return ["".join(alphabet[row]) for row in codes]
