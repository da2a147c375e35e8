"""
Mean-field DCA numeric kernels: covariance build, coupling/field
extraction, and direct information.

Replaces the reference numba kernels in
evcouplings/couplings/mean_field.py — `compute_covariance_matrix`
(:896-939), `reshape_invC_to_4d` (:942-973), `fields` (:976-1014),
`tilde_fields` (:791-838), `direct_information` (:841-893).

Design: all O(L^2 q^2) work is expressed as batched tensor ops.
The per-pair two-site fixed-point iteration of direct information is run
for ALL L(L-1)/2 pairs simultaneously as batched (P, q, q) x (P, q)
matmuls with a per-pair freeze mask, instead of the reference's nested
Python loop — identical per-pair results (each pair's iterates are
independent and are frozen at exactly its own convergence step), but the
work is a handful of large GEMMs per sweep. Host path is float64 numpy
for bit-stable parity; `direct_information_device` provides the jitted
JAX variant for on-device scoring.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp


def compute_covariance_matrix(f_i, f_ij):
    """Excess pair correlations, flattened to (L*(q-1), L*(q-1)).

    C[(i,a),(j,b)] = f_ij[i,j,a,b] - f_i[i,a] * f_i[j,b], with the last
    symbol dropped (its covariances are constrained to zero, which makes
    the matrix invertible). Index layout is i*(q-1)+a, matching the
    reference's `_flatten_index` (mean_field.py:22-37).
    """
    f_i = np.asarray(f_i, dtype=np.float64)
    f_ij = np.asarray(f_ij, dtype=np.float64)
    L, q = f_i.shape
    fm = f_i[:, : q - 1]

    C = f_ij[:, :, : q - 1, : q - 1] - fm[:, None, :, None] * fm[None, :, None, :]
    # (L, L, q-1, q-1) -> (L, q-1, L, q-1) -> flat
    return np.ascontiguousarray(C.transpose(0, 2, 1, 3)).reshape(
        L * (q - 1), L * (q - 1)
    )


def reshape_invC_to_4d(inv_cov_matrix, L, num_symbols):
    """Un-flatten the (L*(q-1))^2 matrix to (L, L, q, q), zero-padding
    the dropped last symbol."""
    q = num_symbols
    J = np.zeros((L, L, q, q))
    J[:, :, : q - 1, : q - 1] = (
        np.asarray(inv_cov_matrix)
        .reshape(L, q - 1, L, q - 1)
        .transpose(0, 2, 1, 3)
    )
    return J


def fields_from_couplings(J_ij, f_i):
    """Single-site fields of the mean-field model, (L, q).

    h_i = log(f_i / f_i[:, -1]) - sum_{j != i} J_ij[i,j] @ f_i[j]
    (reference mean_field.py:976-1014), with the j-sum as one einsum and
    the j == i term subtracted back out.
    """
    J_ij = np.asarray(J_ij, dtype=np.float64)
    f_i = np.asarray(f_i, dtype=np.float64)
    L = f_i.shape[0]

    log_fi = np.log(f_i / f_i[:, -1][:, None])
    total = np.einsum("ijab,jb->ia", J_ij, f_i)
    diag = np.einsum("iab,ib->ia", J_ij[np.arange(L), np.arange(L)], f_i)
    return log_fi - (total - diag)


def tilde_fields(J_ij, f_i, f_j, epsilon=1e-4):
    """h-tilde fields of the two-site model for one pair (fixed point).

    J_ij — despite the name, kept for keyword compatibility with the
    reference signature (mean_field.py:792) — receives the
    EXPONENTIATED couplings W = exp(J[i, j]) (q, q): the reference's
    own direct_information passes np.exp(J_ij[i, j]) (:869-871).
    Iterates
      h_i <- normalize(f_i / (h_j @ W^T)),  h_j <- normalize(f_j / (h_i @ W))
    until max|update| <= epsilon (reference mean_field.py:791-838; the
    reference's object method passes mismatched arguments and is unusable
    as-is — this takes the corrected inputs).
    """
    W_ij = np.asarray(J_ij, dtype=np.float64)
    f_i = np.asarray(f_i, dtype=np.float64).reshape(1, -1)
    f_j = np.asarray(f_j, dtype=np.float64).reshape(1, -1)
    q = f_i.shape[1]

    h_i = np.full((1, q), 1.0 / q)
    h_j = np.full((1, q), 1.0 / q)

    diff = np.inf
    sweeps = 0
    # same termination guard as direct_information: pathological
    # fixed points must not spin forever
    max_sweeps = 10000
    while diff > epsilon and sweeps < max_sweeps:
        h_i_new = f_i / (h_j @ W_ij.T)
        h_i_new /= h_i_new.sum()
        h_j_new = f_j / (h_i @ W_ij)
        h_j_new /= h_j_new.sum()
        diff = max(
            np.abs(h_i_new - h_i).max(), np.abs(h_j_new - h_j).max()
        )
        h_i, h_j = h_i_new, h_j_new
        sweeps += 1

    if diff > epsilon:
        import warnings

        warnings.warn(
            "tilde_fields did not reach the epsilon={} fixed-point "
            "criterion within {} sweeps (last update {})".format(
                epsilon, max_sweeps, diff
            ),
            RuntimeWarning,
        )

    return h_i, h_j


_TINY = 1.0e-100


def direct_information(J_ij, f_i, epsilon=1e-4, max_sweeps=10000):
    """Direct information matrix, (L, L), symmetric, zero diagonal.

    All pairs iterate their two-site fixed point simultaneously; a pair
    freezes at its own convergence sweep, reproducing the reference's
    per-pair while loop (mean_field.py:841-893) exactly.
    """
    J_ij = np.asarray(J_ij, dtype=np.float64)
    f_i = np.asarray(f_i, dtype=np.float64)
    L, q = f_i.shape

    ii, jj = np.triu_indices(L, k=1)
    P = len(ii)
    if P == 0:
        return np.zeros((L, L))

    W = np.exp(J_ij[ii, jj])                      # (P, q, q)
    fi = f_i[ii]                                  # (P, q)
    fj = f_i[jj]                                  # (P, q)

    h_i = np.full((P, q), 1.0 / q)
    h_j = np.full((P, q), 1.0 / q)
    active = np.ones(P, dtype=bool)

    for _ in range(max_sweeps):
        if active.all():
            # fast path for the (typical) early sweeps: slices are
            # views, so no per-sweep gather copy of W/f/h
            idx = slice(None)
        else:
            idx = np.flatnonzero(active)
            if idx.size == 0:
                break
        # batched row-vector @ matrix: (P_a, q) x (P_a, q, q)
        tmp1 = np.einsum("pq,prq->pr", h_j[idx], W[idx])   # h_j @ W^T
        tmp2 = np.einsum("pq,pqr->pr", h_i[idx], W[idx])   # h_i @ W
        h_i_new = fi[idx] / tmp1
        h_i_new /= h_i_new.sum(axis=1, keepdims=True)
        h_j_new = fj[idx] / tmp2
        h_j_new /= h_j_new.sum(axis=1, keepdims=True)

        diff = np.maximum(
            np.abs(h_i_new - h_i[idx]).max(axis=1),
            np.abs(h_j_new - h_j[idx]).max(axis=1),
        )
        h_i[idx] = h_i_new
        h_j[idx] = h_j_new
        active[idx] = diff > epsilon

    if active.any():
        # the reference's per-pair while loop runs unboundedly until
        # epsilon; the sweep cap here exists to guarantee termination
        # on pathological fixed points — make hitting it VISIBLE
        # instead of silently merging non-converged DI values
        import warnings

        bad = np.flatnonzero(active)
        warnings.warn(
            "direct_information: {} pair(s) did not reach the "
            "epsilon={} fixed-point criterion within {} sweeps "
            "(e.g. pair ({}, {})); their DI values are the last "
            "iterate, not the converged two-site model".format(
                bad.size, epsilon, max_sweeps,
                ii[bad[0]], jj[bad[0]]),
            RuntimeWarning,
        )

    # two-site model distribution and its mutual information vs the
    # product of single-site frequencies
    p = W * h_i[:, :, None] * h_j[:, None, :]
    p /= p.sum(axis=(1, 2), keepdims=True)
    prod = fi[:, :, None] * fj[:, None, :]
    di_pairs = np.sum(p * np.log((p + _TINY) / (prod + _TINY)), axis=(1, 2))

    _warn_nan_di(di_pairs, ii, jj)

    di = np.zeros((L, L))
    di[ii, jj] = di_pairs
    di[jj, ii] = di_pairs
    return di


def _warn_nan_di(di_pairs, ii, jj):
    """NaN DI pairs (e.g. exp-underflowed coupling rows) freeze as
    'converged' in the sweep loop (NaN > eps is False) and would slip
    into the EC table unnoticed — surface them."""
    bad = np.flatnonzero(np.isnan(np.asarray(di_pairs)))
    if bad.size:
        import warnings

        warnings.warn(
            "direct_information produced NaN for {} pair(s) "
            "(e.g. pair ({}, {})) — degenerate two-site "
            "distributions (underflowed couplings?)".format(
                bad.size, ii[bad[0]], jj[bad[0]]
            ),
            RuntimeWarning,
        )


# ---------------------------------------------------------------------------
# JAX device path
# ---------------------------------------------------------------------------

def invert_covariance_device(C):
    """-inv(C) on device (use on TPU for large L; float32)."""
    return -jnp.linalg.inv(jnp.asarray(C))


def invert_covariance_sharded(C, mesh, axis="data"):
    """-inv(C) with the solves column-sharded over a device mesh.

    The (L(q-1))^2 covariance inversion is the mean-field hot step for
    large L (reference mean_field.py:203-205 does np.linalg.inv on the
    host). Dense inversion = LU factorization (~2/3 D^3 FLOPs, a
    sequential dependency chain XLA cannot usefully shard) + D
    triangular solve columns (~2 D^3 FLOPs, embarrassingly parallel
    across columns). This shards the dominant solve phase: C is
    replicated, each device LU-factorizes its copy once and solves
    only its own block of identity columns, and the -inv(C) result
    comes back column-sharded (~3x at 8 devices; the factorization
    floor caps further scaling — a genuinely distributed factorization
    would need a blocked ScaLAPACK-style kernel, unwarranted at the
    L <= ~10^3 scales of this domain).

    C is replicated to every device, so single-device HBM must hold
    one (D, D) copy — the win is time, not memory.
    """
    from evcouplings_tpu.ops._jax_compat import shard_map
    from jax.sharding import PartitionSpec as P

    C = jnp.asarray(C)
    D = C.shape[0]
    n_shards = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    # identity COLUMNS padded to a multiple of the shard count; each
    # shard builds ONLY its own identity block on device (iota
    # compare), so no (D, D) dense identity is ever materialized on
    # the host or transferred — the padded zero columns solve to zero
    # and are sliced off
    pad = (-D) % n_shards
    blk = (D + pad) // n_shards

    def shard_fn(C_full):
        col0 = jax.lax.axis_index(axis) * blk
        rows = jax.lax.broadcasted_iota(jnp.int32, (D, blk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (D, blk), 1) + col0
        I_blk = (rows == cols).astype(C_full.dtype)
        return -jnp.linalg.solve(C_full, I_blk)

    X = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(),),
        out_specs=P(None, axis),
    ))(C)
    return X[:, :D]


@functools.partial(jax.jit, static_argnames=("max_sweeps",))
def _di_device_kernel(W, fi, fj, epsilon, max_sweeps=10000):
    P, q, _ = W.shape
    # f32 matmuls must not silently drop to bf16 operand precision on
    # TPU: the per-sweep rounding noise (~2e-4 at h ~ 1/q) sits above
    # the 1e-4 convergence threshold and the loop would never settle
    hi_prec = jax.lax.Precision.HIGHEST

    def cond(state):
        h_i, h_j, active, sweep = state
        # bounded like the host path: pathological fixed points must
        # not hang the jitted kernel
        return jnp.any(active) & (sweep < max_sweeps)

    def body(state):
        h_i, h_j, active, sweep = state
        tmp1 = jnp.einsum("pq,prq->pr", h_j, W, precision=hi_prec)
        tmp2 = jnp.einsum("pq,pqr->pr", h_i, W, precision=hi_prec)
        h_i_new = fi / tmp1
        h_i_new = h_i_new / jnp.sum(h_i_new, axis=1, keepdims=True)
        h_j_new = fj / tmp2
        h_j_new = h_j_new / jnp.sum(h_j_new, axis=1, keepdims=True)
        diff = jnp.maximum(
            jnp.max(jnp.abs(h_i_new - h_i), axis=1),
            jnp.max(jnp.abs(h_j_new - h_j), axis=1),
        )
        m = active[:, None]
        h_i = jnp.where(m, h_i_new, h_i)
        h_j = jnp.where(m, h_j_new, h_j)
        active = active & (diff > epsilon)
        return h_i, h_j, active, sweep + 1

    h_i = jnp.full((P, q), 1.0 / q, dtype=W.dtype)
    h_j = jnp.full((P, q), 1.0 / q, dtype=W.dtype)
    active = jnp.ones((P,), dtype=bool)
    h_i, h_j, active, _ = jax.lax.while_loop(
        cond, body, (h_i, h_j, active, jnp.zeros((), jnp.int32))
    )

    p = W * h_i[:, :, None] * h_j[:, None, :]
    p = p / jnp.sum(p, axis=(1, 2), keepdims=True)
    prod = fi[:, :, None] * fj[:, None, :]
    tiny = jnp.asarray(1e-30, dtype=W.dtype)
    di = jnp.sum(p * jnp.log((p + tiny) / (prod + tiny)), axis=(1, 2))
    return di, active


def direct_information_device(J_ij, f_i, epsilon=1e-4):
    """Device variant of direct_information (lax.while_loop over sweeps)."""
    f_i = np.asarray(f_i)
    L, q = f_i.shape
    ii, jj = np.triu_indices(L, k=1)
    W = jnp.exp(jnp.asarray(np.asarray(J_ij)[ii, jj]))
    di_pairs, still_active = _di_device_kernel(
        W, jnp.asarray(f_i[ii]), jnp.asarray(f_i[jj]),
        jnp.asarray(epsilon, dtype=W.dtype),
    )
    di_pairs = np.asarray(di_pairs)
    still_active = np.asarray(still_active)
    if still_active.any():
        import warnings

        bad = np.flatnonzero(still_active)
        warnings.warn(
            "direct_information_device: {} pair(s) did not converge "
            "within the sweep budget (e.g. pair ({}, {}))".format(
                bad.size, ii[bad[0]], jj[bad[0]]
            ),
            RuntimeWarning,
        )
    _warn_nan_di(di_pairs, ii, jj)
    di = np.zeros((L, L))
    di[ii, jj] = di_pairs
    di[jj, ii] = di_pairs
    return di
