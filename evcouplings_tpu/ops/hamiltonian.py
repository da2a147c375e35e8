"""
Potts-model statistical energies (Hamiltonians) and mutation-effect deltas.

Replaces the reference numba kernels `_hamiltonians`,
`_single_mutant_hamiltonians`, `_delta_hamiltonian`
(evcouplings/couplings/model.py:25-176) and the double-mutant closed form
(model.py:714-742).

Two paths:

- numpy host path (float64): exact-parity arithmetic for CouplingsModel;
  the all-singles matrix and the per-mutant deltas are vectorized einsums
  over the (L, L, q, q) coupling tensor — no Python-level loops.
- JAX device path (`hamiltonians_device`): the batch Hamiltonian is the
  same (N, Lq) @ (Lq, Lq) matmul that the PLM fitter uses for logits, so
  very large sequence batches (e.g. scoring millions of mutants) ride the
  MXU.

Convention: J has zero diagonal blocks (J[i,i] == 0) and is symmetric,
J[j,i,b,a] == J[i,j,a,b], as produced by the plmc_v2 codec.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

# component order in all *_full outputs (reference model.py:19)
FULL, COUPLINGS, FIELDS = 0, 1, 2
NUM_COMPONENTS = 3


def hamiltonians(sequences, J_ij, h_i):
    """Hamiltonians H = sum_i h_i(A_i) + sum_{i<j} J_ij(A_i, A_j).

    sequences : (N, L) int array
    Returns (N, 3): total, couplings sub-sum, fields sub-sum.
    """
    sequences = np.asarray(sequences)
    N, L = sequences.shape

    ii, jj = np.triu_indices(L, k=1)
    H = np.empty((N, NUM_COMPONENTS))

    # chunk over N: the coupling gather materializes three
    # (chunk, L(L-1)/2) temporaries; bound them to ~64 MB each
    # instead of letting a large batch allocate tens of GB at once
    n_pairs = max(1, len(ii))
    chunk = max(1, min(N, (1 << 23) // n_pairs))
    for start in range(0, N, chunk):
        seq_c = sequences[start:start + chunk]

        # fields: gather h_i[i, A_i] for every sequence
        hi_sum = h_i[np.arange(L)[None, :], seq_c].sum(axis=1)

        # couplings: sum over the triangle i < j of J[i, j, A_i, A_j]
        Jij_sum = J_ij[
            ii[None, :], jj[None, :], seq_c[:, ii], seq_c[:, jj]
        ].sum(axis=1)

        sl = slice(start, start + len(seq_c))
        H[sl, FULL] = Jij_sum + hi_sum
        H[sl, COUPLINGS] = Jij_sum
        H[sl, FIELDS] = hi_sum
    return H


def _coupling_field(J_ij, target_seq):
    """Jsel[i, a] = sum_{j != i} J[i, j, a, s_j] (uses zero diagonal)."""
    L = J_ij.shape[0]
    # gather J[i, j, :, s_j] -> (L, L, q), then sum over j
    gathered = J_ij[
        np.arange(L)[:, None],
        np.arange(L)[None, :],
        :,
        np.asarray(target_seq)[None, :],
    ]  # (L, L, q)
    return gathered.sum(axis=1)  # (L, q)


def single_mutant_hamiltonians(target_seq, J_ij, h_i):
    """Delta Hamiltonians for all single substitutions, (L, q, 3).

    Parity: reference model.py:63-109.
    """
    target_seq = np.asarray(target_seq)
    L, q = h_i.shape

    Jsel = _coupling_field(J_ij, target_seq)             # (L, q)
    h_wt = np.take_along_axis(h_i, target_seq[:, None], axis=1)
    J_wt = np.take_along_axis(Jsel, target_seq[:, None], axis=1)

    delta_h = h_i - h_wt                                  # (L, q)
    delta_J = Jsel - J_wt                                 # (L, q)

    H = np.empty((L, q, NUM_COMPONENTS))
    H[:, :, FULL] = delta_J + delta_h
    H[:, :, COUPLINGS] = delta_J
    H[:, :, FIELDS] = delta_h
    return H


def delta_hamiltonian(pos, subs, target_seq, J_ij, h_i,
                      coupling_field=None):
    """Delta Hamiltonian for a multi-substitution, returns (3,).

    pos/subs: int vectors of substituted positions and new symbols.
    Parity: reference model.py:112-176 (single-site deltas against the
    wild-type background, plus pairwise corrections among the substituted
    positions so each mutated pair's coupling is counted once in the new
    background).

    coupling_field: optional precomputed _coupling_field(J_ij,
    target_seq). It depends only on the model + target, so per-mutant
    loops (predict_mutation_table scores one mutant per table row)
    should compute it ONCE — recomputing the O(L^2 q) gather per
    mutant dominated large mutational scans.
    """
    pos = np.asarray(pos)
    subs = np.asarray(subs)
    target_seq = np.asarray(target_seq)
    M = pos.shape[0]

    delta_hi = (
        h_i[pos, subs] - h_i[pos, target_seq[pos]]
    ).sum()

    Jsel = (
        coupling_field if coupling_field is not None
        else _coupling_field(J_ij, target_seq)
    )
    delta_Jij = (
        Jsel[pos, subs] - Jsel[pos, target_seq[pos]]
    ).sum()

    if M > 1:
        # pairwise corrections among substituted positions (m < n)
        im, jn = np.triu_indices(M, k=1)
        i, j = pos[im], pos[jn]
        a, b = subs[im], subs[jn]
        si, sj = target_seq[i], target_seq[j]
        delta_Jij += (
            J_ij[i, j, a, b]
            - J_ij[i, j, a, sj]
            - J_ij[i, j, si, b]
            + J_ij[i, j, si, sj]
        ).sum()

    return np.array([delta_Jij + delta_hi, delta_Jij, delta_hi])


def double_mutant_matrix(single_mut_mat, J_ij, target_seq):
    """Delta Hamiltonians for all double mutants, (L, L, q, q).

    dmm[i,j,a,b] = smm[i,a] + smm[j,b]
                   + J[i,j,a,b] - J[i,j,a,s_j] - J[i,j,s_i,b] + J[i,j,s_i,s_j]
    with zero diagonal (i == j). Parity: reference model.py:714-742.
    """
    target_seq = np.asarray(target_seq)
    L, q = single_mut_mat.shape

    s_i = target_seq[:, None, None, None]
    s_j = target_seq[None, :, None, None]
    li = np.arange(L)[:, None, None, None]
    lj = np.arange(L)[None, :, None, None]
    a = np.arange(q)[None, None, :, None]
    b = np.arange(q)[None, None, None, :]

    # in-place accumulation: the chained expression held ~5 full
    # (L, L, q, q) float64 temporaries live at once
    dmm = np.broadcast_to(
        single_mut_mat[:, None, :, None], J_ij.shape
    ).copy()
    dmm += single_mut_mat[None, :, None, :]
    dmm += J_ij
    dmm -= J_ij[li, lj, a, s_j]
    dmm -= J_ij[li, lj, s_i, b]
    dmm += J_ij[li, lj, s_i, s_j]
    dmm[np.arange(L), np.arange(L)] = 0.0
    return dmm


# ---------------------------------------------------------------------------
# JAX device path for large batches
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("block_size",))
def _hamiltonians_device(codes, J_flat, h_i, block_size):
    n, L = codes.shape
    q = h_i.shape[1]
    num_blocks = n // block_size

    def body(_, block_idx):
        c = jax.lax.dynamic_slice_in_dim(
            codes, block_idx * block_size, block_size, 0
        )
        oh = jax.nn.one_hot(c, q, dtype=J_flat.dtype).reshape(block_size, -1)
        # (B, Lq) @ (Lq, Lq) — the same MXU op as the PLM logits
        Jv = jax.lax.dot_general(
            oh, J_flat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=J_flat.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        j_sum = 0.5 * jnp.sum(oh * Jv, axis=1)
        h_sum = jnp.sum(oh * h_i.reshape(-1)[None, :], axis=1)
        return None, jnp.stack([j_sum + h_sum, j_sum, h_sum], axis=1)

    _, H = jax.lax.scan(
        body, None, jnp.arange(num_blocks, dtype=jnp.int32)
    )
    return H.reshape(n, NUM_COMPONENTS)


def hamiltonians_device(sequences, J_ij, h_i, dtype=jnp.float32):
    """Batch Hamiltonians on the accelerator; same contract as
    `hamiltonians` but runs (N, Lq) @ (Lq, Lq) matmuls on the MXU.
    Intended for very large N (mutant libraries, alignment-wide scans)."""
    from evcouplings_tpu.ops.encode import flatten_J, pad_rows

    sequences = np.asarray(sequences)
    L, q = h_i.shape
    if sequences.shape[1] != L:
        raise ValueError(
            "sequences have {} columns, model expects L={}".format(
                sequences.shape[1], L
            )
        )
    if sequences.size and (
        sequences.min() < 0 or sequences.max() >= q
    ):
        # one_hot would silently drop such sites (all-zero rows),
        # diverging from the host path without any error
        raise ValueError(
            "sequence codes must lie in [0, {}) for the device "
            "path (got range [{}, {}])".format(
                q, sequences.min(), sequences.max()
            )
        )
    # pad to the next power of two (capped): deriving the block from
    # the exact batch size compiled a fresh XLA program per distinct N
    n_in = max(1, sequences.shape[0])
    block = min(4096, max(8, 1 << (n_in - 1).bit_length()))
    codes, n = pad_rows(sequences.astype(np.int8), block)

    # the 0.5 * quadratic form counts diagonal blocks the host path's
    # strict triangle never sees: enforce the documented zero-diagonal
    # convention so both paths agree on any input
    J_in = np.asarray(J_ij)
    L_arange = np.arange(L)
    if np.any(J_in[L_arange, L_arange]):
        J_in = J_in.copy()
        J_in[L_arange, L_arange] = 0.0
    J_flat = flatten_J(J_in).astype(dtype)
    H = _hamiltonians_device(
        jnp.asarray(codes), J_flat, jnp.asarray(h_i, dtype=dtype), block
    )
    return np.asarray(H)[:n].astype(np.float64)
