"""
Pure-numpy oracle implementations with loop structure mirroring the
reference's numba kernels (evcouplings/align/alignment.py:1078-1233,
evcouplings/couplings/model.py:25-233). Used as ground truth for the
vectorized TPU kernels. Deliberately slow and literal.
"""

import numpy as np


def o_frequencies(matrix, seq_weights, num_symbols):
    N, L = matrix.shape
    fi = np.zeros((L, num_symbols))
    for s in range(N):
        for i in range(L):
            fi[i, matrix[s, i]] += seq_weights[s]
    return fi / seq_weights.sum()


def o_pair_frequencies(matrix, seq_weights, num_symbols, fi):
    N, L = matrix.shape
    fij = np.zeros((L, L, num_symbols, num_symbols))
    for s in range(N):
        for i in range(L):
            for j in range(i + 1, L):
                fij[i, j, matrix[s, i], matrix[s, j]] += seq_weights[s]
                fij[j, i, matrix[s, j], matrix[s, i]] = (
                    fij[i, j, matrix[s, i], matrix[s, j]]
                )
    fij /= seq_weights.sum()
    for i in range(L):
        for alpha in range(num_symbols):
            fij[i, i, alpha, alpha] = fi[i, alpha]
    return fij


def o_identities_to_seq(seq, matrix):
    N, L = matrix.shape
    identities = np.zeros((N,))
    for i in range(N):
        identities[i] = sum(
            1 for j in range(L) if matrix[i, j] == seq[j]
        )
    return identities


def o_num_cluster_members(matrix, identity_threshold):
    N, L = matrix.shape
    Lf = float(L)
    num_neighbors = np.ones((N,))
    for i in range(N - 1):
        for j in range(i + 1, N):
            pair_id = sum(
                1 for k in range(L) if matrix[i, k] == matrix[j, k]
            )
            if pair_id / Lf >= identity_threshold:
                num_neighbors[i] += 1
                num_neighbors[j] += 1
    return num_neighbors


def o_hamiltonians(sequences, J_ij, h_i):
    N, L = sequences.shape
    H = np.zeros((N, 3))
    for s in range(N):
        A = sequences[s]
        hi_sum = 0.0
        Jij_sum = 0.0
        for i in range(L):
            hi_sum += h_i[i, A[i]]
            for j in range(i + 1, L):
                Jij_sum += J_ij[i, j, A[i], A[j]]
        H[s] = [Jij_sum + hi_sum, Jij_sum, hi_sum]
    return H


def o_single_mutant_hamiltonians(target_seq, J_ij, h_i):
    L, num_symbols = h_i.shape
    H = np.empty((L, num_symbols, 3))
    for i in range(L):
        for A_i in range(num_symbols):
            delta_hi = h_i[i, A_i] - h_i[i, target_seq[i]]
            delta_Jij = 0.0
            for j in range(L):
                if i != j:
                    delta_Jij += (
                        J_ij[i, j, A_i, target_seq[j]]
                        - J_ij[i, j, target_seq[i], target_seq[j]]
                    )
            H[i, A_i] = [delta_Jij + delta_hi, delta_Jij, delta_hi]
    return H


def o_delta_hamiltonian(pos, subs, target_seq, J_ij, h_i):
    L, num_symbols = h_i.shape
    M = pos.shape[0]
    delta_hi = 0.0
    delta_Jij = 0.0
    for m in range(M):
        i = pos[m]
        A_i = subs[m]
        delta_hi += h_i[i, A_i] - h_i[i, target_seq[i]]
        for j in range(L):
            if i != j:
                delta_Jij += (
                    J_ij[i, j, A_i, target_seq[j]]
                    - J_ij[i, j, target_seq[i], target_seq[j]]
                )
        for n in range(m + 1, M):
            j = pos[n]
            A_j = subs[n]
            delta_Jij -= J_ij[i, j, A_i, target_seq[j]]
            delta_Jij -= J_ij[i, j, target_seq[i], A_j]
            delta_Jij += J_ij[i, j, target_seq[i], target_seq[j]]
            delta_Jij += J_ij[i, j, A_i, A_j]
    return np.array([delta_Jij + delta_hi, delta_Jij, delta_hi])


def o_zero_sum_gauge(J_ij):
    L, _, num_symbols, _ = J_ij.shape
    J0 = np.zeros_like(J_ij)
    for i in range(L - 1):
        for j in range(i + 1, L):
            ij_mat = J_ij[i, j]
            avg_ab = np.mean(ij_mat)
            avg_a = ij_mat.mean(axis=1)
            avg_b = ij_mat.mean(axis=0)
            for a in range(num_symbols):
                for b in range(num_symbols):
                    J0[i, j, a, b] = (
                        ij_mat[a, b] - avg_a[a] - avg_b[b] + avg_ab
                    )
                    J0[j, i, b, a] = J0[i, j, a, b]
    return J0


def random_symmetric_J(L, q, rng, scale=0.5):
    """Random coupling tensor with plmc_v2 invariants: zero diagonal,
    J[j,i,b,a] == J[i,j,a,b]."""
    J = np.zeros((L, L, q, q))
    for i in range(L - 1):
        for j in range(i + 1, L):
            block = rng.normal(size=(q, q)) * scale
            J[i, j] = block
            J[j, i] = block.T
    return J


# ---------------------------------------------------------------------------
# mean-field DCA oracles (literal loop semantics of reference
# evcouplings/couplings/mean_field.py numba kernels)
# ---------------------------------------------------------------------------

def o_flatten_index(i, alpha, num_symbols):
    return i * (num_symbols - 1) + alpha


def o_compute_covariance_matrix(f_i, f_ij):
    L, num_symbols = f_i.shape
    C = np.zeros((L * (num_symbols - 1), L * (num_symbols - 1)))
    for i in range(L):
        for j in range(L):
            for a in range(num_symbols - 1):
                for b in range(num_symbols - 1):
                    C[
                        o_flatten_index(i, a, num_symbols),
                        o_flatten_index(j, b, num_symbols),
                    ] = f_ij[i, j, a, b] - f_i[i, a] * f_i[j, b]
    return C


def o_reshape_invC_to_4d(invC, L, num_symbols):
    J = np.zeros((L, L, num_symbols, num_symbols))
    for i in range(L):
        for j in range(L):
            for a in range(num_symbols - 1):
                for b in range(num_symbols - 1):
                    J[i, j, a, b] = invC[
                        o_flatten_index(i, a, num_symbols),
                        o_flatten_index(j, b, num_symbols),
                    ]
    return J


def o_fields(J_ij, f_i):
    L, num_symbols = f_i.shape
    hi = np.zeros((L, num_symbols))
    for i in range(L):
        log_fi = np.log(f_i[i] / f_i[i, num_symbols - 1])
        J_sum = np.zeros((1, num_symbols))
        for j in range(L):
            if i != j:
                J_sum += np.dot(
                    J_ij[i, j], f_i[j].reshape((1, num_symbols)).T
                ).T
        hi[i] = log_fi - J_sum
    return hi


def o_tilde_fields(W, f_i, f_j, epsilon=1e-4):
    num_symbols = f_i.shape[0]
    h_i = np.full((1, num_symbols), 1 / float(num_symbols))
    h_j = np.full((1, num_symbols), 1 / float(num_symbols))
    diff = 1.0
    while diff > epsilon:
        tmp_1 = np.dot(h_j, W.T)
        tmp_2 = np.dot(h_i, W)
        h_i_new = f_i / tmp_1
        h_i_new /= h_i_new.sum()
        h_j_new = f_j / tmp_2
        h_j_new /= h_j_new.sum()
        diff = max(
            np.abs(h_i_new - h_i).max(), np.abs(h_j_new - h_j).max()
        )
        h_i, h_j = h_i_new, h_j_new
    return h_i, h_j


def o_direct_information(J_ij, f_i):
    L, num_symbols = f_i.shape
    di = np.zeros((L, L))
    for i in range(L):
        for j in range(i + 1, L):
            W = np.exp(J_ij[i, j])
            h_i, h_j = o_tilde_fields(W, f_i[i], f_i[j])
            p = W * np.dot(h_i.T, h_j)
            p = p / p.sum()
            fij = np.dot(
                f_i[i].reshape((1, num_symbols)).T,
                f_i[j].reshape((1, num_symbols)),
            )
            tiny = 1.0e-100
            di[i, j] = di[j, i] = np.trace(
                np.dot(p.T, np.log((p + tiny) / (fij + tiny)))
            )
    return di


def o_regularize_pair_frequencies(f_ij, pseudo_count):
    L, _, num_symbols, _ = f_ij.shape
    reg = (1.0 - pseudo_count) * f_ij + pseudo_count / float(num_symbols ** 2)
    ident = np.identity(num_symbols)
    for i in range(L):
        for a in range(num_symbols):
            for b in range(num_symbols):
                reg[i, i, a, b] = (
                    (1.0 - pseudo_count) * f_ij[i, i, a, b]
                    + (pseudo_count / num_symbols) * ident[a, b]
                )
    return reg
