"""
Mean-field direct couplings analysis (DCA).

Parity target: reference evcouplings/couplings/mean_field.py —
MeanFieldDCA (:41-329), MeanFieldCouplingsModel (:332-714),
regularizers (:717-788). The numba kernels are replaced by the batched
kernels in evcouplings_tpu.ops.mean_field.

Model-file convention: a mean-field model is stored in the plmc_v2
binary format with lambda_h = -pseudo_count as marker and placeholder
values for the plmc-only fields (reference mean_field.py:629-671,
model.py:391-400).
"""

from copy import deepcopy

import numpy as np

from evcouplings_tpu.align.alignment import parse_header
from evcouplings_tpu.couplings.model import CouplingsModel
from evcouplings_tpu.ops import mean_field as _mf

# kernel entry points at the reference's import paths (reference
# mean_field.py:791-1014); implementations are the JAX/numpy kernels
# in evcouplings_tpu.ops.mean_field
compute_covariance_matrix = _mf.compute_covariance_matrix
reshape_invC_to_4d = _mf.reshape_invC_to_4d
fields = _mf.fields_from_couplings
tilde_fields = _mf.tilde_fields
direct_information = _mf.direct_information

# arbitrary value written to file for plmc-specific parameters
_PLACEHOLDER = -1


def regularize_frequencies(f_i, pseudo_count=0.5):
    """Pseudo-count-regularized single-site frequencies.

    f~ = (1 - pc) * f + pc / q (reference mean_field.py:717-744).
    """
    num_symbols = f_i.shape[-1]
    return (1.0 - pseudo_count) * f_i + pseudo_count / float(num_symbols)


def regularize_pair_frequencies(f_ij, pseudo_count=0.5):
    """Pseudo-count-regularized pair frequencies.

    Off-diagonal position pairs get pc / q^2; the diagonal (i, i) blocks
    get (1 - pc) * f_ij[i,i] + (pc / q) * identity so that
    f~_ij[i,i,a,a] tracks the regularized single-site frequency
    (reference mean_field.py:747-788).
    """
    L, _, num_symbols, _ = f_ij.shape
    reg = (1.0 - pseudo_count) * f_ij + pseudo_count / float(num_symbols ** 2)

    idx = np.arange(L)
    reg[idx, idx] = (
        (1.0 - pseudo_count) * f_ij[idx, idx]
        + (pseudo_count / num_symbols) * np.identity(num_symbols)[None]
    )
    return reg


class MeanFieldDCA:
    """Mean-field DCA inference from a focus-mode (a2m) alignment.

    The input alignment must have the target sequence as first record;
    focus columns are the non-gap uppercase columns of the target.
    Parity: reference mean_field.py:41-329.
    """

    def __init__(self, alignment):
        self._raw_alignment = alignment
        target_seq = alignment[0]

        # focus columns: uppercase non-gap positions of the target
        gaps = (alignment._match_gap, alignment._insert_gap)
        focus_cols = np.fromiter(
            (c.isupper() and c not in gaps for c in target_seq),
            dtype=bool, count=len(target_seq),
        )
        focus_ali = alignment.select(columns=focus_cols)

        # target-sequence numbering restricted to focus columns
        _, start, stop = parse_header(alignment.ids[0])
        self.index_list = np.arange(start, stop + 1)[focus_cols]

        # drop sequences containing non-alphabet symbols
        alphabet_arr = np.asarray(list(focus_ali.alphabet))
        valid_sequences = np.isin(
            focus_ali.matrix, alphabet_arr
        ).all(axis=1)
        self.alignment = focus_ali.select(sequences=valid_sequences)

        self._reset()

    def _reset(self):
        """Drop weights, frequencies and covariance state (fit() may be
        called repeatedly with different theta/pseudo-count)."""
        self.alignment.weights = None
        self.alignment._frequencies = None
        self.alignment._pair_frequencies = None
        for attr in ("regularized_frequencies",
                     "regularized_pair_frequencies",
                     "covariance_matrix", "covariance_matrix_inv"):
            setattr(self, attr, None)

    def fit(self, theta=0.8, pseudo_count=0.5, device=False, mesh=None):
        """Run mean-field DCA; returns a MeanFieldCouplingsModel.

        Pipeline (reference mean_field.py:163-222): reweight sequences at
        theta -> pseudo-count-regularize f_i/f_ij -> covariance matrix ->
        J = -C^{-1} -> fields.

        device=True inverts the (L(q-1))^2 covariance matrix on the
        JAX default device (TPU) instead of host float64 numpy — the
        hot step for large L (a 6000^2 inversion at L=300). Host f64
        remains the parity default.

        mesh: a jax.sharding.Mesh with a "data" axis column-shards the
        inversion's triangular solves across devices (C replicated,
        each device solving its own identity-column block —
        ops/mean_field.py invert_covariance_sharded); implies device
        compute.
        """
        self._reset()

        self.alignment.set_weights(identity_threshold=theta)
        self.regularize_frequencies(pseudo_count=pseudo_count)
        self.regularize_pair_frequencies(pseudo_count=pseudo_count)

        self.compute_covariance_matrix()
        self.covariance_matrix_inv = self._invert_covariance(
            device, mesh
        )

        J_ij = self.reshape_invC_to_4d()
        h_i = self.fields()

        return MeanFieldCouplingsModel(
            alignment=self.alignment,
            index_list=self.index_list,
            regularized_f_i=self.regularized_frequencies,
            regularized_f_ij=self.regularized_pair_frequencies,
            h_i=h_i,
            J_ij=J_ij,
            theta=theta,
            pseudo_count=pseudo_count,
        )

    def _invert_covariance(self, device, mesh):
        """-C^-1 on the selected compute path: mesh-sharded triangular
        solves, single-device TPU inversion, or host float64 numpy
        (the parity default)."""
        if mesh is not None:
            from evcouplings_tpu.ops.mean_field import (
                invert_covariance_sharded,
            )

            return np.asarray(
                invert_covariance_sharded(self.covariance_matrix, mesh),
                dtype=np.float64,
            )
        if device:
            from evcouplings_tpu.ops.mean_field import (
                invert_covariance_device,
            )

            return np.asarray(
                invert_covariance_device(self.covariance_matrix),
                dtype=np.float64,
            )
        return -np.linalg.inv(self.covariance_matrix)

    def regularize_frequencies(self, pseudo_count=0.5):
        self.regularized_frequencies = regularize_frequencies(
            self.alignment.frequencies, pseudo_count=pseudo_count
        )
        return self.regularized_frequencies

    def regularize_pair_frequencies(self, pseudo_count=0.5):
        self.regularized_pair_frequencies = regularize_pair_frequencies(
            self.alignment.pair_frequencies, pseudo_count=pseudo_count
        )
        return self.regularized_pair_frequencies

    def compute_covariance_matrix(self):
        self.covariance_matrix = _mf.compute_covariance_matrix(
            self.regularized_frequencies, self.regularized_pair_frequencies
        )
        return self.covariance_matrix

    def reshape_invC_to_4d(self):
        return _mf.reshape_invC_to_4d(
            self.covariance_matrix_inv,
            self.alignment.L,
            self.alignment.num_symbols,
        )

    def fields(self):
        return _mf.fields_from_couplings(
            self.reshape_invC_to_4d(), self.regularized_frequencies
        )


class MeanFieldCouplingsModel(CouplingsModel):
    """CouplingsModel specialization for mean-field results: stores
    regularized frequencies and adds DI (direct information) scoring.

    Parity: reference mean_field.py:332-714.
    """

    def __init__(self, alignment=None, index_list=None, regularized_f_i=None,
                 regularized_f_ij=None, h_i=None, J_ij=None, theta=None,
                 pseudo_count=None):
        # Note: also constructed by CouplingsModel.__read_plmc_v2 via a
        # __class__ swap + transform_from_plmc_model(), in which case
        # __init__ is never called (reference model.py:391-400).
        self.L, self.num_symbols = alignment.L, alignment.num_symbols
        # only valid-sequence weights are stored, so the codec's
        # N_valid + N_invalid weight read requires N_invalid = 0
        self.N_valid, self.N_invalid = alignment.N, 0

        w = alignment.weights
        self.weights = np.ones(alignment.N) if w is None else w
        self.N_eff = self.weights.sum()

        self.alphabet = np.array(list(alignment.alphabet))
        self.alphabet_map = {s: k for k, s in enumerate(self.alphabet)}

        # set numbering before the target_seq setter creates the _ecs
        # cache slot, so no eager EC/DI computation is triggered here
        # (the reference's init order recomputes ECs during __init__;
        # the results are identical, this just defers the work).
        # the target sequence is the focus alignment's first record
        self.index_list = index_list
        self.target_seq = list(alignment.matrix[0])

        self.f_i, self.f_ij = alignment.frequencies, \
            alignment.pair_frequencies
        self.regularized_f_i = regularized_f_i
        self.regularized_f_ij = regularized_f_ij

        self.h_i, self.J_ij = h_i, J_ij
        self.theta, self.pseudo_count = theta, pseudo_count

        self._decode_unused_fields(save_pseudo_count=False)
        self._reset_precomputed()

    def _reset_precomputed(self):
        """Additionally reset DI scores."""
        super()._reset_precomputed()
        self._di_scores = None

    def _calculate_ecs(self):
        """FN/CN/MI scores via the parent, then DI scores appended.

        The stored EC table is sorted by (i, j) with a "di" column; the
        return value is sorted by DI descending (reference
        mean_field.py:440-478).
        """
        super()._calculate_ecs()

        self._di_scores = _mf.direct_information(
            self.J_ij, self.regularized_f_i
        )

        ii, jj = np.triu_indices(self.L, k=1)
        self._ecs = self._ecs.sort_values(by=["i", "j"])
        self._ecs.loc[:, "di"] = self._di_scores[ii, jj]

        return self._ecs.sort_values(by="di", ascending=False)

    def regularize_f_i(self):
        self.regularized_f_i = \
            regularize_frequencies(self.f_i, self.pseudo_count)
        return self.regularized_f_i

    def regularize_f_ij(self):
        self.regularized_f_ij = \
            regularize_pair_frequencies(self.f_ij, self.pseudo_count)
        return self.regularized_f_ij

    def tilde_fields(self, i, j):
        """h-tilde fields of the two-site model for positions (i, j).

        Note: the reference's method (mean_field.py:530-552) forwards
        mismatched arguments to its kernel; this implementation passes
        the corrected inputs (exp couplings of the pair, regularized
        single-site frequencies of both positions).
        """
        return _mf.tilde_fields(
            np.exp(self.J_ij[i, j]),
            self.regularized_f_i[i],
            self.regularized_f_i[j],
        )

    @property
    def di_scores(self):
        """(L, L) direct information scores."""
        if self._di_scores is None:
            self._calculate_ecs()

        return self._di_scores

    def to_independent_model(self):
        """Single-site model: h = log f~, J = 0 (overrides the BFGS fit
        of the parent; reference mean_field.py:576-594)."""
        independent = deepcopy(self)
        independent.h_i = np.log(self.regularized_f_i)
        independent.J_ij.fill(0)
        independent._reset_precomputed()
        return independent

    def to_raw_ec_file(self, couplings_file):
        """Write the mean-field raw EC file:
        `i A_i j A_j mi_raw mi_apc di cn` per pair (i < j), 6 decimals
        (reference mean_field.py:596-617)."""
        with open(couplings_file, "w") as f:
            for i, j in zip(*np.triu_indices(self.L, k=1)):
                f.write(
                    "{} {} {} {} "
                    "{:.6f} {:.6f} {:.6f} {:.6f}\n".format(
                        self.index_list[i], self.target_seq[i],
                        self.index_list[j], self.target_seq[j],
                        self.mi_scores_raw[i, j],
                        self.mi_scores_apc[i, j],
                        self.di_scores[i, j],
                        self.cn_scores[i, j],
                    )
                )

    def transform_from_plmc_model(self):
        """Fix up a model loaded from a plmc_v2 file (called by the codec
        after detecting lambda_h < 0): decode the pseudo-count, restore
        the f_ij diagonal, and regularize frequencies."""
        self._decode_unused_fields()

        # each (i, i) block becomes diag(f_i[i]) — multiplying by the
        # identity keeps f_i bitwise on the diagonal and zeros the rest
        sites = np.arange(self.L)
        self.f_ij[sites, sites] = (
            self.f_i[:, :, None] * np.identity(self.num_symbols)
        )

        self.regularize_f_i()
        self.regularize_f_ij()
        self._di_scores = None

    def _encode_unused_fields(self):
        """Store the pseudo-count as -lambda_h and placeholders for the
        plmc-only fields, for serialization."""
        for plmc_only in ("lambda_J", "lambda_group", "num_iter"):
            setattr(self, plmc_only, _PLACEHOLDER)
        self.lambda_h = -self.pseudo_count

    def _decode_unused_fields(self, save_pseudo_count=True):
        """Null out plmc-only fields; optionally recover the pseudo-count
        from lambda_h."""
        if save_pseudo_count:
            self.pseudo_count = -self.lambda_h
        for plmc_only in ("lambda_J", "lambda_group", "num_iter",
                          "lambda_h"):
            setattr(self, plmc_only, None)

    def to_file(self, out_file, precision="float32", file_format="plmc_v2"):
        """Write in plmc_v2 format (plmc_v1 is not supported for
        mean-field models)."""
        if file_format == "plmc_v1":
            raise ValueError(
                "Illegal file format: plmc_v1. Valid option: plmc_v2."
            )

        self._encode_unused_fields()
        try:
            super().to_file(
                out_file, precision=precision, file_format=file_format
            )
        finally:
            self._decode_unused_fields()
