"""
In-process TPU-native replacement for the external `plmc` C binary.

The reference shells out to plmc (wrapper
evcouplings/couplings/tools.py:126-307) and parses its stderr
(parse_plmc_log, tools.py:20-123). Here the whole computation runs
in-process on the accelerator: focus-mode alignment preparation,
O(N^2 L) sequence reweighting, the pseudolikelihood LBFGS fit
(evcouplings_tpu.ops.plm — MXU matmul kernels, optionally row-sharded
over a device mesh), weighted frequency counts, EC scoring, and the
plmc_v2 `.model` + raw EC file artifacts, byte-compatible with the
reference toolchain.

plmc conventions reproduced deliberately:
- focus sequence name is matched after splitting at "/"
  (tools.py:213-220); region numbering parsed from the "/start-end"
  suffix
- the wrapper's theta is our theta directly (the 1-theta transform in
  tools.py:236-239 is a plmc CLI convention that no longer exists here)
- lambda_J passed in is the FINAL per-pair strength (any
  (q-1)(L-1) scaling is applied by the calling protocol,
  couplings/protocol.py:157-179)
- `-g` (ignore_gaps): gap positions contribute neither a conditional
  term nor context (encoded as -1 codes -> zero one-hot rows)
- raw EC file: `i A_i j A_j fn cn` rows for i < j in row-major order
"""

from collections import namedtuple

import numpy as np
import pandas as pd

from evcouplings_tpu.align.alignment import (
    ALPHABET_PROTEIN,
    Alignment,
    parse_header,
)
from evcouplings_tpu.couplings.model import CouplingsModel
from evcouplings_tpu.ops import scores as _scores
from evcouplings_tpu.ops.frequencies import frequencies, pair_frequencies
from evcouplings_tpu.ops import plm as ops_plm
from evcouplings_tpu.ops.plm import PlmConfig, fit_plm
from evcouplings_tpu.ops.weights import num_cluster_members
from evcouplings_tpu.utils.system import (
    ResourceError, create_prefix_folders, verify_resources
)

# result contract mirrors the reference PlmcResult (tools.py:111-123)
# so protocol-level restart logic is interchangeable
PlmResult = namedtuple(
    "PlmResult",
    [
        "couplings_file", "param_file",
        "iteration_table", "focus_seq_index",
        "num_valid_seqs", "num_total_seqs",
        "num_valid_sites", "num_total_sites",
        "region_start", "effective_samples",
        "optimization_status",
    ],
)


def prepare_alignment(alignment_file, focus_seq=None,
                      alphabet=ALPHABET_PROTEIN):
    """Load an alignment and prepare integer codes for the PLM fit.

    Focus mode: locate the focus sequence (name matched after stripping
    the "/start-end" range), restrict to its uppercase non-gap columns,
    and derive target numbering from its header. Non-focus mode uses
    all columns and numbering 1..L.

    Sequences containing out-of-alphabet symbols in the selected
    columns are invalid: excluded from the fit but kept (weight 0) in
    the stored weight vector, as in the plmc `.model` format.

    Returns a dict with codes (N_valid, L), valid_index, target info,
    and bookkeeping counts.
    """
    ali = Alignment.from_path(alignment_file, "fasta", alphabet=alphabet)

    N_total = ali.N

    if focus_seq is not None:
        focus_name = focus_seq.split("/")[0]
        focus_index = None
        for i, id_ in enumerate(ali.ids):
            if id_.split("/")[0] == focus_name or id_ == focus_seq:
                focus_index = i
                break
        if focus_index is None:
            raise ResourceError(
                "Focus sequence {} not found in alignment".format(focus_seq)
            )

        target_row = ali.matrix[focus_index]
        focus_cols = np.array([
            c.isupper() and c not in (ali._match_gap, ali._insert_gap)
            for c in target_row
        ])

        _, region_start, region_end = parse_header(ali.ids[focus_index])
        if region_start is None:
            region_start = 1

        matrix = ali.matrix[:, focus_cols]
        # plmc numbering: indices advance along the FOCUS SEQUENCE —
        # every column where the focus row has a residue (upper- or
        # lowercase) consumes one number starting at region_start,
        # while target-gap columns do not. For the well-formed focus
        # alignments modify_alignment produces (target row gap-free)
        # this equals a plain arange over columns.
        is_residue = np.array([
            c not in (ali._match_gap, ali._insert_gap)
            for c in target_row
        ])
        index_list = (
            region_start + np.cumsum(is_residue) - 1
        )[focus_cols]
        target_seq = target_row[focus_cols]
        num_total_sites = ali.L
    else:
        focus_index = None
        region_start = 1
        matrix = ali.matrix
        index_list = np.arange(1, ali.L + 1)
        target_seq = ali.matrix[0]
        num_total_sites = ali.L

    L = matrix.shape[1]

    # integer codes; invalid rows = any symbol outside the alphabet
    alphabet_map = {c: i for i, c in enumerate(alphabet)}
    codes = np.full(matrix.shape, -1, dtype=np.int8)
    for c, idx in alphabet_map.items():
        codes[matrix == c] = idx
    valid_rows = (codes >= 0).all(axis=1)
    valid_index = np.flatnonzero(valid_rows)

    return {
        "alignment": ali,
        "codes": codes[valid_rows],
        "valid_index": valid_index,
        "focus_index": focus_index,
        "target_seq": target_seq,
        "index_list": index_list,
        "region_start": int(region_start),
        "num_valid_seqs": int(valid_rows.sum()),
        "num_total_seqs": int(N_total),
        "num_valid_sites": int(L),
        "num_total_sites": int(num_total_sites),
        "alphabet": alphabet,
    }


def write_raw_ec_file(couplings_file, index_list, target_seq, fn, cn):
    """plmc-format raw EC file: `i A_i j A_j fn cn` for i < j."""
    L = len(index_list)
    ii, jj = np.triu_indices(L, k=1)
    with open(couplings_file, "w") as f:
        for i, j in zip(ii, jj):
            f.write("{} {} {} {} {:.6f} {:.6f}\n".format(
                index_list[i], target_seq[i],
                index_list[j], target_seq[j],
                fn[i, j], cn[i, j],
            ))


def run_plm(alignment, couplings_file, param_file=None, focus_seq=None,
            alphabet=None, theta=None, scale=None, ignore_gaps=False,
            iterations=None, lambda_h=None, lambda_J=None, lambda_g=None,
            cpu=None, binary=None, mesh=None, solver=None,
            group_mode=None, conv_tol=None,
            block_size=None, steps_per_call=1, pad_sites_to=None,
            pad_rows_to=None,
            compute_dtype="float32", matmul_precision="highest",
            parametrization="auto",
            callback=None, checkpoint_file=None, checkpoint_every=50):
    """Fit a Potts model by pseudolikelihood maximization and write the
    plmc-compatible artifacts.

    Drop-in replacement for reference run_plmc (couplings/tools.py:
    126-307); `cpu` and `binary` are accepted for config compatibility
    and ignored (compute runs on the JAX default device / the given
    mesh).

    parametrization: "symmetric" (plmc semantics, ops/plm.py),
    "asymmetric" (site-sharded independent per-site regressions,
    symmetrized post-fit — ops/plm_sites.py; solver "adam" or
    per-site "lbfgs", supports a 2D ("data", "model") mesh for L
    beyond single-chip HBM), or "auto" (default): symmetric while the
    estimated per-device peak HBM fits the budget, transparently
    falling back to asymmetric for large L (ops/plm.py
    estimate_fit_hbm_bytes / device_hbm_budget). An EXPLICIT
    "symmetric" request past the budget raises an actionable error
    instead of compiling into an OOM.

    solver: None picks the parametrization's default ("lbfgs" for
    symmetric — plmc parity — and "adam" for asymmetric).

    pad_sites_to / pad_rows_to: round the fitted site / sequence
    counts up to these multiples with inert padding (code -1 columns;
    weight-0 rows) so families with different (L, N) share one
    compiled XLA program in a sweep (shape-bucketed compile caching).
    Padding alters GEMM shapes and therefore float rounding; leave
    None (default) for exact-parity runs.

    Returns PlmResult (same fields as the reference PlmcResult).
    """
    # opt-in persistent XLA compilation cache (no-op unless
    # EVCOUPLINGS_COMPILE_CACHE is set): first-compile costs through
    # a remote tunnel dominate small fits, and cached programs load
    # in well under a second across processes
    from evcouplings_tpu._jax_cache import enable_persistent_cache

    enable_persistent_cache()

    verify_resources("Alignment file does not exist", alignment)

    # output locations may be in not-yet-existing run directories
    # (reference behavior: couplings/tools.py:196-211)
    create_prefix_folders(couplings_file)
    if param_file is not None:
        create_prefix_folders(param_file)

    if alphabet is None:
        alphabet = ALPHABET_PROTEIN
    if theta is None:
        theta = 0.8
    if scale is None:
        scale = 1.0
    if iterations is None:
        iterations = 100
    if lambda_h is None:
        lambda_h = 0.01
    if lambda_J is None:
        lambda_J = 0.01
    if lambda_g is None:
        lambda_g = 0.0

    prep = prepare_alignment(alignment, focus_seq=focus_seq,
                             alphabet=alphabet)
    codes = prep["codes"]
    N, L = codes.shape
    q = len(alphabet)
    if N == 0:
        raise ResourceError(
            "No valid sequences to fit: every row of {} contains "
            "symbols outside the alphabet in the selected columns. "
            "A2M/A3M alignments with lowercase insert columns need "
            "focus mode (focus_seq=...) to select the uppercase match "
            "columns.".format(alignment)
        )

    # O(N^2 L) reweighting on the MXU (gaps participate in identity,
    # reference alignment.py:1192-1233 semantics)
    cluster_sizes = num_cluster_members(codes, theta)
    weights = scale / cluster_sizes
    n_eff = float(weights.sum())

    # gap handling for the likelihood: with ignore_gaps, gap positions
    # are missing data (code -1 -> zero one-hot)
    fit_codes = codes
    if ignore_gaps:
        gap_code = 0      # gap is by convention first character
        fit_codes = np.where(codes == gap_code, -1, codes).astype(np.int8)

    # --- shape-bucketed site padding (compile-cache reuse) ----------
    # XLA compiles one program per distinct shape; a production sweep
    # over many families (each with its own L) otherwise pays a fresh
    # 20-40 s compile per family. pad_sites_to=k rounds the fitted
    # site count up to a multiple of k with inert -1 columns (zero
    # one-hot: no data contribution; zero coupling blocks: no
    # regularizer gradient), so families in the same bucket share one
    # compiled program. Padding changes GEMM shapes and therefore
    # float rounding — leave unset for exact-parity runs.
    L_fit = L
    if pad_sites_to:
        L_fit = -(-L // int(pad_sites_to)) * int(pad_sites_to)
        if L_fit != L:
            fit_codes = np.concatenate([
                fit_codes,
                np.full((N, L_fit - L), -1, dtype=np.int8),
            ], axis=1)

    # same bucketing on the N axis (rows are -1/weight-0, inert):
    # the fit pads rows to a block multiple anyway, but families with
    # different N would still land on different padded shapes
    fit_weights = weights
    if pad_rows_to:
        from evcouplings_tpu.ops.encode import pad_rows

        fit_codes, _ = pad_rows(fit_codes, int(pad_rows_to))
        fit_codes[N:] = -1
        fit_weights = np.pad(weights, (0, fit_codes.shape[0] - N))
    N_fit = fit_codes.shape[0]

    # --- parametrization routing (preflight HBM estimate) ----------
    def _fmt_bytes(b):
        return ("{:.1f} GiB".format(b / 2 ** 30) if b >= 2 ** 30
                else "{:.1f} MiB".format(b / 2 ** 20))

    # resolve the block sizes BEFORE the preflight so the estimate
    # sees the same block size — and through it the same grad layout
    # (the two-phase layout engages only at blocks >= 2048 and holds
    # the static one-hot + residuals resident) — that the fit will
    # use. The two paths prefer OPPOSITE block regimes, so each gets
    # its own default and the routing picks the winner's.
    # mesh axis sizes: rows shard over "data" only, sites over "model"
    n_data_shards, n_model_shards = 1, 1
    if mesh is not None:
        shape = dict(zip(mesh.axis_names, mesh.devices.shape))
        n_data_shards = int(shape.get("data", 1))
        n_model_shards = int(shape.get("model", 1))

    if block_size is None:
        # symmetric — parity (float32) mode: small blocks keep the
        # carried f32 accumulator VMEM-friendly (block sweep in
        # ops/plm.py). production (bfloat16) mode: the two-phase grad
        # layout wants LARGE blocks — pick the largest multiple of
        # 512 up to 8192 that divides the per-device 512-padded row
        # count, so the bigger block adds no extra padding waste.
        # (on a 2D data x model mesh, sizing by total device count
        # would under-estimate local rows by the model-axis factor
        # and pick a block that does not divide them)
        if compute_dtype == "bfloat16":
            # derived from the BUCKETED row count: with pad_rows set,
            # families in one bucket must resolve the same block (and
            # so the same compiled program) — sizing from the raw N
            # would defeat the bucketing
            k = max(1, -(-N_fit // (512 * n_data_shards)))
            d = max(d for d in range(1, 17) if k % d == 0)
            sym_block = 512 * d
        else:
            sym_block = 512
        # asymmetric: the carried (l_loc*q, Lq) accumulator is small,
        # so SMALL blocks win (v5e sweep at N=16k, L=160, bf16:
        # 1024 -> 7.2 ms/iter, 2048 -> 7.6, 4096 -> 11.7, 8192 -> 12.5
        # at steps_per_call 60)
        asym_block = 1024
    else:
        sym_block = asym_block = int(block_size)

    if parametrization not in ("auto", "symmetric", "asymmetric"):
        raise ValueError(
            "Invalid parametrization: {!r} (valid: auto, symmetric, "
            "asymmetric)".format(parametrization))
    parametrization_requested = parametrization

    # exact group-L1 needs the proximal solver; lbfgs/adam would only
    # apply the smoothed approximation (ops/plm.py PlmConfig.group_mode).
    # An explicit group_mode="smoothed" opts OUT of the fista routing —
    # it asks for the smooth approximation, which LBFGS handles.
    wants_exact_group = lambda_g > 0 and group_mode != "smoothed"
    sym_default_solver = "fista" if wants_exact_group else "lbfgs"

    if parametrization in ("auto", "symmetric"):
        sym_cfg = PlmConfig(
            solver=solver or sym_default_solver,
            dtype=compute_dtype,
            block_size=sym_block,
        )
        budget = ops_plm.device_hbm_budget()
        # the symmetric fit shards rows over "data" only; a size-m
        # model axis replicates them, so it does NOT reduce the
        # per-device footprint
        est = ops_plm.estimate_fit_hbm_bytes(
            N_fit, L_fit, q, sym_cfg, "symmetric",
            n_data_shards=n_data_shards,
        )
        if est > 0.9 * budget:
            if parametrization == "symmetric":
                raise MemoryError(
                    "Symmetric PLM fit at L={} (q={}) needs an "
                    "estimated {} of device memory but only "
                    "{} is available. Use 'parametrization: "
                    "asymmetric' (site-sharded per-site regressions; "
                    "add 'model_shards: k' to split sites across "
                    "devices), or leave parametrization unset to "
                    "route automatically.".format(
                        L, q, _fmt_bytes(est), _fmt_bytes(budget))
                )
            parametrization = "asymmetric"
        else:
            parametrization = "symmetric"

    if parametrization == "asymmetric":
        asym_cfg = PlmConfig(
            solver=solver or "adam",
            dtype=compute_dtype,
            block_size=asym_block,
        )
        budget = ops_plm.device_hbm_budget()
        est = ops_plm.estimate_fit_hbm_bytes(
            N_fit, L_fit, q, asym_cfg, "asymmetric",
            n_data_shards=n_data_shards, n_model_shards=n_model_shards,
        )
        if est > budget:
            raise MemoryError(
                "Asymmetric PLM fit at L={} (q={}) needs an estimated "
                "{} per device but only {} is "
                "available; shard sites across more devices "
                "('model_shards', currently {}).".format(
                    L, q, _fmt_bytes(est), _fmt_bytes(budget),
                    n_model_shards)
            )

    # the asymmetric path has no proximal solver — only the smoothed
    # group penalty (ops/plm_sites.py). Silently downgrading a
    # requested EXACT group-L1 fit because the alignment was large
    # enough to auto-route here would be the same quiet approximation
    # the fit_plm guard refuses — so refuse it here too.
    if parametrization == "asymmetric" and wants_exact_group:
        raise ValueError(
            "The asymmetric (site-sharded) fit supports only the "
            "SMOOTHED group-L1 approximation, but lambda_group > 0 "
            "without group_mode='smoothed' requests the exact "
            "penalty{}. Either pass group_mode='smoothed' to accept "
            "the approximation on this path, or force "
            "parametrization='symmetric' (solver 'fista') if the "
            "coupling matrix fits device memory.".format(
                " (auto-routing chose the asymmetric path for this "
                "problem size)" if parametrization_requested == "auto"
                else ""
            )
        )

    if solver is None:
        solver = ("adam" if parametrization == "asymmetric"
                  else sym_default_solver)
    block_size = (
        asym_block if parametrization == "asymmetric" else sym_block
    )
    # ----------------------------------------------------------------

    cfg = PlmConfig(
        lambda_h=float(lambda_h),
        lambda_J=float(lambda_J),
        lambda_group=float(lambda_g),
        max_iter=int(iterations),
        # relative-gradient stop (libLBFGS semantics); None keeps the
        # plmc-default 1e-5. Tighter values (e.g. 1e-10) run to the
        # float rounding floor — used by the oracle parity gates.
        **({} if conv_tol is None else {"conv_tol": float(conv_tol)}),
        solver=solver,
        block_size=int(block_size),
        steps_per_call=int(steps_per_call),
        dtype=compute_dtype,
        precision=matmul_precision,
        # the asymmetric path symmetrizes per-site solutions post fit
        # and is documented as approximate for group-L1; it keeps the
        # smoothed penalty (ops/plm_sites.py). The symmetric path
        # defaults to the exact proximal treatment via solver "fista";
        # group_mode="smoothed" opts back in to the smooth
        # approximation with any solver.
        group_mode=("smoothed" if parametrization == "asymmetric"
                    else (group_mode or "prox")),
    )
    if parametrization == "asymmetric":
        from evcouplings_tpu.ops.plm_sites import fit_plm_asym

        fit = fit_plm_asym(
            fit_codes, fit_weights, q, cfg, mesh=mesh, callback=callback,
            checkpoint_file=checkpoint_file,
            checkpoint_every=checkpoint_every,
        )
    elif parametrization == "symmetric":
        fit = fit_plm(
            fit_codes, fit_weights, q, cfg, mesh=mesh, callback=callback,
            checkpoint_file=checkpoint_file,
            checkpoint_every=checkpoint_every,
        )
    else:
        raise ValueError(
            "Invalid parametrization: {!r} (valid: symmetric, "
            "asymmetric)".format(parametrization))

    # drop the inert bucket-padding sites before scoring/persisting
    fit_J_ij = fit.J_ij[:L, :L] if L_fit != L else fit.J_ij
    fit_h_i = fit.h_i[:L] if L_fit != L else fit.h_i

    # weighted frequencies (no pseudocount) for the .model file
    f_i = frequencies(codes, weights, q)
    f_ij = pair_frequencies(codes, weights, q, f_i)

    # full-precision scoring for the raw EC file
    fn = _scores.fn_scores(fit_J_ij)
    cn = _scores.apc(fn)

    iter_table = pd.DataFrame(fit.iteration_table)

    # weight vector in plmc layout: all sequences in original order,
    # invalid rows with weight 0
    all_weights = np.zeros(prep["num_total_seqs"])
    all_weights[prep["valid_index"]] = weights

    model = CouplingsModel.from_params(
        J_ij=fit_J_ij,
        h_i=fit_h_i,
        f_i=f_i,
        f_ij=f_ij,
        alphabet=alphabet,
        target_seq=prep["target_seq"],
        index_list=prep["index_list"],
        weights=all_weights,
        theta=float(theta),
        lambda_h=float(lambda_h),
        lambda_J=float(lambda_J),
        lambda_group=float(lambda_g),
        N_valid=prep["num_valid_seqs"],
        N_invalid=prep["num_total_seqs"] - prep["num_valid_seqs"],
        num_iter=fit.num_iter,
        N_eff=n_eff,
    )

    if param_file is not None:
        model.to_file(param_file, precision="float32",
                      file_format="plmc_v2")

    write_raw_ec_file(
        couplings_file, prep["index_list"], prep["target_seq"], fn, cn
    )

    if fit.converged:
        status = "converged"
    elif getattr(fit, "ls_failed", False):
        # libLBFGS rounding-error / max-linesearch outcome: the fit
        # stopped at floating-point resolution before the gradient
        # criterion — distinct from convergence, like plmc's status
        status = "line search failed at floating-point resolution"
    else:
        status = "maximum number of iterations reached"

    return PlmResult(
        couplings_file, param_file,
        iter_table, prep["focus_index"],
        prep["num_valid_seqs"], prep["num_total_seqs"],
        prep["num_valid_sites"], prep["num_total_sites"],
        prep["region_start"], n_eff,
        status,
    )
