"""
Pseudolikelihood-maximization (PLM) Potts-model fit — the TPU-native
replacement for the external `plmc` C binary (reference wrapper:
evcouplings/couplings/tools.py:126-307; reference build docs README.md:37-43).

Model
-----
P(x_r = a | x_{-r}) = softmax_a( h_r(a) + sum_{j != r} J_rj(a, x_j) )

loss(h, J) = - sum_s w_s sum_r log P(x_sr | x_s,-r)
             + lambda_h ||h||^2 + lambda_J sum_{i<j} ||J_ij||^2
             [+ lambda_group * sum_{i<j} ||J_ij||_F   (smoothed group-L1)]

TPU-first design
----------------
- The coupling tensor is stored directly in flat (L*q, L*q) layout with
  J_flat[(r,a),(j,b)] = J[r,j,a,b]; pair symmetry J[j,i,b,a] == J[i,j,a,b]
  is then plain matrix symmetry, enforced as J_eff = 0.5 (P + P^T) with the
  L diagonal q x q blocks masked to zero. Initialized symmetric, the
  gradient stays symmetric, so the shared-parameter semantics of plmc are
  preserved exactly.
- Per-site conditional logits for a whole block of sequences are ONE MXU
  matmul: logits = onehot(B, Lq) @ J_eff^T + h. The same matmul powers the
  backward pass (onehot^T @ softmax-residuals), so the entire gradient is
  MXU work. Blocks are streamed with lax.scan so HBM holds only codes
  (int8), parameters, and optimizer state — never the N x L x q one-hot.
- Across a device mesh, rows are sharded on the "data" axis via shard_map;
  the block-local negative log-likelihood and gradient contributions are
  merged with psum. Parameters and LBFGS state are replicated.
- Optimizer: native scan-chained L-BFGS on one flat master vector
  (ops/lbfgs.py: rho-masked two-loop recursion, libLBFGS-style
  backtracking strong-Wolfe linesearch), entirely jit-compiled with
  steps_per_call iterations chained per host round trip. Adam fallback
  for very large L where LBFGS history would not fit HBM.
"""

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from evcouplings_tpu.ops.encode import pad_rows
from evcouplings_tpu.ops._jax_compat import (
    pvary as _pvary,
    shard_map as _shard_map,
    tree_norm as _tree_norm,
)
from evcouplings_tpu.ops.lbfgs import init_lbfgs_state, make_lbfgs_chunk


@dataclass(frozen=True)
class PlmConfig:
    """Fit hyperparameters (mirrors the plmc CLI surface).

    lambda_J is the per-pair l2 strength AFTER any (q-1)(L-1) scaling done
    by the calling protocol (reference couplings/protocol.py:157-179).
    """
    lambda_h: float = 0.01
    lambda_J: float = 16.0
    lambda_group: float = 0.0
    # group-L1 semantics when lambda_group > 0:
    #   "prox"     — the EXACT nonsmooth penalty
    #                lambda_group * sum_{i<j} ||J_ij||_F, handled by a
    #                proximal step (group soft-thresholding; blocks
    #                reach exactly zero). Requires solver "fista";
    #                requesting it with lbfgs/adam raises (those
    #                optimizers assume a smooth objective).
    #   "smoothed" — sqrt(||J_ij||^2 + group_eps) with any solver.
    #                Objective error vs the exact penalty is bounded by
    #                0.5 * lambda_group * L(L-1)/2 * sqrt(group_eps)
    #                (sqrt(s+e) - sqrt(s) <= sqrt(e)); with the default
    #                group_eps = 1e-12 that is <= 5e-7 * lambda_group
    #                per pair — negligible unless the optimum drives
    #                blocks to exactly zero, which only the prox path
    #                represents.
    group_mode: str = "prox"
    group_eps: float = 1e-12
    max_iter: int = 100
    conv_tol: float = 1e-5          # ||g|| <= tol * max(1, ||x||), libLBFGS-style
    memory_size: int = 5
    solver: str = "lbfgs"           # "lbfgs" | "adam" | "fista"
    adam_lr: float = 5e-3
    # block-size sweep on TPU v5e (N=16384, L=160, fused closed-form
    # grad): 512 (361M seq*site/s) > 1024 (355M) > 2048 (325M) >
    # 4096 > 8192 > 16384 — small blocks keep the f32 dJ accumulator
    # and activations VMEM-resident between GEMMs
    block_size: int = 512
    # compute dtype: "float32" (+ precision "highest") is the parity
    # mode; "bfloat16" is the production throughput mode (bf16 compute
    # with float32 master parameters and gradients)
    dtype: str = "float32"
    precision: str = "highest"      # matmul precision: highest|high|default
    # optimizer steps chained on-device per host round-trip. The device
    # time of one grad eval is ~5 ms at (N=16k, L=160) while a host
    # dispatch through the TPU tunnel costs about as much again, so
    # chunking steps into one lax.scan nearly doubles throughput. With
    # k > 1 convergence is only checked every k steps (the iteration
    # table is still recorded per step and truncated at the first
    # converged iteration); keep 1 for exact plmc stop-at-convergence
    # parity.
    steps_per_call: int = 1
    # dJh gradient accumulation layout:
    #   "carried"   — f32 (Lq, Lq_aug) accumulator carried through the
    #                 block scan; HBM holds only codes + params. Works
    #                 at any N; the parity (float32) mode.
    #   "two_phase" — per-block softmax residuals r (compute dtype)
    #                 are written as scan outputs and dJh is ONE
    #                 K = N_local GEMM r^T @ onehot against a
    #                 precomputed static augmented one-hot. Removes
    #                 the per-block accumulator round trips; measured
    #                 +6% step throughput on v5e at block 8192 (418M
    #                 vs 393M seq*site/s) — but holds the one-hot and
    #                 the residuals (~2 x N_local*Lq*2 bytes bf16)
    #                 resident in HBM. Best with LARGE blocks (8192);
    #                 the carried layout prefers small ones (512).
    #   "auto"      — two_phase iff dtype is bfloat16 and the one-hot
    #                 fits _ONEHOT_HBM_BUDGET, else carried.
    grad_layout: str = "auto"
    # Adam-path epilogue: "on" runs the fused Pallas kernel
    # (ops/plm_update.py: symmetrize + l2 + Adam moments + bf16 J
    # emit in one HBM pass; on CPU it runs in interpret mode — slow,
    # for tests). MEASURED NO-WIN on v5e: the chip's streaming HBM
    # bandwidth is ~330 GB/s for Pallas and XLA alike, XLA already
    # fuses the epilogue to near-minimal traffic AND overlaps it with
    # the MXU-bound GEMM phases, while a pallas_call serializes
    # (kernel alone 1.05 ms vs 0.92 ms for the whole XLA epilogue;
    # full step 6.75 vs 6.21 ms at N=16k, L=160, block 8192). "auto"
    # therefore resolves to off; the kernel is kept for hardware with
    # a higher HBM:dispatch ratio. The fused path matches the unfused
    # optax path up to float rounding, not bitwise.
    fused_update: str = "auto"


from collections import namedtuple

# Per-GEMM precision triple. TPU MXUs decompose an f32 operand into
# bf16 limbs per its operand precision (DEFAULT 1, HIGH 2, HIGHEST 3);
# an N-limb x M-limb dot runs the significant limb-pair passes. Every
# GEMM on the PLM hot path has ONE operand that is exactly
# bf16-representable — the 0/1 one-hot or the 0/1 segment matrix — so
# its extra limbs are exactly zero and their passes contribute nothing.
# Pairing DEFAULT on that operand with HIGHEST on the f32 operand keeps
# every nonzero product term at 3 MXU passes instead of 6. Measured on
# TPU v5e (N=16384, L=160): loss BITWISE equal to full HIGHEST,
# gradients within a few f32 ulps (the pass accumulation order
# differs), 1.76x step throughput (17.7 vs 31.2 ms/eval) — asserted by
# tests/test_plm.py::test_structured_precision_matches_unstructured.
#   base       — both operands general (vector dots, fallback)
#   exact_lhs  — the LHS is exactly representable (one-hot)
#   exact_rhs  — the RHS is exactly representable (one-hot/segment)
_PrecTriple = namedtuple("_PrecTriple", "base exact_lhs exact_rhs")


def _precision(name):
    P = jax.lax.Precision
    table = {
        "highest": P.HIGHEST,
        "high": P.HIGH,
        "default": P.DEFAULT,
        # escape hatches: symmetric-operand precision on every GEMM
        # (A/B references for the structured defaults below)
        "highest_unstructured": P.HIGHEST,
        "high_unstructured": P.HIGH,
    }
    if name not in table:
        raise ValueError(
            "Unknown precision: {!r} (valid: {})".format(
                name, ", ".join(table)
            )
        )
    base = table[name]
    if name == "highest":
        return _PrecTriple(
            base, (P.DEFAULT, P.HIGHEST), (P.HIGHEST, P.DEFAULT)
        )
    if name == "high":
        # same structure one tier down: 2 MXU passes instead of 3,
        # keeping both contributing limb products of the f32 operand
        return _PrecTriple(
            base, (P.DEFAULT, P.HIGH), (P.HIGH, P.DEFAULT)
        )
    return _PrecTriple(base, base, base)


def _diag_block_mask(L, q, dtype):
    """(Lq, Lq) mask that zeroes the L diagonal q x q blocks (computed via
    iota comparison; XLA fuses it into the consumer without materializing)."""
    lq = L * q
    site = jax.lax.broadcasted_iota(jnp.int32, (lq, lq), 0) // q
    site_t = jax.lax.broadcasted_iota(jnp.int32, (lq, lq), 1) // q
    return (site != site_t).astype(dtype)


def _make_local_nll(L, q, block_size, prec, dtype, axis_name=None):
    """Block-streamed negative log pseudolikelihood over local rows.

    codes: (N_local_pad, L) int8 with -1 meaning "no contribution"
    (one_hot of -1 is the zero vector, which simultaneously removes the
    site's conditional term and its context contribution — used for
    ignore_gaps mode and row padding).

    The scalar accumulator carries in the f32-or-wider accumulation
    dtype regardless of the compute dtype: at bf16 an 8-bit-mantissa
    running sum of ~1e5-magnitude block NLLs loses ~3 significant
    digits, which is enough to poison a backtracking acceptance test
    that compares this loss against the closed-form vg path (whose
    accumulator was always f32). For f32/f64 compute this is a no-op.
    """
    lq = L * q
    acc = jnp.promote_types(dtype, jnp.float32)

    def local_nll(J_eff, h_flat, codes, weights):
        n_pad = codes.shape[0]
        if n_pad % block_size:
            raise ValueError(
                "codes rows ({}) must be a multiple of block_size "
                "({}): the block scan would silently drop the "
                "remainder rows. Pad with code -1 / weight-0 rows "
                "(ops.encode.pad_rows) as fit_plm does.".format(
                    n_pad, block_size)
            )
        num_blocks = n_pad // block_size

        def body(carry, block_idx):
            start = block_idx * block_size
            c = jax.lax.dynamic_slice_in_dim(codes, start, block_size, 0)
            w = jax.lax.dynamic_slice_in_dim(weights, start, block_size, 0)
            oh = jax.nn.one_hot(c, q, dtype=dtype).reshape(
                block_size, lq
            )

            # (B, Lq) @ (Lq, Lq): per-site conditional logits for the block
            logits = jax.lax.dot_general(
                oh, J_eff,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=dtype,
                precision=prec.exact_lhs,
            ) + h_flat[None, :]

            logp = jax.nn.log_softmax(
                logits.reshape(block_size, L, q), axis=-1
            ).reshape(block_size, lq)

            # sum_r log P(x_sr | ...) as a masked gather via the one-hot
            per_seq = jnp.sum(oh * logp, axis=1)
            block_nll = jnp.dot(
                w.astype(dtype), per_seq, precision=prec.base,
                preferred_element_type=acc,
            )
            return carry - block_nll, None

        init = jnp.zeros((), dtype=acc)
        if axis_name is not None:
            # inside shard_map the carry becomes varying along the data
            # axis; mark the init accordingly
            init = _pvary(init, (axis_name,))
        total, _ = jax.lax.scan(
            body, init, jnp.arange(num_blocks, dtype=jnp.int32),
        )
        return total

    return local_nll


# lower clamp on (logits - rowmax) before exp. The shift uses the
# whole-ROW max (cheap full VPU reduction), so a site whose logits all
# sit far below the row max could underflow its entire q-segment of
# e to zero -> Z = 0 -> inf/NaN residuals poisoning the whole fit.
# exp(-80) = 1.8e-35 is a normal number in both f32 and bf16 (their
# exponent ranges match), so Z >= q * exp(-80) can never hit zero.
# For any site within ~80 nats of the row max the clamp only touches
# lanes whose contribution is below f32 resolution anyway — bitwise
# neutral for healthy fits, finite gradients for diverging ones.
_SOFTMAX_SHIFT_FLOOR = -80.0


def _make_block_math(L, q, prec, dtype, acc_dtype):
    """Shared per-block math of the closed-form PLM gradient: the
    logits GEMM, segment-GEMM softmax, block NLL, and the weighted
    softmax residual r = w * (softmax * m - onehot). Used by both the
    carried and the two-phase grad layouts (which differ only in how
    dJh is accumulated from r)."""
    lq = L * q

    def seg_matrix():
        # segment matrix mapping lane (l, a) -> site l: per-site
        # softmax sums and their broadcast back to Lq lanes become two
        # small MXU GEMMs (K = Lq and K = L) instead of reductions
        # over 21-wide lane segments, which the VPU handles poorly
        # (measured +13% step throughput vs jax.nn.log_softmax on
        # v5e). Built from iota so it folds to a device constant.
        return (
            jax.lax.broadcasted_iota(jnp.int32, (lq, L), 0) // q
            == jax.lax.broadcasted_iota(jnp.int32, (lq, L), 1)
        ).astype(dtype)

    def block_nll_residual(J_aug, oh_aug, c, w, seg):
        """(block NLL contribution, residual r) for one row block.

        oh_aug: (B, Lq_aug) ones-augmented one-hot of codes c; w
        already cast to the compute dtype."""
        oh = oh_aug[:, :lq]

        logits = jax.lax.dot_general(
            oh_aug, J_aug,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=prec.exact_lhs,
        )

        # softmax via the segment GEMMs; the whole-row max (a
        # lane-friendly full reduction, unlike per-site maxima)
        # keeps exp in range, with the shift floored so no site's
        # q-segment can underflow Z to zero (see
        # _SOFTMAX_SHIFT_FLOOR)
        rowmax = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(jnp.maximum(logits - rowmax, _SOFTMAX_SHIFT_FLOOR))
        Z = jax.lax.dot_general(
            e, seg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
            precision=prec.exact_rhs,
        )

        # sum_r log P(x_sr|..) = sum_r [logit_obs - rowmax -
        # log Z_r]; the observed-logit gather rides the one-hot
        # (TPU gathers serialize; the VPU mul+reduce does not),
        # and m zeroes gap / padding positions
        m_acc = (c >= 0).astype(acc_dtype)
        obs = jnp.sum(oh * logits, axis=1).astype(acc_dtype)
        logZ = jnp.sum(
            (jnp.log(Z) + rowmax.astype(acc_dtype)) * m_acc,
            axis=1,
        )
        nll_b = -jnp.dot(
            w.astype(acc_dtype), obs - logZ,
            precision=prec.base,
            preferred_element_type=acc_dtype,
        )

        # residual r = w * (softmax * m - oh); the masked
        # reciprocal broadcasts back to lanes through seg^T
        rz = (m_acc / Z).astype(dtype)
        bcast = jax.lax.dot_general(
            rz, seg,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=dtype,
            precision=prec.exact_rhs,
        )
        r = w[:, None] * (e * bcast - oh)
        return nll_b, r

    return seg_matrix, block_nll_residual


def _make_local_value_and_grad(L, q, block_size, prec, dtype,
                               axis_name=None, acc_dtype=jnp.float32):
    """Block-streamed NLL value AND gradient in one fused scan.

    Autodiff through the block scan stores per-block residuals (the
    one-hot and log-softmax tensors) during the forward pass and
    replays them in a separate backward scan — ~2x the HBM epilogue
    traffic of the matmuls themselves. The PLM gradient has a closed
    form, so this computes it in the same pass instead:

        r     = w * (softmax(logits) * m - onehot)     # m: non-gap mask
        dJh  += r^T @ [onehot | 1 | 0]  (MXU, f32 accumulation)

    nothing is stored across blocks except the f32 accumulators. The
    (p * m - oh) form makes gapped / padded positions (code -1, zero
    one-hot column, m = 0) contribute exactly zero, matching the
    autodiff gradient of the masked-gather objective.

    Takes the augmented parameter matrix J_aug (Lq_aug, Lq) with h in
    row Lq — the logits GEMM then includes the fields via the ones
    column of the augmented one-hot, and the gradient GEMM lands dh in
    column Lq of dJh. Fusing dh into the contraction (rather than a
    separate jnp.sum) also pins its reduction order, which keeps
    single- vs multi-process fits bitwise identical.

    The per-site softmax itself is MXU work too: summing exp(logits)
    over each site's q lanes and broadcasting the reciprocal back are
    two GEMMs against a (Lq, L) segment matrix — q = 21 segments are
    hostile to VPU lane reductions (see the in-body comments for the
    measured numbers).
    """
    lq = L * q
    lq_aug = _augmented_width(lq)
    seg_matrix, block_nll_residual = _make_block_math(
        L, q, prec, dtype, acc_dtype
    )

    def local_vg(J_aug, codes, weights):
        n_pad = codes.shape[0]
        if n_pad % block_size:
            raise ValueError(
                "codes rows ({}) must be a multiple of block_size "
                "({}): the block scan would silently drop the "
                "remainder rows. Pad with code -1 / weight-0 rows "
                "(ops.encode.pad_rows) as fit_plm does.".format(
                    n_pad, block_size)
            )
        num_blocks = n_pad // block_size
        seg = seg_matrix()

        def body(carry, block_idx):
            nll, dJh = carry
            start = block_idx * block_size
            c = jax.lax.dynamic_slice_in_dim(codes, start, block_size, 0)
            w = jax.lax.dynamic_slice_in_dim(
                weights, start, block_size, 0
            ).astype(dtype)
            oh_aug = _augment_ones(
                jax.nn.one_hot(c, q, dtype=dtype).reshape(
                    block_size, lq
                ),
                lq_aug, dtype,
            )

            nll_b, r = block_nll_residual(J_aug, oh_aug, c, w, seg)
            nll = nll + nll_b
            dJh = dJh + jax.lax.dot_general(
                r, oh_aug,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
                precision=prec.exact_rhs,
            )
            return (nll, dJh), None

        init = (
            jnp.zeros((), dtype=acc_dtype),
            jnp.zeros((lq, lq_aug), dtype=acc_dtype),
        )
        if axis_name is not None:
            init = jax.tree.map(
                lambda x: _pvary(x, (axis_name,)), init
            )
        (nll, dJh), _ = jax.lax.scan(
            body, init, jnp.arange(num_blocks, dtype=jnp.int32),
        )
        return nll, dJh

    return local_vg


# HBM budget for the static augmented one-hot of the two-phase grad
# layout (the residual buffer written per step is the same size again;
# v5e has 16 GB HBM, parameters/optimizer state need ~0.2 GB at L=160)
_ONEHOT_HBM_BUDGET = 2 * 1024 ** 3


def _resolve_grad_layout(cfg, dtype, local_rows, lq_aug):
    """Pick the dJh accumulation layout (see PlmConfig.grad_layout)."""
    if cfg.grad_layout != "auto":
        if cfg.grad_layout not in ("carried", "two_phase"):
            raise ValueError(
                "Unknown grad_layout: {}".format(cfg.grad_layout)
            )
        return cfg.grad_layout
    onehot_bytes = local_rows * lq_aug * jnp.dtype(dtype).itemsize
    # two-phase only pays off with large phase-1 blocks (at block 512
    # it measures slightly BELOW the carried layout), so auto keeps
    # small-block configs on the carried path
    if (dtype == jnp.bfloat16 and onehot_bytes <= _ONEHOT_HBM_BUDGET
            and cfg.block_size >= 2048):
        return "two_phase"
    return "carried"


def device_hbm_budget():
    """Per-device memory budget in bytes for the preflight router
    (couplings/fitter.py parametrization="auto").

    Resolution order: EVCOUPLINGS_HBM_BYTES environment variable
    (simulated budgets in tests / user override), the device's
    reported bytes_limit, then a conservative 16 GiB (TPU v5e HBM).
    """
    env = os.environ.get("EVCOUPLINGS_HBM_BYTES")
    if env:
        return int(float(env))
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return 16 * 1024 ** 3


def estimate_fit_hbm_bytes(n, l, q, cfg: "PlmConfig",
                           parametrization="symmetric",
                           n_data_shards=1, n_model_shards=1):
    """Rough per-device peak-HBM estimate of a PLM fit, in bytes.

    Counts the resident arrays of the chosen path (master parameters,
    gradient, optimizer state, the grad-layout working set, codes /
    one-hot inputs) plus a 25% allocator slack. Used by the couplings
    protocol to route large-L fits to the asymmetric site-sharded
    parametrization (or fail with an actionable message) BEFORE
    burning a compile + OOM. Deliberately a cheap closed form, not an
    XLA memory analysis — treat as +-30%.
    """
    f32 = 4
    comp = 2 if cfg.dtype == "bfloat16" else 4
    lq = l * q
    lq_aug = _augmented_width(lq)
    n_loc = -(-n // max(1, n_data_shards))
    codes_bytes = n_loc * l                       # int8 rows

    if parametrization == "asymmetric":
        # per-site conditional regressions: params (L_loc, q, Lq_aug)
        # in f32 plus solver state; inputs are the shared one-hot
        l_loc = -(-l // max(1, n_model_shards))
        d = l_loc * q * lq_aug
        params = d * f32
        grad = d * f32
        if cfg.solver == "lbfgs":
            opt = (2 * cfg.memory_size + 4) * d * f32
        else:
            opt = 2 * d * f32
        onehot = n_loc * lq_aug * comp
        act = cfg.block_size * (lq_aug + l_loc * q) * comp
        total = params + grad + opt + onehot + act + codes_bytes
    else:
        # symmetric flat (Lq, Lq_aug) coupling matrix, replicated
        d = lq * lq_aug
        params = d * f32
        grad = d * f32
        if cfg.solver == "lbfgs":
            # two (m, D) history arrays + ~4 D-sized work vectors
            opt = (2 * cfg.memory_size + 4) * d * f32
        else:
            opt = 2 * d * f32                     # adam moments
        layout = _resolve_grad_layout(
            cfg, jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
            n_loc, lq_aug,
        )
        if layout == "two_phase":
            # static augmented one-hot + per-step residual buffer
            work = 2 * n_loc * lq_aug * comp
        else:
            # carried f32 accumulator + per-block one-hot/activations
            work = d * f32 + 2 * cfg.block_size * lq_aug * comp
        total = params + grad + opt + work + codes_bytes

    return int(total * 1.25)


def fit_fingerprint(codes, weights, num_symbols, cfg):
    """Identity of a fit for checkpoint-resume safety: the data plus
    every configuration field that shapes the optimization trajectory.
    max_iter / steps_per_call / checkpoint cadence are deliberately
    excluded — resuming with a raised iteration cap is legitimate.
    A snapshot whose fingerprint differs was written by a DIFFERENT
    fit (edited hyperparameters, different alignment/weights) and must
    not be silently resumed."""
    import hashlib

    h = hashlib.sha256()
    h.update(np.ascontiguousarray(codes, dtype=np.int8).tobytes())
    h.update(np.asarray(weights, dtype=np.float64).tobytes())
    h.update(repr((
        int(num_symbols), cfg.lambda_h, cfg.lambda_J, cfg.lambda_group,
        cfg.solver, cfg.adam_lr, cfg.block_size, cfg.dtype,
        cfg.precision, cfg.memory_size, cfg.conv_tol, cfg.grad_layout,
        # the fused Pallas epilogue matches the unfused path only up
        # to float rounding, so switching it mid-fit is a different
        # trajectory
        cfg.fused_update,
    ) + ((cfg.group_mode, cfg.group_eps)
         if cfg.lambda_group > 0 else ())).encode())
    return h.hexdigest()


def _check_ckpt_fingerprint(ckpt, fingerprint, checkpoint_file):
    """Reject a snapshot written by a different fit configuration
    (older snapshots without a fingerprint are accepted)."""
    if "fingerprint" not in getattr(ckpt, "files", ()):
        return
    saved = str(ckpt["fingerprint"])
    if saved != fingerprint:
        raise ValueError(
            "Checkpoint {} was written by a DIFFERENT fit "
            "configuration or input data (fingerprint {}... vs "
            "{}...); delete it to start this fit fresh instead of "
            "silently resuming a mixed-objective optimization.".format(
                checkpoint_file, saved[:12], fingerprint[:12])
        )


def build_augmented_onehot(codes, q, dtype):
    """(N, Lq_aug) ones-augmented one-hot of an int code matrix —
    the static per-fit input of the two-phase gradient layout
    (PlmConfig.grad_layout). Entries of -1 (gap / padding) one-hot to
    the zero vector. Build this ONCE per fit outside the step loop:
    rebuilding it per step costs the entire two-phase win (measured
    367M vs 418M seq*site/s on v5e at N=16384, L=160)."""
    n, L = codes.shape
    lq = L * q
    lq_aug = _augmented_width(lq)
    return _augment_ones(
        jax.nn.one_hot(codes, q, dtype=dtype).reshape(n, lq),
        lq_aug, dtype,
    )


def _make_local_value_and_grad_two_phase(L, q, block_size, prec, dtype,
                                         axis_name=None,
                                         acc_dtype=jnp.float32):
    """Two-phase variant of _make_local_value_and_grad.

    Phase 1 streams row blocks computing the NLL and the softmax
    residuals r = w * (softmax * m - onehot), writing r (compute
    dtype) as scan outputs instead of carrying an f32 (Lq, Lq_aug)
    accumulator; phase 2 computes dJh = r_all^T @ onehot_all as ONE
    MXU GEMM with K = N_local. Same math, different reduction order
    (the MXU accumulates the K axis in f32 internally); removes the
    per-block accumulator HBM round trips. Requires the augmented
    one-hot precomputed per fit (build_augmented_onehot).
    """
    lq = L * q
    seg_matrix, block_nll_residual = _make_block_math(
        L, q, prec, dtype, acc_dtype
    )

    def local_vg(J_aug, codes, weights, oh_all):
        n_pad = codes.shape[0]
        if n_pad % block_size:
            raise ValueError(
                "codes rows ({}) must be a multiple of block_size "
                "({}): the block scan would silently drop the "
                "remainder rows. Pad with code -1 / weight-0 rows "
                "(ops.encode.pad_rows) as fit_plm does.".format(
                    n_pad, block_size)
            )
        num_blocks = n_pad // block_size
        seg = seg_matrix()

        def body(nll, block_idx):
            start = block_idx * block_size
            oh_aug = jax.lax.dynamic_slice_in_dim(
                oh_all, start, block_size, 0
            )
            c = jax.lax.dynamic_slice_in_dim(codes, start, block_size, 0)
            w = jax.lax.dynamic_slice_in_dim(
                weights, start, block_size, 0
            ).astype(dtype)

            nll_b, r = block_nll_residual(J_aug, oh_aug, c, w, seg)
            return nll + nll_b, r.astype(dtype)

        init = jnp.zeros((), dtype=acc_dtype)
        if axis_name is not None:
            init = _pvary(init, (axis_name,))
        nll, r_all = jax.lax.scan(
            body, init, jnp.arange(num_blocks, dtype=jnp.int32),
        )

        dJh = jax.lax.dot_general(
            r_all.reshape(n_pad, lq), oh_all,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
            precision=prec.exact_rhs,
        )
        return nll, dJh

    return local_vg


def _augmented_width(lq):
    """Width of the ones-augmented one-hot: Lq + 1 rounded up to a
    multiple of 128. A width of exactly Lq+1 (odd) makes the augmented
    axis the CONTRACTION dimension of the logits GEMM, which destroys
    MXU tiling (measured 5x slower at L=160, q=21); the zero padding
    costs (Lq_aug/Lq)^2 - 1 ~ 3% extra flops instead."""
    return max(lq + 1, ((lq + 1 + 127) // 128) * 128)


def _build_j_aug(params, L, q, dtype, lq_aug, symmetric=False):
    """Augmented coupling matrix (Lq_aug, Lq): symmetrized + masked
    J_eff rows, the fields h as row Lq, zero MXU-padding rows.

    symmetric=True asserts that P is exactly symmetric (true inside
    fits: symmetric init, exactly-symmetrized gradients, elementwise
    optimizer updates — both Adam and the LBFGS two-loop/linesearch
    preserve it) and skips the strided transposed read:
    P * mask == 0.5 * (P + P^T) * mask bitwise on symmetric P."""
    lq = L * q
    mask = _diag_block_mask(L, q, dtype)
    P_c = params["J"].astype(dtype)
    if symmetric:
        J_eff = P_c * mask
    else:
        J_eff = 0.5 * (P_c + P_c.T) * mask
    return _assemble_aug_rows(
        J_eff, params["h"].astype(dtype), lq, lq_aug, dtype
    )


def _assemble_aug_rows(J_eff, h_row, lq, lq_aug, dtype):
    """Stack the augmented-matrix row layout shared by every builder:
    J_eff rows, the fields as row Lq, zero MXU-padding rows up to
    lq_aug."""
    parts = [J_eff, h_row.reshape(1, lq)]
    if lq_aug > lq + 1:
        parts.append(jnp.zeros((lq_aug - lq - 1, lq), dtype=dtype))
    return jnp.concatenate(parts, axis=0)


def _resolve_fused_update(cfg, mesh, master_dtype):
    """Decide whether the fit uses the fused Pallas Adam epilogue.

    Returns (enabled, interpret). "auto" always resolves to off (the
    measured result below); forcing "on" requires the adam solver
    with smooth regularizer, f32 masters, and a single device, and
    runs the kernel in interpret mode off-TPU (tests).
    """
    if cfg.fused_update == "off":
        return False, False
    eligible = (
        cfg.solver == "adam"
        and cfg.lambda_group == 0
        and master_dtype == jnp.float32
        # the Pallas epilogue updates the replicated arrays outside
        # shard_map; on a multi-device mesh that path is untested and
        # would bypass the sharded gradient contract
        and (mesh is None or mesh.devices.size == 1)
    )
    if cfg.fused_update == "on":
        if not eligible:
            raise ValueError(
                "fused_update='on' requires the adam solver, "
                "lambda_group=0, float32 master parameters, and a "
                "single-device (or absent) mesh"
            )
        try:
            platform = jax.devices()[0].platform
        except RuntimeError:
            platform = "cpu"
        return True, platform not in ("tpu", "axon")
    if cfg.fused_update != "auto":
        raise ValueError(
            "Unknown fused_update: {}".format(cfg.fused_update)
        )
    # auto: off. Measured on v5e (see PlmConfig.fused_update): the
    # XLA epilogue is already traffic-minimal and overlaps with the
    # GEMM phases; the serialized Pallas pass loses ~8% end to end.
    return False, False


def _augment_ones(oh, lq_aug, dtype):
    """[oh | 1 | 0...] — one-hot block, a ones column at index Lq, and
    zero padding up to lq_aug (see _augmented_width)."""
    b, lq = oh.shape
    parts = [oh, jnp.ones((b, 1), dtype=dtype)]
    if lq_aug > lq + 1:
        parts.append(jnp.zeros((b, lq_aug - lq - 1), dtype=dtype))
    return jnp.concatenate(parts, axis=1)


def make_plm_nll_vg(L, q, cfg: PlmConfig, mesh=None):
    """Build nll_vg(J_aug, codes, weights, oh_aug) -> (nll, dJh): the
    data term of the PLM objective and its raw closed-form gradient
    GEMM output (dJ_eff in columns :Lq, dh in column Lq), psum-merged
    across the mesh "data" axis if one is given. The epilogue
    (regularizers, symmetrization, optimizer) is layered on top by
    make_plm_value_and_grad or by the fused fit path."""
    dtype = jnp.dtype(cfg.dtype)
    # accumulator / master dtype: f32, or f64 for float64 parity runs
    acc = jnp.promote_types(dtype, jnp.float32)
    prec = _precision(cfg.precision)
    axis_name = None if mesh is None else "data"
    lq = L * q
    lq_aug = _augmented_width(lq)
    local_vg = _make_local_value_and_grad(
        L, q, cfg.block_size, prec, dtype, axis_name=axis_name,
        acc_dtype=acc,
    )
    local_vg_tp = _make_local_value_and_grad_two_phase(
        L, q, cfg.block_size, prec, dtype, axis_name=axis_name,
        acc_dtype=acc,
    )
    # rows shard over the "data" axis only; other mesh axes (e.g. a
    # "model" axis on a 2D mesh) replicate them, so sizing local rows
    # by devices.size would under-estimate by the model-axis factor
    # and could route the two-phase layout past its HBM budget
    n_shards = (
        1 if mesh is None
        else int(dict(mesh.shape).get("data", mesh.devices.size))
    )

    def nll_vg(J_aug, codes, weights, oh_aug):
        layout = _resolve_grad_layout(
            cfg, dtype, codes.shape[0] // n_shards, lq_aug
        )
        if layout == "two_phase" and oh_aug is None:
            # correct but slow fallback — callers on the hot path
            # (fit_plm, bench) precompute this once per fit
            oh_aug = build_augmented_onehot(codes, q, dtype)

        if mesh is None:
            if layout == "two_phase":
                return local_vg_tp(J_aug, codes, weights, oh_aug)
            return local_vg(J_aug, codes, weights)

        from jax.sharding import PartitionSpec as P

        if layout == "two_phase":
            def shard_fn(J_aug, codes, weights, oh_aug):
                nll, dJh = local_vg_tp(J_aug, codes, weights, oh_aug)
                return (
                    jax.lax.psum(nll, "data"),
                    jax.lax.psum(dJh, "data"),
                )

            return _shard_map(
                shard_fn, mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P("data")),
                out_specs=(P(), P()),
            )(J_aug, codes, weights, oh_aug)

        def shard_fn(J_aug, codes, weights):
            nll, dJh = local_vg(J_aug, codes, weights)
            return (
                jax.lax.psum(nll, "data"),
                jax.lax.psum(dJh, "data"),
            )

        return _shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=(P(), P()),
        )(J_aug, codes, weights)

    return nll_vg


def make_plm_value_and_grad(L, q, cfg: PlmConfig, mesh=None,
                            symmetric_params=False):
    """Build vg(params, codes, weights) -> (loss, grads) with the NLL
    gradient computed in closed form (see _make_local_value_and_grad)
    and the regularizer terms in closed form as well (the lambda_J l2
    gradient through the symmetric gauge is exactly
    0.5*((dJ + lambda_J P) + (dJ + lambda_J P)^T) * mask — one fused
    elementwise pass, no autodiff recompute of J_eff).

    Equivalent to jax.value_and_grad(make_plm_loss(...)) up to
    float reduction order — asserted by tests — but with no autodiff
    residual storage, which removes most of the HBM epilogue traffic
    of the fit step. The fields h ride as an extra row of the
    augmented coupling matrix, so the whole NLL gradient is two GEMMs
    per block.
    """
    dtype = jnp.dtype(cfg.dtype)
    acc = jnp.promote_types(dtype, jnp.float32)
    lq = L * q
    lq_aug = _augmented_width(lq)
    nll_vg = make_plm_nll_vg(L, q, cfg, mesh=mesh)

    def vg(params, codes, weights, oh_aug=None):
        J_aug = _build_j_aug(
            params, L, q, dtype, lq_aug, symmetric=symmetric_params
        )
        J_eff = J_aug[:lq]
        h_c = J_aug[lq]

        nll, dJh = nll_vg(J_aug, codes, weights, oh_aug)
        dJ_eff = dJh[:, :lq]
        dh = dJh[:, lq]

        # l2 value on the (already materialized) compute-dtype J_eff —
        # same rounding as the autodiff path, which also regularizes
        # the cast parameters; gradients in f32 closed form
        reg_value = (
            cfg.lambda_h * jnp.sum(h_c.astype(acc) ** 2)
            + cfg.lambda_J * 0.5
            * jnp.sum(J_eff.astype(acc) ** 2)
        )

        # the final 0.5*(S + S^T)*mask symmetrizes + masks, so the
        # l2 term can ride on raw P: 0.5*(lambda_J P + (lambda_J P)^T)
        # * mask == lambda_J * J_eff
        P_f = params["J"].astype(acc)
        S = dJ_eff + cfg.lambda_J * P_f
        mask_f = _diag_block_mask(L, q, acc)
        if cfg.lambda_group > 0:
            # VALUE from the materialized compute-dtype couplings —
            # the same rounding as make_plm_loss / the autodiff path
            # (the l2 term above already follows this convention;
            # bitwise no-op in f32, where J_eff == 0.5*(P+P^T)*mask)
            blocks_v = J_eff.astype(acc).reshape(L, q, L, q)
            reg_value = reg_value + cfg.lambda_group * 0.5 * jnp.sum(
                jnp.sqrt(
                    jnp.sum(blocks_v ** 2, axis=(1, 3)) + cfg.group_eps
                )
            )
            # GRADIENT in f32 closed form from the master parameters
            blocks = (0.5 * (P_f + P_f.T) * mask_f).reshape(L, q, L, q)
            norms = jnp.sqrt(
                jnp.sum(blocks ** 2, axis=(1, 3)) + cfg.group_eps
            )
            # d/dJ_eff of 0.5*lambda_g*sum(norms); symmetric + masked,
            # so it passes through the gauge chain rule unchanged
            S = S + (
                cfg.lambda_group * 0.5
                * blocks / norms[:, None, :, None]
            ).reshape(lq, lq)
        dP = 0.5 * (S + S.T) * mask_f

        value = nll + reg_value.astype(acc)
        grads = {
            "J": dP.astype(params["J"].dtype),
            "h": (
                dh.reshape(L, q)
                + 2.0 * cfg.lambda_h * params["h"].astype(acc)
            ).astype(params["h"].dtype),
        }
        return value, grads

    return vg


def make_plm_loss(L, q, cfg: PlmConfig, mesh=None,
                  symmetric_params=False):
    """Build loss(params, codes, weights) -> scalar.

    params: {"J": (Lq, Lq), "h": (L, q)}. If a mesh (with axis "data") is
    given, codes/weights are expected sharded on that axis and the local
    NLL contributions are psum-merged inside shard_map.
    """
    dtype = jnp.dtype(cfg.dtype)
    prec = _precision(cfg.precision)
    axis_name = None if mesh is None else "data"
    local_nll = _make_local_nll(
        L, q, cfg.block_size, prec, dtype, axis_name=axis_name
    )

    def nll(J_eff, h_flat, codes, weights):
        if mesh is None:
            return local_nll(J_eff, h_flat, codes, weights)

        from jax.sharding import PartitionSpec as P

        def shard_fn(J_eff, h_flat, codes, weights):
            return jax.lax.psum(
                local_nll(J_eff, h_flat, codes, weights), "data"
            )

        return _shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data")),
            out_specs=P(),
        )(J_eff, h_flat, codes, weights)

    def loss(params, codes, weights):
        # pin the compute dtype: under jax_enable_x64 the optimizer's
        # line search scalars are float64 and would otherwise promote
        # the whole graph (the cast is transparent to autodiff)
        params = jax.tree.map(lambda x: x.astype(dtype), params)

        # symmetric shared-pair parametrization with zero diagonal blocks
        P_mat = params["J"]
        if symmetric_params:
            # P exactly symmetric by construction inside fits
            J_eff = P_mat * _diag_block_mask(L, q, dtype)
        else:
            J_eff = 0.5 * (P_mat + P_mat.T) * _diag_block_mask(L, q, dtype)
        h_flat = params["h"].reshape(L * q)

        value = nll(J_eff, h_flat, codes, weights)

        # l2 regularization; full-tensor sum counts each i<j pair
        # twice. Accumulated in the f32-or-wider dtype like the
        # closed-form vg path (a bf16 sum over (Lq)^2 squares would
        # dominate the loss error) — no-op for f32/f64 compute.
        acc = jnp.promote_types(dtype, jnp.float32)
        reg = (
            cfg.lambda_h * jnp.sum(params["h"].astype(acc) ** 2)
            + cfg.lambda_J * 0.5 * jnp.sum(J_eff.astype(acc) ** 2)
        )

        if cfg.lambda_group > 0:
            # smoothed group-L1 over pair blocks (see
            # PlmConfig.group_mode for the bound vs the exact penalty)
            blocks = J_eff.astype(acc).reshape(L, q, L, q)
            norms = jnp.sqrt(
                jnp.sum(blocks ** 2, axis=(1, 3)) + cfg.group_eps
            )
            reg = reg + cfg.lambda_group * 0.5 * jnp.sum(norms)

        return value + reg

    return loss


def _make_fused_step_chunk(L, q, cfg, mesh, steps_per_call,
                           interpret):
    """Adam step chunk using the fused Pallas epilogue
    (ops/plm_update.py): the GEMM phases produce (nll, dJh), then one
    kernel pass does symmetrize + l2 + Adam + next-step bf16 J emit,
    carrying the augmented coupling matrix across scan iterations so
    it is never rebuilt from the f32 masters. Matches the unfused
    optax path up to float rounding. The optimizer state keeps the
    optax.adam structure (ScaleByAdamState first) so checkpointing
    and resume are layout-compatible with the unfused path."""
    from evcouplings_tpu.ops.plm_update import (
        ADAM_B1, ADAM_B2, ADAM_EPS, fused_adam_update,
    )

    dtype = jnp.dtype(cfg.dtype)
    f32 = jnp.float32
    lq = L * q
    lq_aug = _augmented_width(lq)
    nll_vg = make_plm_nll_vg(L, q, cfg, mesh=mesh)

    @jax.jit
    def step_chunk(params, state, codes, weights, oh_aug):
        j_aug0 = _build_j_aug(
            params, L, q, dtype, lq_aug, symmetric=True
        )

        def body(carry, _):
            params, state, J_aug = carry
            nll, dJh = nll_vg(J_aug, codes, weights, oh_aug)
            # loss at the pre-step parameters, same rounding as the
            # unfused path (regularizers on the compute-dtype matrix)
            value = (
                nll
                + cfg.lambda_h * jnp.sum(J_aug[lq].astype(f32) ** 2)
                + cfg.lambda_J * 0.5
                * jnp.sum(J_aug[:lq].astype(f32) ** 2)
            )

            adam = state[0]
            cnt = adam.count + 1
            cf = cnt.astype(f32)
            bc1i = 1.0 / (1.0 - ADAM_B1 ** cf)
            bc2i = 1.0 / (1.0 - ADAM_B2 ** cf)
            P2, mu2, nu2, J_eff2, gsq = fused_adam_update(
                dJh, params["J"], adam.mu["J"], adam.nu["J"],
                bc1i, bc2i, q=q, lambda_j=cfg.lambda_J,
                lr=cfg.adam_lr, out_dtype=dtype,
                interpret=interpret,
            )

            # fields: a plain (L, q)-sized Adam update, negligible
            g_h = (
                dJh[:, lq].reshape(L, q)
                + 2.0 * cfg.lambda_h * params["h"]
            )
            mu_h = ADAM_B1 * adam.mu["h"] + (1.0 - ADAM_B1) * g_h
            nu_h = ADAM_B2 * adam.nu["h"] + (1.0 - ADAM_B2) * g_h ** 2
            h2 = params["h"] - cfg.adam_lr * (mu_h * bc1i) / (
                jnp.sqrt(nu_h * bc2i) + ADAM_EPS
            )

            params2 = {"J": P2, "h": h2}
            state2 = (
                adam._replace(
                    count=cnt,
                    mu={"J": mu2, "h": mu_h},
                    nu={"J": nu2, "h": nu_h},
                ),
            ) + tuple(state[1:])
            gnorm = jnp.sqrt(gsq[0, 0] + jnp.sum(g_h ** 2))
            xnorm = _tree_norm(params2)

            # re-assemble the augmented matrix carried across scan
            # iterations (same row layout as _build_j_aug, via the
            # shared assembler)
            J_aug2 = _assemble_aug_rows(
                J_eff2, h2.astype(dtype), lq, lq_aug, dtype
            )
            return (params2, state2, J_aug2), jnp.stack(
                [value.astype(f32), gnorm.astype(f32),
                 xnorm.astype(f32),
                 jnp.linalg.norm(h2).astype(f32),
                 jnp.linalg.norm(P2).astype(f32)]
            )

        (params, state, _), metrics = jax.lax.scan(
            body, (params, state, j_aug0), None, length=steps_per_call
        )
        return params, state, metrics

    return step_chunk


def _make_fista_step_chunk(L, q, cfg, mesh, steps_per_call,
                           max_backtracks=30):
    """Fully-jitted FISTA chunk for the EXACT group-L1 objective
    (PlmConfig.group_mode "prox"):

        F(theta) = NLL + l2  +  lambda_group * sum_{i<j} ||J_ij||_F

    with theta = (upper-triangle pair blocks, fields). The smooth part
    reuses the closed-form GEMM gradient (lambda_group stripped); the
    prox is group soft-thresholding of the q x q blocks, which reaches
    exact zeros — the regime plmc's nonsmooth handling represents and
    the smoothed path cannot. Backtracking on the smooth-part upper
    bound runs in a bounded lax.while_loop; steps_per_call iterations
    chain in one lax.scan, so the host pays one dispatch per chunk
    like the LBFGS path.

    Metric bookkeeping: the flat (Lq, Lq) matrix stores each shared
    pair parameter twice, so in the shared metric the smooth gradient
    is 2 * dP, inner products contract dP against full-matrix deltas,
    and squared norms halve the J part.

    Matches the generic step_chunk contract:
    (params, state, codes, weights, oh_aug) ->
    (params, state, metrics) with metric rows
    [full objective, prox-gradient-mapping norm, ||theta||] — the
    mapping norm plays the role of ||g|| in the libLBFGS-style
    convergence test of the outer loop (it vanishes exactly at a
    stationary point of the nonsmooth objective).
    """
    from dataclasses import replace as _dc_replace

    lam = cfg.lambda_group
    smooth_cfg = _dc_replace(cfg, lambda_group=0.0)
    vg = make_plm_value_and_grad(
        L, q, smooth_cfg, mesh=mesh, symmetric_params=True
    )
    loss = make_plm_loss(
        L, q, smooth_cfg, mesh=mesh, symmetric_params=True
    )
    lq = L * q
    # master/accumulator dtype (f32, or f64 for float64 parity runs)
    acc = jnp.promote_types(jnp.dtype(cfg.dtype), jnp.float32)

    def _block_norms(P):
        blocks = P.reshape(L, q, L, q)
        return jnp.sqrt(jnp.sum(blocks ** 2, axis=(1, 3)))

    def prox_from(y, gJ, gh, s):
        # gradient step in the shared metric (J gradient = 2 dP),
        # then block soft-threshold at s * lambda_group
        P = y["J"] - (2.0 * s) * gJ
        h = y["h"] - s * gh
        if lam == 0:
            # plain (accelerated) gradient descent: the prox of a
            # zero penalty is the identity
            return {"J": P, "h": h}
        norms = _block_norms(P)
        # divisor floor must be representable in the COMPUTE dtype: a
        # 1e-300 literal flushes to 0.0 in float32 and turns every
        # zero-norm block into 0/0 = NaN
        tiny = jnp.finfo(P.dtype).tiny
        scale = jnp.maximum(
            0.0, 1.0 - (s * lam) / jnp.maximum(norms, tiny)
        )
        blocks = P.reshape(L, q, L, q) * scale[:, None, :, None]
        return {"J": blocks.reshape(lq, lq), "h": h}

    def theta_terms(x_new, y, gJ, gh):
        """(<grad, dtheta>, ||dtheta||^2) in the shared metric."""
        dP = x_new["J"] - y["J"]
        dh = x_new["h"] - y["h"]
        inner = jnp.vdot(gJ, dP) + jnp.vdot(gh, dh)
        sqn = 0.5 * jnp.vdot(dP, dP) + jnp.vdot(dh, dh)
        return inner, sqn

    def penalty(P):
        # full-matrix norms count each pair twice, hence the 0.5
        return lam * 0.5 * jnp.sum(_block_norms(P))

    def theta_norm(x):
        return jnp.sqrt(
            0.5 * jnp.vdot(x["J"], x["J"]) + jnp.vdot(x["h"], x["h"])
        )

    @jax.jit
    def step_chunk(params, state, codes, weights, oh_aug):
        def one_step(carry, _):
            x, y, x_prev, tk, s, f_prev = carry
            f_y, grads = vg(y, codes, weights, oh_aug)
            f_y = f_y.astype(acc)
            gJ, gh = grads["J"], grads["h"]

            # acceptance slack scaled to the accumulation dtype's
            # resolution: at f64 the historical 1e-12 dominates; at
            # f32, f_t and f_y come from two differently-ordered
            # reductions whose cross-implementation noise is
            # O(eps * |f|), so a fixed 1e-12 would make the
            # backtracker reject at the float floor and burn all
            # max_backtracks evals per iteration there
            bt_slack = max(1e-12, 64.0 * float(jnp.finfo(acc).eps))

            def try_step(s):
                x_t = prox_from(y, gJ, gh, s)
                f_t = loss(x_t, codes, weights).astype(acc)
                inner, sqn = theta_terms(x_t, y, gJ, gh)
                ok = f_t <= (f_y + inner + sqn / (2.0 * s)
                             + bt_slack * jnp.maximum(1.0, jnp.abs(f_y)))
                return x_t, f_t, sqn.astype(acc), ok

            # backtracking: shrink s until the prox point satisfies
            # the quadratic upper bound of the smooth part
            def bt_cond(c):
                _, _, accepted, k = c
                return jnp.logical_and(~accepted, k < max_backtracks)

            def bt_body(c):
                s, _, _, k = c
                s_try = s * 0.5
                x_t, f_t, sqn, ok = try_step(s_try)
                return s_try, (x_t, f_t, sqn), ok, k + 1

            x0, f0, sqn0, ok0 = try_step(s)
            s_acc, (x_new, f_new, sqn), _, _ = jax.lax.while_loop(
                bt_cond, bt_body,
                (s, (x0, f0, sqn0), ok0, jnp.ones((), jnp.int32)),
            )

            full = f_new + penalty(x_new["J"])
            gmap = jnp.sqrt(jnp.maximum(sqn, 0.0)) / s_acc
            xnorm = theta_norm(x_new)

            # momentum with function-value adaptive restart
            restart = full > f_prev
            tk_next = jnp.where(
                restart, jnp.ones((), acc),
                0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * tk * tk)),
            )
            beta = jnp.where(
                restart, jnp.zeros((), acc), (tk - 1.0) / tk_next
            )
            y_new = jax.tree.map(
                lambda a, b: a + beta.astype(a.dtype) * (a - b),
                x_new, x_prev,
            )
            # optimistic growth; backtracking re-clamps next step
            carry = (x_new, y_new, x_new, tk_next,
                     (s_acc * 1.3).astype(acc), full)
            rec = jnp.stack([
                full.astype(jnp.float32),
                gmap.astype(jnp.float32),
                xnorm.astype(jnp.float32),
                jnp.linalg.norm(x_new["h"]).astype(jnp.float32),
                jnp.linalg.norm(x_new["J"]).astype(jnp.float32),
            ])
            return carry, rec

        carry = (
            params, state["y"], state["x_prev"],
            state["tk"].astype(acc), state["step"].astype(acc),
            state["f_prev"].astype(acc),
        )
        (x, y, x_prev, tk, s, f_prev), metrics = jax.lax.scan(
            one_step, carry, None, length=steps_per_call
        )
        return x, {
            "y": y, "x_prev": x_prev,
            "tk": tk, "step": s, "f_prev": f_prev,
        }, metrics

    return step_chunk


@dataclass
class PlmFitResult:
    J_ij: np.ndarray            # (L, L, q, q) float64, zero diagonal
    h_i: np.ndarray             # (L, q) float64
    iteration_table: list       # list of per-iteration dict records
    num_iter: int
    converged: bool
    final_loss: float
    # linesearch stopped at floating-point resolution before the
    # gradient criterion was met (libLBFGS rounding-error semantics);
    # mutually exclusive with converged
    ls_failed: bool = False


def fit_plm(codes, weights, num_symbols, cfg: PlmConfig = PlmConfig(),
            mesh=None, callback=None, checkpoint_file=None,
            checkpoint_every=50):
    """Fit a Potts model by pseudolikelihood maximization.

    Parameters
    ----------
    codes : (N, L) int array, entries in [0, q) or -1 (excluded position)
    weights : (N,) float array of sequence weights
    num_symbols : alphabet size q
    cfg : PlmConfig
    mesh : optional jax.sharding.Mesh with a "data" axis for row-parallel
        multi-device fitting
    callback : optional fn(iteration_record_dict) for progress streaming
    checkpoint_file : optional path; every `checkpoint_every`
        iterations the parameters, Adam optimizer moments, and
        iteration count are written there (atomic rename), and an
        existing file resumes the fit from its recorded iteration.
        plmc has no mid-fit checkpointing at all — long fits restart
        from scratch on preemption; this covers that gap (the
        reference's resume machinery is stage-level only,
        utils/pipeline.py:202-224). Full solver state is serialized
        for both solvers — Adam moments, or the LBFGS flat master
        vector + (s, y) history + carried evaluation — so resume is
        bitwise-identical to an uninterrupted fit. Parameter-only
        (legacy/external) checkpoints still resume; an LBFGS fit then
        restarts its history from the saved parameters.
    checkpoint_every : checkpoint interval in iterations

    Returns
    -------
    PlmFitResult
    """
    codes = np.asarray(codes)
    weights = np.asarray(weights, dtype=np.float64)
    N, L = codes.shape
    q = int(num_symbols)

    if cfg.group_mode not in ("prox", "smoothed"):
        raise ValueError(
            "Unknown group_mode: {}".format(cfg.group_mode)
        )
    if (cfg.lambda_group > 0 and cfg.solver == "fista"
            and cfg.group_mode == "smoothed"):
        raise ValueError(
            "solver='fista' implements the EXACT nonsmooth group-L1 "
            "penalty (proximal soft-thresholding) and cannot apply "
            "the smoothed approximation; use solver='lbfgs' or "
            "'adam' with group_mode='smoothed', or drop group_mode."
        )
    if (cfg.lambda_group > 0 and cfg.solver != "fista"
            and cfg.group_mode != "smoothed"):
        raise ValueError(
            "lambda_group > 0 with solver '{}' would silently apply "
            "the SMOOTHED group-L1 approximation, not the exact "
            "nonsmooth penalty. Use solver='fista' (exact proximal "
            "handling; pair blocks can reach exactly zero), or opt in "
            "to the smooth approximation explicitly with "
            "group_mode='smoothed' (objective error bounded by "
            "0.5 * lambda_group * sqrt(group_eps) per pair).".format(
                cfg.solver)
        )
    # master parameters, optimizer moments, and input weights stay
    # float32 even in bfloat16 production mode — the kernels cast to
    # the compute dtype internally (bf16 masters lose Adam's small
    # late-stage updates to rounding)
    dtype = jnp.promote_types(jnp.dtype(cfg.dtype), jnp.float32)

    # pad rows so the block scan (and even device sharding) has static
    # shape; rows shard over the "data" axis only (other mesh axes
    # replicate them), so both the padding multiple and the
    # local-row-count estimate below use the data-axis size
    n_devices = (
        1 if mesh is None
        else int(dict(mesh.shape).get("data", mesh.devices.size))
    )
    row_multiple = cfg.block_size * n_devices
    codes_p, _ = pad_rows(codes.astype(np.int8), row_multiple)
    w_p, _ = pad_rows(weights, row_multiple)
    # padding rows: weight 0 AND codes -1 (zero one-hot) => no contribution
    codes_p[N:] = -1

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_sharding = NamedSharding(mesh, P("data"))
        replicated = NamedSharding(mesh, P())
        codes_d = jax.device_put(jnp.asarray(codes_p), data_sharding)
        w_d = jax.device_put(
            jnp.asarray(w_p, dtype=dtype), data_sharding
        )
    else:
        replicated = None
        codes_d = jnp.asarray(codes_p)
        w_d = jnp.asarray(w_p, dtype=dtype)

    # two-phase gradient layout: build the static augmented one-hot
    # ONCE per fit (rebuilding per step costs the whole win)
    compute_dtype = jnp.dtype(cfg.dtype)
    layout = _resolve_grad_layout(
        cfg, compute_dtype, codes_p.shape[0] // n_devices,
        _augmented_width(L * q),
    )
    if layout == "two_phase":
        build = jax.jit(
            lambda c: build_augmented_onehot(c, q, compute_dtype),
            **({} if mesh is None else {
                "out_shardings": data_sharding,
            }),
        )
        oh_d = build(codes_d)
    else:
        oh_d = None

    # closed-form fused value+grad (no autodiff residual traffic);
    # the single objective evaluator for both solvers: the Adam path
    # calls it directly, the LBFGS linesearch evaluates it once per
    # trial step and reuses the accepted evaluation as the next
    # iteration's gradient
    vg_fn = make_plm_value_and_grad(
        L, q, cfg, mesh=mesh, symmetric_params=True
    )

    params = {
        "J": jnp.zeros((L * q, L * q), dtype=dtype),
        "h": jnp.zeros((L, q), dtype=dtype),
    }
    if mesh is not None:
        params = jax.device_put(params, replicated)

    if cfg.solver in ("lbfgs", "fista"):
        # lbfgs: state is (flat master vector, lbfgs history), built
        # right before the fit loop (its init needs one gradient eval
        # on the device-resident data arrays). fista: state built
        # below from the (possibly checkpoint-restored) parameters.
        opt = None
        state = None
    elif cfg.solver == "adam":
        opt = optax.adam(cfg.adam_lr)
        state = opt.init(params)
    else:
        raise ValueError("Unknown solver: {}".format(cfg.solver))

    # resume from a fit checkpoint if one exists
    start_iter = 0
    fingerprint = (
        fit_fingerprint(codes, weights, q, cfg)
        if checkpoint_file is not None else None
    )
    lbfgs_resume = None     # raw checkpoint arrays, consumed below
    fista_resume = None
    have_ckpt = (checkpoint_file is not None
                 and os.path.exists(checkpoint_file))
    if checkpoint_file is not None and jax.process_count() > 1:
        # only process 0 writes checkpoints, but every process makes
        # its own resume decision from the filesystem; if they
        # disagree (checkpoint on host-local disk), the processes
        # run different iteration counts and the next data-axis psum
        # deadlocks — fail loudly instead
        from jax.experimental import multihost_utils
        views = np.asarray(multihost_utils.process_allgather(
            np.asarray([1.0 if have_ckpt else 0.0])
        ))
        if float(views.min()) != float(views.max()):
            raise ValueError(
                "checkpoint_file {!r} is visible on some processes "
                "but not others: mid-fit checkpointing in "
                "multi-process runs requires a filesystem shared by "
                "all processes".format(checkpoint_file)
            )
    if have_ckpt:
        ckpt = np.load(checkpoint_file)
        if (ckpt["J"].shape != (L * q, L * q)
                or ckpt["h"].shape != (L, q)):
            raise ValueError(
                "Checkpoint {} does not match problem shape "
                "(L={}, q={})".format(checkpoint_file, L, q)
            )
        _check_ckpt_fingerprint(ckpt, fingerprint, checkpoint_file)
        # re-establish the exact-symmetry invariant the fit relies on
        # (J_eff is built as P * mask): bitwise no-op for checkpoints
        # this fitter wrote (their P is exactly symmetric), and makes
        # externally-produced or asymmetric-fit checkpoints consistent
        ckpt_J = np.asarray(ckpt["J"], dtype=np.float64)
        ckpt_J = 0.5 * (ckpt_J + ckpt_J.T)
        params = {
            "J": jnp.asarray(ckpt_J, dtype=dtype),
            "h": jnp.asarray(ckpt["h"], dtype=dtype),
        }
        if cfg.solver == "adam" and "adam_mu_J" in ckpt:
            # J-moments symmetrized for the same invariant (bitwise
            # no-op for checkpoints this fitter wrote)
            def _sym(a):
                a = np.asarray(a, dtype=np.float64)
                return jnp.asarray(0.5 * (a + a.T), dtype=dtype)

            state = (
                optax.ScaleByAdamState(
                    count=jnp.asarray(ckpt["adam_count"]),
                    mu={
                        "J": _sym(ckpt["adam_mu_J"]),
                        "h": jnp.asarray(ckpt["adam_mu_h"], dtype=dtype),
                    },
                    nu={
                        "J": _sym(ckpt["adam_nu_J"]),
                        "h": jnp.asarray(ckpt["adam_nu_h"], dtype=dtype),
                    },
                ),
            ) + state[1:]
        if cfg.solver == "lbfgs" and "lbfgs_x" in ckpt:
            # full solver state (flat master vector + rolling history
            # + carried evaluation): resume is bitwise-identical to an
            # uninterrupted fit. Checkpoints written before this state
            # existed (or with a different memory_size) fall back to a
            # history restart from the saved parameters.
            saved = {
                k[len("lbfgs_"):]: ckpt[k] for k in ckpt.files
                if k.startswith("lbfgs_")
            }
            # checkpoints written before the ls_failed flag existed
            # miss that key and fall back to a history restart below
            expected = {
                "x", "s_hist", "y_hist", "rho", "gamma", "count",
                "nevals", "value", "grad", "converged", "ls_failed",
            }
            if (set(saved) == expected
                    and saved["s_hist"].shape[0] == cfg.memory_size
                    and saved["x"].shape[0]
                    == (L * q) * (L * q) + L * q):
                lbfgs_resume = saved
        if cfg.solver == "fista" and "fista_yJ" in ckpt:
            fista_resume = {
                "y": {
                    "J": jnp.asarray(ckpt["fista_yJ"], dtype=dtype),
                    "h": jnp.asarray(ckpt["fista_yh"], dtype=dtype),
                },
                "x_prev": {
                    "J": jnp.asarray(ckpt["fista_xprevJ"], dtype=dtype),
                    "h": jnp.asarray(ckpt["fista_xprevh"], dtype=dtype),
                },
                "tk": jnp.asarray(float(ckpt["fista_tk"]), dtype),
                "step": jnp.asarray(float(ckpt["fista_step"]), dtype),
                "f_prev": jnp.asarray(
                    float(ckpt["fista_fprev"]), dtype
                ),
            }
        start_iter = int(ckpt["iteration"])
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            its = np.asarray(multihost_utils.process_allgather(
                np.asarray([float(start_iter)])
            ))
            if float(its.min()) != float(its.max()):
                raise ValueError(
                    "checkpoint {!r} iteration differs across "
                    "processes ({}) — stale per-host copies?".format(
                        checkpoint_file, sorted(set(its.ravel())))
                )
        if mesh is not None:
            params = jax.device_put(params, replicated)
            if state is not None:
                state = jax.device_put(state, replicated)

    def save_checkpoint(params, state, iteration):
        # single writer in multi-process runs (params/state are
        # replicated, so every process holds identical bytes); the
        # guard sits BEFORE the np.asarray gathers so non-writer
        # processes do not pay the full device-to-host transfer of
        # the parameters + solver history per checkpoint
        if jax.process_index() != 0:
            return
        arrays = {
            "J": np.asarray(params["J"]),
            "h": np.asarray(params["h"]),
            "iteration": np.asarray(iteration),
            "fingerprint": np.asarray(fingerprint),
        }
        if cfg.solver == "adam":
            adam = state[0]
            arrays.update(
                adam_count=np.asarray(adam.count),
                adam_mu_J=np.asarray(adam.mu["J"]),
                adam_mu_h=np.asarray(adam.mu["h"]),
                adam_nu_J=np.asarray(adam.nu["J"]),
                adam_nu_h=np.asarray(adam.nu["h"]),
            )
        elif cfg.solver == "lbfgs" and state is not None:
            # flat master vector + history (~(2m+2) * D floats; the
            # dominant cost of preemption-safe long fits, and still
            # smaller than plmc restarting from iteration 0)
            x, ls = state
            arrays.update(
                lbfgs_x=np.asarray(x),
                **{"lbfgs_" + k: np.asarray(v) for k, v in ls.items()},
            )
        elif cfg.solver == "fista" and state is not None:
            arrays.update(
                fista_yJ=np.asarray(state["y"]["J"]),
                fista_yh=np.asarray(state["y"]["h"]),
                fista_xprevJ=np.asarray(state["x_prev"]["J"]),
                fista_xprevh=np.asarray(state["x_prev"]["h"]),
                fista_tk=np.asarray(state["tk"]),
                fista_step=np.asarray(state["step"]),
                fista_fprev=np.asarray(state["f_prev"]),
            )
        tmp = checkpoint_file + ".tmp.npz"
        np.savez(tmp, **arrays)
        os.replace(tmp, checkpoint_file)

    # chain steps_per_call optimizer steps on-device: one host round
    # trip (and one metrics transfer) per chunk instead of per step.
    # codes/weights enter as jit ARGUMENTS (not closure captures) so
    # multi-process global arrays are legal (non-addressable arrays
    # cannot be closed over).
    steps_per_call = max(1, int(cfg.steps_per_call))

    fused, fused_interpret = _resolve_fused_update(cfg, mesh, dtype)
    if fused:
        step_chunk = _make_fused_step_chunk(
            L, q, cfg, mesh, steps_per_call, fused_interpret
        )

    @jax.jit
    def step_chunk_unfused(params, state, codes, weights, oh_aug):
        def one_step(params, state):
            value, grad = vg_fn(params, codes, weights, oh_aug)
            updates, state = opt.update(grad, state, params)
            params = optax.apply_updates(params, updates)
            gnorm = _tree_norm(grad)
            xnorm = _tree_norm(params)
            return params, state, value, gnorm, xnorm

        def body(carry, _):
            params, state = carry
            params, state, value, gnorm, xnorm = one_step(params, state)
            return (params, state), jnp.stack(
                [value.astype(jnp.float32),
                 gnorm.astype(jnp.float32),
                 xnorm.astype(jnp.float32),
                 jnp.linalg.norm(params["h"]).astype(jnp.float32),
                 jnp.linalg.norm(params["J"]).astype(jnp.float32)]
            )
        (params, state), metrics = jax.lax.scan(
            body, (params, state), None, length=steps_per_call
        )
        return params, state, metrics

    if cfg.solver == "lbfgs":
        # native scan-chained LBFGS (ops/lbfgs.py) on ONE flat master
        # vector [J.ravel(); h.ravel()] — replaces optax.lbfgs + zoom
        # linesearch, whose pytree traversals and linesearch state
        # machine measured ~30 ms/iteration of overhead on TPU v5e on
        # top of the 1-2 actual gradient evaluations per iteration.
        x_dtype = jnp.promote_types(dtype, jnp.float32)
        dsize = (L * q) * (L * q)

        def _flatten_tree(tree):
            return jnp.concatenate([
                tree["J"].reshape(-1), tree["h"].reshape(-1)
            ]).astype(x_dtype)

        def _unflatten_x(x):
            return {
                "J": x[:dsize].reshape(L * q, L * q).astype(dtype),
                "h": x[dsize:].reshape(L, q).astype(dtype),
            }

        def vg_flat(x, codes, weights, oh_aug):
            value, grads = vg_fn(
                _unflatten_x(x), codes, weights, oh_aug
            )
            return value.astype(x_dtype), _flatten_tree(grads)

        lb_chunk = make_lbfgs_chunk(
            vg_flat, m=cfg.memory_size,
            steps_per_call=steps_per_call, conv_tol=cfg.conv_tol,
            norm_split=dsize,
        )

        @jax.jit
        def lbfgs_init_fn(params, codes, weights, oh_aug):
            x = _flatten_tree(params)
            value, grad = vg_flat(x, codes, weights, oh_aug)
            return x, init_lbfgs_state(
                x, value, grad, m=cfg.memory_size
            )

        @jax.jit
        def step_chunk_lbfgs(params, state, codes, weights, oh_aug):
            del params  # master copy lives in the flat vector
            x, lstate = state
            x, lstate, metrics = lb_chunk(
                x, lstate, codes, weights, oh_aug
            )
            return _unflatten_x(x), (x, lstate), metrics

        step_chunk = step_chunk_lbfgs
        if lbfgs_resume is not None:
            x_r = jnp.asarray(lbfgs_resume.pop("x"), dtype=x_dtype)
            state = (x_r, {
                k: jnp.asarray(v) for k, v in lbfgs_resume.items()
            })
            if mesh is not None:
                state = jax.device_put(state, replicated)
        else:
            state = tuple(lbfgs_init_fn(params, codes_d, w_d, oh_d))
    elif cfg.solver == "fista":
        step_chunk = _make_fista_step_chunk(
            L, q, cfg, mesh, steps_per_call
        )
        if fista_resume is not None:
            state = fista_resume
            if mesh is not None:
                state = dict(
                    state,
                    y=jax.device_put(state["y"], replicated),
                    x_prev=jax.device_put(state["x_prev"], replicated),
                )
        else:
            state = {
                "y": params, "x_prev": params,
                "tk": jnp.asarray(1.0, dtype),
                "step": jnp.asarray(1.0, dtype),
                "f_prev": jnp.asarray(np.inf, dtype),
            }
    elif not fused:
        step_chunk = step_chunk_unfused

    import time

    from evcouplings_tpu.utils.tracing import annotate

    table = []
    converged = False
    ls_failed = False
    value = float("nan")
    t0 = time.time()
    it = start_iter
    last_ckpt = start_iter

    # a resumed LBFGS state that already converged — by the device
    # flag, or by the host-side libLBFGS criterion on the carried
    # gradient (the host may stop a fit before the device flag trips,
    # since the flag is set at the START of the following step) —
    # must not dispatch another chunk: its steps would be frozen
    # pass-throughs, and the host would append a duplicate row for
    # the unchanged iterate and drift the checkpoint's iteration
    # counter by one per resume
    if cfg.solver == "lbfgs" and lbfgs_resume is not None:
        x_r, ls_r = state
        g_r = np.asarray(ls_r["grad"], dtype=np.float64)
        x_flat = np.asarray(x_r, dtype=np.float64)
        gnorm_r = float(np.sqrt(np.dot(g_r, g_r)))
        xnorm_r = float(np.sqrt(np.dot(x_flat, x_flat)))
        if bool(ls_r["ls_failed"]):
            # frozen at float resolution: a chunk would be all
            # pass-throughs — skip the compile + dispatch entirely
            ls_failed = True
        elif (bool(ls_r["converged"])
                or gnorm_r <= cfg.conv_tol * max(1.0, xnorm_r)):
            converged = True

    last_metrics = None
    while it < cfg.max_iter and not converged and not ls_failed:
        n_steps = min(steps_per_call, cfg.max_iter - it)
        with annotate("plm_step_chunk"):
            params, state, metrics = step_chunk(
                params, state, codes_d, w_d, oh_d
            )
        metrics = np.asarray(metrics, dtype=np.float64)
        last_metrics = metrics
        now = time.time() - t0
        # LBFGS rows carry the linesearch-failure flag in column 3;
        # every solver's rows end with the per-step [||h||, ||J||]
        # pair (plmc's table reports these at each iterate)
        ls_col = 3 if cfg.solver == "lbfgs" else None

        # a chunk may overshoot max_iter or convergence by up to
        # steps_per_call - 1 steps; the table is truncated to the
        # first converged iteration (plmc semantics), the parameters
        # keep the extra descent steps
        for k in range(n_steps):
            # a linesearch failure means the step did not move, so
            # its repeated row is dropped and the table ends at the
            # last real iterate (plmc's log simply stops there)
            if ls_col is not None and metrics[k][ls_col] > 0:
                ls_failed = True
                # the frozen pass-through row still carries the real
                # objective — keep it so a fit that freezes before
                # recording any row (e.g. resuming a frozen
                # checkpoint) does not report NaN
                if np.isnan(value):
                    value = float(metrics[k][0])
                break
            it += 1
            value, gnorm, xnorm = metrics[k][:3]
            record = {
                "iter": it,
                "fx": value,
                "gnorm": gnorm,
                "xnorm": xnorm,
                "hnorm": metrics[k][-2],
                "Jnorm": metrics[k][-1],
                "time": now,
            }
            table.append(record)
            if callback is not None:
                callback(record)

            # libLBFGS-style relative gradient convergence
            if gnorm <= cfg.conv_tol * max(1.0, xnorm):
                converged = True
                break

        # stop dispatching chunks once the engine froze the iterate
        # (linesearch failed at float resolution — libLBFGS rounding-
        # error / max-linesearch semantics); NOT reported as
        # convergence, plmc distinguishes these outcomes
        if ls_failed:
            break
        if (cfg.solver == "lbfgs" and not converged
                and bool(state[1]["converged"])):
            converged = True

        if (checkpoint_file is not None
                and it - last_ckpt >= checkpoint_every):
            save_checkpoint(params, state, it)
            last_ckpt = it

    if checkpoint_file is not None and it > last_ckpt:
        save_checkpoint(params, state, it)

    if cfg.solver == "adam":
        # the Adam chunks record fx at the PRE-update iterate (the
        # gradient evaluation doubles as the metric), so the last
        # table row lags the returned parameters by one step; one
        # extra evaluation pins final_loss to the parameters actually
        # returned
        value = float(vg_fn(params, codes_d, w_d, oh_d)[0])
    elif last_metrics is not None:
        # LBFGS/FISTA record fx at the ACCEPTED iterate, but a chunk
        # may overshoot max_iter with live steps the truncated table
        # does not record (FISTA also overshoots the convergence
        # break — it has no device-side freeze): the final metrics
        # row prices the parameters actually returned. Frozen LBFGS
        # pass-through rows repeat the frozen iterate's record, so
        # this is bitwise the recorded value when nothing overshot
        value = float(last_metrics[-1][0])
    elif np.isnan(value):
        # the loop never dispatched — a resume landed at/past
        # max_iter, or the resumed state was already converged /
        # frozen — so no metrics row carried the objective
        if cfg.solver == "fista" and np.isfinite(
            float(np.asarray(state["f_prev"]))
        ):
            # the FISTA state carries the full nonsmooth objective of
            # the last accepted iterate; vg_fn would substitute the
            # smoothed group term
            value = float(np.asarray(state["f_prev"]))
        else:
            value = float(vg_fn(params, codes_d, w_d, oh_d)[0])

    # materialize the effective symmetric couplings
    from evcouplings_tpu.ops.encode import unflatten_J

    P_mat = np.asarray(params["J"], dtype=np.float64)
    J_ij = unflatten_J(0.5 * (P_mat + P_mat.T), L, q)

    return PlmFitResult(
        J_ij=J_ij,
        h_i=np.asarray(params["h"], dtype=np.float64),
        iteration_table=table,
        # TOTAL iterations the returned parameters received (resume-
        # aware: the model artifact's num_iter must count the whole
        # optimization, not just the rows recorded after a resume)
        num_iter=it,
        converged=converged,
        final_loss=value,
        ls_failed=ls_failed,
    )
