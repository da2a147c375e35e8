"""
Fused Pallas epilogue for the PLM Adam step.

After the two GEMM phases of the PLM gradient (ops/plm.py), the
remaining per-step work is elementwise over (Lq, Lq) float32 arrays:

    S   = dJh[:, :Lq] + lambda_J * P
    g   = 0.5 * (S + S^T) * mask            # zero diagonal q x q blocks
    mu' = b1 * mu + (1 - b1) * g            # Adam moments
    nu' = b2 * nu + (1 - b2) * g^2
    P'  = P - lr * mu_hat / (sqrt(nu_hat) + eps)
    J'  = (P' * mask).astype(bf16)          # next step's coupling matrix

Measured on v5e at L=160 (ablation in benchmarks/ablate_two_phase.py):
the XLA version of this epilogue plus the optax Adam update costs
0.92 ms/step of a 6.7 ms step. This kernel does the whole chain in
ONE pass over HBM (5 f32 tile reads, 3 f32 + 1 bf16 tile writes),
reading the transposed dJh tiles through a second BlockSpec on the
same array and also accumulating sum(g^2) (the gradient norm for the
plmc-style iteration table) into SMEM for free.

MEASURED RESULT (v5e, 2026-08): the fusion does NOT pay on this chip
and PlmConfig.fused_update="auto" resolves to off. The chip streams
~330 GB/s regardless of who issues the traffic (Pallas copy kernel
271 GB/s, this kernel 365 GB/s at (256,256) — VMEM-bound to small
tiles by its 9 streams — XLA elementwise 320 GB/s), so the XLA
epilogue at ~300 MB of fused traffic is already near the roof, and
XLA additionally OVERLAPS that traffic with the MXU-bound GEMM
phases of the step, which a serialized pallas_call cannot: full step
6.75 ms fused vs 6.21 ms unfused. Kept (tested, correct) for
hardware where the HBM:MXU balance differs; the tile-parameter
sweep lives in /tmp-style microbenches recorded in the repo docs.

The symmetrized form relies on P being exactly symmetric with zero
diagonal blocks, which the fit maintains by construction: P starts at
zero and every update g is symmetric-masked (elementwise Adam preserves
both properties). Under that invariant
0.5*((dJh + lambda*P) + (dJh + lambda*P)^T) == 0.5*(dJh + dJh^T)
+ lambda*P, matching the unfused path (ops/plm.py) up to rounding.

Replaces work the reference delegates to plmc's LBFGS internals
(reference wrapper: evcouplings/couplings/tools.py:126-307).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Adam hyperparameters fixed to the optax.adam defaults the unfused
# path uses (optax.scale_by_adam: b1, b2, eps, eps_root=0)
ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8


def _update_kernel(scal_ref, djh_ref, djh_t_ref, p_ref, mu_ref, nu_ref,
                   p_out_ref, mu_out_ref, nu_out_ref, jeff_ref, gsq_ref,
                   *, lq, q, lambda_j, lr, bi, bj, out_dtype):
    """One (bi, bj) tile of the fused symmetrize + Adam + emit chain."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    a = djh_ref[...]
    at = djh_t_ref[...].T       # (bj, bi) tile of dJh at (j, i) -> ^T
    p = p_ref[...]

    rows = i * bi + jax.lax.broadcasted_iota(jnp.int32, (bi, bj), 0)
    cols = j * bj + jax.lax.broadcasted_iota(jnp.int32, (bi, bj), 1)
    # valid guards ceil-grid edge tiles (their loads are undefined, so
    # mask with where — a multiply would propagate NaNs); the site mask
    # zeroes the L diagonal q x q blocks exactly as _diag_block_mask
    live = ((rows // q) != (cols // q)) & (rows < lq) & (cols < lq)

    g = jnp.where(live, 0.5 * (a + at) + lambda_j * p, 0.0)

    mu2 = ADAM_B1 * mu_ref[...] + (1.0 - ADAM_B1) * g
    nu2 = ADAM_B2 * nu_ref[...] + (1.0 - ADAM_B2) * (g * g)
    bc1i = scal_ref[0]          # 1 / (1 - b1^t)
    bc2i = scal_ref[1]          # 1 / (1 - b2^t)
    upd = lr * (mu2 * bc1i) / (jnp.sqrt(nu2 * bc2i) + ADAM_EPS)
    p2 = p - upd

    p_out_ref[...] = p2
    mu_out_ref[...] = mu2
    nu_out_ref[...] = nu2
    jeff_ref[...] = jnp.where(live, p2, 0.0).astype(out_dtype)

    # sum(g^2) accumulated across the (sequential) grid into SMEM
    part = jnp.sum(g * g)

    @pl.when((i == 0) & (j == 0))
    def _():
        gsq_ref[0, 0] = part

    @pl.when((i != 0) | (j != 0))
    def _():
        gsq_ref[0, 0] = gsq_ref[0, 0] + part


def _update_kernel_presym(scal_ref, s_ref, p_ref, mu_ref, nu_ref,
                          p_out_ref, mu_out_ref, nu_out_ref, jeff_ref,
                          gsq_ref, *, lq, q, lambda_j, lr, bi, bj,
                          out_dtype):
    """Variant taking pre-symmetrized S = dJh + dJh^T (built by one
    XLA transpose+add pass). Drops the transposed-tile input stream —
    8 instead of 10 double-buffered VMEM streams lets tiles grow
    within the 16 MB VMEM budget, which is what the kernel's HBM
    bandwidth actually depends on."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    p = p_ref[...]
    rows = i * bi + jax.lax.broadcasted_iota(jnp.int32, (bi, bj), 0)
    cols = j * bj + jax.lax.broadcasted_iota(jnp.int32, (bi, bj), 1)
    live = ((rows // q) != (cols // q)) & (rows < lq) & (cols < lq)

    g = jnp.where(live, 0.5 * s_ref[...] + lambda_j * p, 0.0)

    mu2 = ADAM_B1 * mu_ref[...] + (1.0 - ADAM_B1) * g
    nu2 = ADAM_B2 * nu_ref[...] + (1.0 - ADAM_B2) * (g * g)
    bc1i = scal_ref[0]
    bc2i = scal_ref[1]
    upd = lr * (mu2 * bc1i) / (jnp.sqrt(nu2 * bc2i) + ADAM_EPS)
    p2 = p - upd

    p_out_ref[...] = p2
    mu_out_ref[...] = mu2
    nu_out_ref[...] = nu2
    jeff_ref[...] = jnp.where(live, p2, 0.0).astype(out_dtype)

    part = jnp.sum(g * g)

    @pl.when((i == 0) & (j == 0))
    def _():
        gsq_ref[0, 0] = part

    @pl.when((i != 0) | (j != 0))
    def _():
        gsq_ref[0, 0] = gsq_ref[0, 0] + part


def fused_adam_update_presym(S, P, mu, nu, bc1i, bc2i, *, q, lambda_j,
                             lr, out_dtype=jnp.bfloat16, bi=256,
                             bj=512, interpret=False):
    """fused_adam_update with the dJh + dJh^T symmetrization hoisted
    to the caller (S must be exactly dJh[:, :Lq] + dJh[:, :Lq].T)."""
    lq = P.shape[0]
    scal = jnp.stack(
        [jnp.asarray(bc1i, jnp.float32), jnp.asarray(bc2i, jnp.float32)]
    )
    grid = (pl.cdiv(lq, bi), pl.cdiv(lq, bj))
    kernel = functools.partial(
        _update_kernel_presym, lq=lq, q=q, lambda_j=float(lambda_j),
        lr=float(lr), bi=bi, bj=bj, out_dtype=out_dtype,
    )
    f32 = jnp.float32
    tile = lambda: pl.BlockSpec(  # noqa: E731
        (bi, bj), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  tile(), tile(), tile(), tile()],
        out_specs=[tile(), tile(), tile(), tile(),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((lq, lq), f32),
            jax.ShapeDtypeStruct((lq, lq), f32),
            jax.ShapeDtypeStruct((lq, lq), f32),
            jax.ShapeDtypeStruct((lq, lq), out_dtype),
            jax.ShapeDtypeStruct((1, 1), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=13 * lq * lq,
            bytes_accessed=4 * lq * lq * (4 + 3)
            + lq * lq * jnp.dtype(out_dtype).itemsize,
            transcendentals=lq * lq,
        ),
        interpret=interpret,
    )(scal, S, P, mu, nu)


def fused_adam_update(dJh, P, mu, nu, bc1i, bc2i, *, q, lambda_j, lr,
                      out_dtype=jnp.bfloat16, bi=256, bj=256,
                      interpret=False):
    """Fused symmetrize + l2-regularize + Adam update + bf16 J emit.

    Parameters
    ----------
    dJh : (Lq, >=Lq) float32 — raw NLL gradient GEMM output (extra
        columns, e.g. the dh column and MXU padding, are ignored)
    P, mu, nu : (Lq, Lq) float32 — master parameters and Adam moments
        (P symmetric with zero diagonal blocks — see module docstring)
    bc1i, bc2i : scalar f32 — inverse Adam bias corrections
        1/(1 - b^t) for the step being applied
    q : alphabet size (defines the diagonal-block mask)
    lambda_j : l2 coupling-regularization strength
    lr : Adam learning rate

    Returns
    -------
    (P', mu', nu', J_eff', gsq) with J_eff' = (P' * mask) in out_dtype
    and gsq = sum(g^2) as a (1, 1) float32 (gradient-norm accumulator).
    """
    lq = P.shape[0]
    scal = jnp.stack(
        [jnp.asarray(bc1i, jnp.float32), jnp.asarray(bc2i, jnp.float32)]
    )
    grid = (pl.cdiv(lq, bi), pl.cdiv(lq, bj))

    kernel = functools.partial(
        _update_kernel, lq=lq, q=q, lambda_j=float(lambda_j),
        lr=float(lr), bi=bi, bj=bj, out_dtype=out_dtype,
    )
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bi, bj), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            # transposed tiles of the SAME dJh array: block (j, i)
            pl.BlockSpec((bj, bi), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, bj), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, bj), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, bj), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bi, bj), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, bj), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, bj), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, bj), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lq, lq), f32),
            jax.ShapeDtypeStruct((lq, lq), f32),
            jax.ShapeDtypeStruct((lq, lq), f32),
            jax.ShapeDtypeStruct((lq, lq), out_dtype),
            jax.ShapeDtypeStruct((1, 1), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=14 * lq * lq,
            bytes_accessed=4 * lq * lq * (5 + 3)
            + lq * lq * jnp.dtype(out_dtype).itemsize,
            transcendentals=lq * lq,
        ),
        interpret=interpret,
    )(scal, dJh, dJh, P, mu, nu)


def adam_update_reference(dJh, P, mu, nu, bc1i, bc2i, *, q, lambda_j,
                          lr, out_dtype=jnp.bfloat16):
    """Pure-jnp oracle for fused_adam_update (tests and fallbacks)."""
    lq = P.shape[0]
    a = dJh[:, :lq]
    site = jax.lax.broadcasted_iota(jnp.int32, (lq, lq), 0) // q
    site_t = jax.lax.broadcasted_iota(jnp.int32, (lq, lq), 1) // q
    mask = (site != site_t).astype(jnp.float32)
    g = (0.5 * (a + a.T) + lambda_j * P) * mask
    mu2 = ADAM_B1 * mu + (1.0 - ADAM_B1) * g
    nu2 = ADAM_B2 * nu + (1.0 - ADAM_B2) * (g * g)
    upd = lr * (mu2 * bc1i) / (jnp.sqrt(nu2 * bc2i) + ADAM_EPS)
    p2 = P - upd
    return p2, mu2, nu2, (p2 * mask).astype(out_dtype), jnp.sum(
        g * g
    ).reshape(1, 1)
