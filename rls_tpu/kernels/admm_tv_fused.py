"""Fully-fused ADMM-TV solve as ONE Pallas TPU kernel.

BASELINE config #3 (ADMM with TV regularization and a CG inner solve on a
256² convolution operator) as a single kernel per problem: the masked
inner CG (matvec = compensated Gram sandwich + ρ·v), the TV-FGP z-update,
and the dual update all run VMEM-resident for the full outer iteration
budget — the ADMM sibling of kernels/fista_tv_fused.py.

Semantics mirror admm.py step() exactly for the supported configuration
(single TV term, identity reg_trafo, vary_rho="none", no preconditioner,
Positive/Real projections in-kernel after the x-update, fixed
iterations; reference ADMM.jl:230-309):

    β   = Aᴴb + ρ(z − u)
    x   = CG(AᴴA + ρI, β, x₀=x, maxiter=cg_iters, ‖r‖ ≤ tol_inner·‖β‖)
    z   = prox_TV(x + u, λ_eff / 2ρ)
    u   = u + x − z

The CG uses the same MASKED fixed-iteration form as pcg(unroll=True):
steps freeze (α = 0, p frozen) once ‖r‖ drops below the target, so the
kernel matches the composed `unroll_cg=True` solver bit-for-bit in
structure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._fgp_common import (
    make_gram_normal_noconcat,
    make_sepconv_normal_stencil,
    make_tv_fgp,
)

__all__ = ["admm_tv_fused", "solve_admm_tv_fused"]


def _kernel(
    scal_ref,  # SMEM (B, 2): per-problem [rho, lam_eff]
    lcat_ref,  # VMEM (H, 3H): stacked Gram left factor
    rcat_ref,  # VMEM (3W, W): stacked Gram right factor
    x0_ref,  # VMEM (1, H, W): Aᴴb
    out_ref,  # VMEM (1, H, W)
    *,
    iterations: int,
    cg_iterations: int,
    tv_iterations: int,
    tol_inner: float,
    taps: tuple | None = None,
    prox: str = "none",
    fgp_unroll: bool = False,
):
    x0hat = x0_ref[0]
    b = pl.program_id(0)
    rho = scal_ref[b, 0]
    lam = scal_ref[b, 1]
    H, W = x0hat.shape
    f32 = x0hat.dtype

    if taps is not None:
        # exact VPU stencil Gram — used for widths that are not
        # 128-aligned (Mosaic rejects the compensated gram's in-kernel
        # lane-dim concats/slices there) and valid at any size
        normal = make_sepconv_normal_stencil(taps[0], taps[1], H, W, f32)
    else:
        lcat = lcat_ref[...]
        rcat = rcat_ref[...]
        # concat-free compensation (identical math, skips the
        # (3H, W)/(H, 3W) temporaries — see fista_tv_fused); factors
        # derived once per grid step. FULL 4-term rule: ADMM's scaled
        # dual u integrates every CG x-error across outer iterations
        # (u ← u + x − z, reference ADMM.jl:255-258), so the 3-term
        # form's dropped lo·lo product (~2⁻¹⁶/multiply) accumulates
        # linearly over iterations·cg_iterations matvecs — the same
        # mechanism that kept splitbregman_sense128 above 1e-4 in r3
        # (fixed by full4 in r4) held admm_tv_deblur256 at 9.33e-5.
        l2 = jnp.concatenate([lcat[:, :H], lcat[:, 2 * H :]], axis=0)
        r2 = jnp.concatenate([rcat[:W], rcat[2 * W :]], axis=1)
        normal = make_gram_normal_noconcat(
            l2, lcat[:, :H], r2, rcat[:W], f32, full4=True
        )

    def matvec(v):  # composite AᴴA + ρI
        return normal(v) + rho * v

    def frob(u):
        return jnp.sqrt(jnp.sum(u * u))

    def cg(beta, x_init):
        # masked fixed-iteration CG == pcg(unroll=True) (base.py)
        target = tol_inner * frob(beta)
        r0 = beta - matvec(x_init)

        def body(_, carry):
            xc, r, p, rz = carry
            q = matvec(p)
            pq = jnp.sum(p * q)
            active = frob(r) > target
            denom = jnp.where(pq == 0, 1.0, pq)
            alpha = jnp.where(active, rz / denom, 0.0)
            xc = xc + alpha * p
            r = r - alpha * q
            rz_new = jnp.sum(r * r)
            beta_c = jnp.where(rz == 0, 0.0, rz_new / jnp.where(rz == 0, 1.0, rz))
            p = jnp.where(active, r + beta_c * p, p)
            return (xc, r, p, rz_new)

        xc, _, _, _ = lax.fori_loop(
            0, cg_iterations, body, (x_init, r0, r0, jnp.sum(r0 * r0))
        )
        return xc

    # fgp_unroll: statically-unrolled λ-scaled dual loop with the r5
    # "fold" issue-count reduction — valid here because the fused path
    # requires vary_rho="none", so the prox scale λ/(2ρ) is constant
    # across outer iterations. Same strict-f32 math as the unrolled PGM
    # paths (chip A/B rel 0.0); interpret mode keeps fori (the unrolled
    # body runs each op Python-eagerly there).
    _, fgp_n = make_tv_fgp(H, W, f32, unroll=fgp_unroll,
                           opt="fold" if fgp_unroll else None)

    def fgp(xg, lam_tv):
        return fgp_n(xg, lam_tv, tv_iterations)

    # --- ADMM outer loop ---------------------------------------------------
    rho_safe = jnp.where(rho != 0, rho, 1.0)
    lam_z = lam / (2.0 * rho_safe)

    def admm_body(_, carry):
        x, z, u = carry
        beta = x0hat + rho * (z - u)
        x = cg(beta, x)
        if prox == "positive":
            # projection terms apply right after the x-update (admm.py
            # step; reference ADMM.jl:246-249); Real is the identity here
            x = jnp.maximum(x, 0.0)
        zi = fgp(x + u, lam_z)
        z = jnp.where(rho != 0, zi, x + u)
        u = u + x - z
        return (x, z, u)

    # initial carries derived from a loaded ref (not a splatted constant)
    x_init = x0hat * 0.0
    x, _, _ = lax.fori_loop(
        0, iterations, admm_body, (x_init, x_init, x_init)
    )
    out_ref[0] = x


def admm_tv_fused(
    x0hat_b,  # (B, H, W) f32: Aᴴb per problem
    lcat,
    rcat,
    rho,  # scalar or (B,)
    lam,  # scalar or (B,): effective λ (normalization-scaled)
    iterations: int,
    cg_iterations: int,
    tv_iterations: int,
    tol_inner: float,
    interpret: bool = False,
    taps: tuple | None = None,
    prox: str = "none",
    fgp_unroll: bool = False,
):
    B, H, W = x0hat_b.shape
    scal = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(rho, jnp.float32).reshape(-1), (B,)),
            jnp.broadcast_to(jnp.asarray(lam, jnp.float32).reshape(-1), (B,)),
        ],
        axis=1,
    )
    _check_vmem_admm_tv(H, W)
    return pl.pallas_call(
        functools.partial(
            _kernel,
            iterations=iterations,
            cg_iterations=cg_iterations,
            tv_iterations=tv_iterations,
            tol_inner=tol_inner,
            taps=taps,
            prox=prox,
            fgp_unroll=fgp_unroll,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                lcat.shape, lambda b: tuple(0 for _ in lcat.shape),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                rcat.shape, lambda b: tuple(0 for _ in rcat.shape),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W), x0hat_b.dtype),
        interpret=interpret,
    )(scal, lcat, rcat, x0hat_b)


def check_admm_tv_fused(solver):
    """Validate `solver` for the fused ADMM-TV path (raises ValueError)."""
    from ..models.prox import TVRegularization
    from ..models.solvers.admm import ADMM
    from ..ops.base import IdentityOperator, NormalOperator
    from ..ops.conv_direct import SeparableConvOperator

    if not isinstance(solver, ADMM):
        raise ValueError("fused path requires an ADMM solver")
    if not isinstance(solver.AHA, NormalOperator) or solver.AHA.weights is not None:
        raise ValueError(
            "fused path requires AHA to be the NormalOperator of a "
            "SeparableConvOperator (construct the solver from A, not AHA)"
        )
    op = solver.AHA.A
    if not isinstance(op, SeparableConvOperator):
        raise ValueError("fused path requires SeparableConvOperator")
    if op.cat is None:
        raise ValueError("fused path requires compensated=True factors")
    if solver.A is None:
        raise ValueError("fused path requires solver.A (for Aᴴb)")
    if len(solver.reg) != 1 or not isinstance(solver.reg[0], TVRegularization):
        raise ValueError("fused path requires exactly one TVRegularization term")
    if not isinstance(solver.reg_trafo[0], IdentityOperator):
        raise ValueError("fused path requires an identity reg_trafo")
    reg = solver.reg[0]
    H, W = op.im_shape
    dims = (reg.dims,) if isinstance(reg.dims, int) else tuple(reg.dims)
    if reg.shape != (H, W) or tuple(sorted(dims)) != (0, 1):
        raise ValueError("fused path requires 2-D TV over both axes")
    from ..models.prox import PositiveRegularization, RealRegularization

    for p in solver.proj:
        if not isinstance(p, (PositiveRegularization, RealRegularization)):
            raise ValueError(
                "fused path supports only Positive/Real projection terms, "
                f"got {type(p).__name__}"
            )
    if solver.vary_rho != "none":
        raise ValueError("fused path does not support vary_rho")
    if solver.precon is not None:
        raise ValueError("fused path does not support a preconditioner")
    tol_inner = solver.tol_inner
    if isinstance(tol_inner, jax.core.Tracer):
        raise ValueError(
            "fused path needs a concrete tol_inner; close the solver over "
            "jax.jit instead of passing it as a jit argument"
        )
    _check_vmem_admm_tv(H, W)


def _check_vmem_admm_tv(H, W):
    vmem_bytes = (14 * H * W + 2 * 3 * H * W + 3 * H * H + 3 * W * W) * 4
    # 16 MiB: the TPU scoped-VMEM budget (verified empirically — the
    # fused FISTA-TV kernel compiles at 384^2, Mosaic OOMs at 512^2)
    if vmem_bytes > 16 * 1024 * 1024:
        raise ValueError(
            f"fused ADMM-TV working set ~{vmem_bytes/2**20:.0f} MiB exceeds "
            "VMEM; use the composed solve path"
        )


def solve_admm_tv_fused(solver, B_mat, interpret: bool | None = None,
                        fgp_unroll: bool | None = None):
    """Drop-in fast path for `solve_batched_unrolled(solver, B)` when the
    solver is ADMM + SeparableConvOperator + one identity-trafo 2-D TV term
    (BASELINE config #3's shape). Returns the n×K solution matrix.

    Assumptions are checked — callers get a ValueError naming the
    unsupported piece.
    """
    from ..models.regularization import normalization_factor

    check_admm_tv_fused(solver)
    op = solver.AHA.A
    reg = solver.reg[0]
    H, W = op.im_shape
    tol_inner = solver.tol_inner

    B_mat = jnp.asarray(B_mat)
    bt = B_mat.T
    if op.taps_len is not None and solver.A is op:
        # exact-f32 Aᴴb seed (see SeparableConvOperator.rmv_stencil):
        # the compensated-MXU rmv's ~2.5e-5 residual is a systematic
        # bias on every outer iteration's CG RHS, which ADMM integrates
        x0hat_b = jax.vmap(op.rmv_stencil)(bt).reshape(-1, H, W)
    else:
        x0hat_b = jax.vmap(solver.A.rmv)(bt).reshape(-1, H, W)
    scale = jax.vmap(
        lambda b: normalization_factor(solver.normalize_reg, solver.A, b)
    )(bt)
    lam_eff = reg.get_lam() * scale
    taps = None
    if op.taps_len is not None:
        # EXACT f32 VPU stencil Gram whenever taps exist — not just for
        # non-128-aligned widths. ADMM's scaled dual integrates every CG
        # x-error across outer iterations, and the compensated MXU
        # sandwich's ~2.5e-5 residual (vs f64) is what held
        # admm_tv_deblur256 parity at ~1e-4 for three rounds (r5
        # diagnosis: the composed CPU-f32 trajectory sits at 2.2e-6 from
        # f64 at the same config, so the kernel matvec was the gap, not
        # trajectory sensitivity). Short-tap stencils are also cheap:
        # ~4k VPU ops/pixel vs the sandwich's 2(3N) MACs/pixel.
        taps = op.taps_hw()
        lcat = rcat = jnp.zeros((1, 1), jnp.float32)
    else:
        # dense banded factors without taps: compensated MXU (full4)
        lcat, rcat = op.cat["normal"]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    from ..models.prox import PositiveRegularization

    prox = (
        "positive"
        if any(isinstance(p, PositiveRegularization) for p in solver.proj)
        else "none"
    )
    out = admm_tv_fused(
        x0hat_b,
        lcat,
        rcat,
        solver.rho0[0],
        lam_eff,
        solver.iterations,
        solver.iterations_cg,
        reg.iterations_tv,
        float(tol_inner),
        interpret=interpret,
        taps=taps,
        prox=prox,
        fgp_unroll=(not interpret) if fgp_unroll is None else fgp_unroll,
    )
    return out.reshape(out.shape[0], H * W).T
