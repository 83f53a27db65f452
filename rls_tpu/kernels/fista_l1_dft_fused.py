"""Fully-fused FISTA-L1 compressed-sensing solve as ONE Pallas TPU kernel.

BASELINE config #2 (FISTA with an L1 prox on a subsampled-Fourier operator
at 256²) on FFT-less TPU runtimes: the split-real DFT normal operator
`Re(Fᴴ M (F X Fᵀ) F̄)` (ops/dft_real.py) runs as compensated stacked MXU
matmuls inside the kernel, the soft-threshold prox is elementwise, and the
whole fixed-iteration FISTA loop stays VMEM-resident per problem — the CS
sibling of kernels/fista_tv_fused.py, sharing its host-precomputed
momentum table.

Semantics mirror FISTA.step (fista.py, track_residual=False, no restart)
with `SubsampledDFT2RealOperator.normal` and the real soft-threshold
(reference FISTA.jl:139-185, ProxL1.jl:18-22).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops._precise import split_bf16 as _split
from .fista_tv_fused import _momentum_table

__all__ = ["fista_l1_dft_fused", "solve_fista_l1_dft_fused"]


def _kernel(
    scal_ref,  # SMEM (B, 2): per-problem [rho, lam_eff]
    tab_ref,  # SMEM (iterations, 4): momentum schedule
    lfr_ref,  # VMEM (H, 3H) stacked Re(F_H)
    lfi_ref,  # VMEM (H, 3H) stacked Im(F_H)
    rfr_ref,  # VMEM (3W, W) stacked Re(F_W)
    rfi_ref,  # VMEM (3W, W) stacked Im(F_W)
    mask_ref,  # VMEM (H, W) sampling mask
    x0_ref,  # VMEM (1, H, W): Aᴴb
    out_ref,  # VMEM (1, H, W)
    *,
    iterations: int,
):
    x0hat = x0_ref[0]
    lfr = lfr_ref[...]
    lfi = lfi_ref[...]
    rfr = rfr_ref[...]
    rfi = rfi_ref[...]
    mask = mask_ref[...]
    b = pl.program_id(0)
    rho = scal_ref[b, 0]
    lam = scal_ref[b, 1]
    H, W = x0hat.shape
    f32 = x0hat.dtype

    # concat-free compensation (see _fgp_common.make_gram_normal_noconcat):
    # output-stacked [hi; lo] + hi-only factors derived once per grid step
    lfr2 = (jnp.concatenate([lfr[:, :H], lfr[:, 2 * H :]], axis=0), lfr[:, :H])
    lfi2 = (jnp.concatenate([lfi[:, :H], lfi[:, 2 * H :]], axis=0), lfi[:, :H])
    rfr2 = (jnp.concatenate([rfr[:W], rfr[2 * W :]], axis=1), rfr[:W])
    rfi2 = (jnp.concatenate([rfi[:W], rfi[2 * W :]], axis=1), rfi[:W])

    def lmul(l2_lh, u):  # compensated left product
        l2, lh = l2_lh
        uh, ul = _split(u)
        m2 = jnp.dot(l2, uh, preferred_element_type=f32)
        corr = jnp.dot(lh, ul, preferred_element_type=f32)
        return m2[:H] + m2[H:] + corr

    def rmul(u, r2_rh):  # compensated right product
        r2, rh = r2_rh
        uh, ul = _split(u)
        m2 = jnp.dot(uh, r2, preferred_element_type=f32)
        corr = jnp.dot(ul, rh, preferred_element_type=f32)
        return m2[:, :W] + m2[:, W:] + corr

    def normal(x):
        # forward: C = F x Fᵀ for REAL x (lr = Fr x, li = Fi x)
        lr = lmul(lfr2, x)
        li = lmul(lfi2, x)
        cr = rmul(lr, rfr2) - rmul(li, rfi2)
        ci = rmul(lr, rfi2) + rmul(li, rfr2)
        cr = cr * mask
        ci = ci * mask
        # adjoint real part: Fᴴ C F̄ (F symmetric; see dft_real._cadj)
        ar = lmul(lfr2, cr) + lmul(lfi2, ci)
        ai = lmul(lfr2, ci) - lmul(lfi2, cr)
        return rmul(ar, rfr2) + rmul(ai, rfi2)

    def body(i, carry):
        x, x_prev = carry
        a = tab_ref[i, 0]
        x_mom = x + a * (x - x_prev)
        res = normal(x_mom) - x0hat
        xg = x_mom - rho * res
        # soft-threshold, exact composed-path formula (prox.py
        # soft_threshold / reference ProxL1.jl:18-22)
        t = rho * lam
        eps = jnp.finfo(f32).eps
        mag = jnp.abs(xg)
        x_new = jnp.maximum(mag - t, 0.0) * (xg + eps) / (mag + eps)
        return (x_new, x)

    x_init = x0hat * 0.0
    x, _ = lax.fori_loop(0, iterations, body, (x_init, x_init))
    out_ref[0] = x


def fista_l1_dft_fused(
    x0hat_b,  # (B, H, W)
    cat,  # dict from dft_real._dft_cat: l_fr, l_fi, r_fr, r_fi
    mask,  # (H, W)
    rho,
    lam,
    iterations: int,
    interpret: bool = False,
):
    B, H, W = x0hat_b.shape
    scal = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(rho, jnp.float32).reshape(-1), (B,)),
            jnp.broadcast_to(jnp.asarray(lam, jnp.float32).reshape(-1), (B,)),
        ],
        axis=1,
    )
    tab = jnp.asarray(_momentum_table("fista", iterations))
    _check_vmem_fista_l1_dft(H, W)
    return pl.pallas_call(
        functools.partial(_kernel, iterations=iterations),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((H, 3 * H), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * W, W), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * W, W), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W), x0hat_b.dtype),
        interpret=interpret,
    )(scal, tab, cat["l_fr"], cat["l_fi"], cat["r_fr"], cat["r_fi"], mask, x0hat_b)


def check_fista_l1_dft_fused(solver):
    """Validate `solver` for the fused FISTA-L1-DFT path (raises ValueError)."""
    from ..models.prox import L1Regularization
    from ..models.solvers.fista import FISTA
    from ..ops.base import NormalOperator
    from ..ops.dft_real import SubsampledDFT2RealOperator

    if not isinstance(solver, FISTA):
        raise ValueError("fused path requires a FISTA solver")
    if not isinstance(solver.AHA, NormalOperator) or solver.AHA.weights is not None:
        raise ValueError(
            "fused path requires AHA to be the NormalOperator of a "
            "SubsampledDFT2RealOperator (construct the solver from A)"
        )
    op = solver.AHA.A
    if not isinstance(op, SubsampledDFT2RealOperator):
        raise ValueError("fused path requires SubsampledDFT2RealOperator")
    if solver.A is not op:
        raise ValueError(
            "fused path requires solver.A to be the SubsampledDFT2RealOperator "
            "itself (construct with FISTA.create(op, ...); AHA-only solvers "
            "are not supported)"
        )
    if op.cat is None:
        raise ValueError("fused path requires compensated=True factors")
    if not isinstance(solver.reg, L1Regularization):
        raise ValueError("fused path requires L1Regularization")
    if solver.proj:
        raise ValueError("fused path does not support projection terms")
    if solver.restart != "none":
        raise ValueError("fused path does not support restart")
    theta0 = solver.theta
    if isinstance(theta0, jax.core.Tracer):
        raise ValueError(
            "fused path needs a concrete solver.theta; close the solver "
            "over jax.jit instead of passing it as a jit argument"
        )
    if float(theta0) != 1.0:
        raise ValueError("fused path requires the default theta=1 schedule")
    H, W = op.im_shape
    _check_vmem_fista_l1_dft(H, W)


def _check_vmem_fista_l1_dft(H, W):
    # four stacked factors: lfr/lfi (H,3H) and rfr/rfi (3W,W)
    vmem_bytes = (10 * H * W + 4 * 3 * H * W + 6 * H * H + 6 * W * W + H * W) * 4
    # 16 MiB: the TPU scoped-VMEM budget (verified empirically — the
    # fused FISTA-TV kernel compiles at 384^2, Mosaic OOMs at 512^2)
    if vmem_bytes > 16 * 1024 * 1024:
        raise ValueError(
            f"fused FISTA-L1-DFT working set ~{vmem_bytes/2**20:.0f} MiB "
            "exceeds VMEM; use the composed solve path"
        )


def solve_fista_l1_dft_fused(solver, B_mat, interpret: bool | None = None):
    """Drop-in fast path for `solve_batched_unrolled(solver, B)` when the
    solver is FISTA + SubsampledDFT2RealOperator + L1 (BASELINE config #2's
    shape). Returns the n×K solution matrix.

    Assumptions are checked — callers get a ValueError naming the
    unsupported piece.
    """
    from ..models.regularization import normalization_factor

    check_fista_l1_dft_fused(solver)
    op = solver.AHA.A

    H, W = op.im_shape
    B_mat = jnp.asarray(B_mat)
    bt = B_mat.T
    x0hat_b = jax.vmap(op.rmv)(bt).reshape(-1, H, W)
    scale = jax.vmap(
        lambda b: normalization_factor(solver.normalize_reg, solver.A, b)
    )(bt)
    lam_eff = solver.reg.get_lam() * scale
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if (H % 64 or W % 64) and not interpret:
        # Mosaic rejects the split-DFT compensation's in-kernel lane-dim
        # REF slices at offsets not divisible by 128 — the [hi hi lo]
        # factors are sliced at lane offset 2H/2W, so H, W % 64 == 0 is
        # required (64^2 and up compile; 16/24/32 fail). The DFT has no
        # stencil form, so smaller sizes must use the composed path.
        raise ValueError(
            f"fused DFT path needs H, W % 64 == 0 on TPU, got {(H, W)}; "
            "use the composed solve path"
        )
    out = fista_l1_dft_fused(
        x0hat_b,
        op.cat,
        op.mask,
        solver.rho,
        lam_eff,
        solver.iterations,
        interpret=interpret,
    )
    return out.reshape(out.shape[0], H * W).T
