"""Fully-fused FISTA-L21 multi-coil SENSE solve as ONE Pallas TPU kernel.

The complex-image MRI reconstruction of BASELINE config #4 (split-real
SENSE operator, ops/dft_real.py) with complex-L1 regularization — which on
the split representation is exactly `L21Regularization(λ, slices=2)`, the
group-ℓ2 soft threshold over (re, im) pairs. The whole fixed-iteration
FISTA loop runs VMEM-resident per slice: per-coil complex sensitivity
multiplies, the compensated split-real DFT sandwiches (8 stacked MXU
matmuls each way per coil), the k-space mask, and the pairwise magnitude
threshold.

Semantics mirror FISTA.step (fista.py, track_residual=False, no restart)
with `SenseDFT2RealOperator.normal` and `L21Regularization._group_scale`
(reference FISTA.jl:139-185, ProxL21.jl:30-35).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._fgp_common import make_sense_normal, make_split_dft
from .fista_tv_fused import _momentum_table

__all__ = ["fista_l21_sense_fused", "solve_fista_l21_sense_fused"]


def _kernel(
    scal_ref,  # SMEM (B, 2): [rho, lam_eff]
    tab_ref,  # SMEM (iterations, 4)
    lfr_ref,  # VMEM (H, 3H)
    lfi_ref,  # VMEM (H, 3H)
    rfr_ref,  # VMEM (3W, W)
    rfi_ref,  # VMEM (3W, W)
    mask_ref,  # VMEM (H, W)
    cr_ref,  # VMEM (C, H, W) coil maps, real part
    ci_ref,  # VMEM (C, H, W) coil maps, imag part
    x0_ref,  # VMEM (1, 2, H, W): Aᴴb split re/im
    out_ref,  # VMEM (1, 2, H, W)
    *,
    iterations: int,
    n_coils: int,
):
    x0r = x0_ref[0, 0]
    x0i = x0_ref[0, 1]
    lfr = lfr_ref[...]
    lfi = lfi_ref[...]
    rfr = rfr_ref[...]
    rfi = rfi_ref[...]
    mask = mask_ref[...]
    b = pl.program_id(0)
    rho = scal_ref[b, 0]
    lam = scal_ref[b, 1]
    H, W = x0r.shape
    f32 = x0r.dtype

    cfwd, cadj = make_split_dft(lfr, lfi, rfr, rfi, f32)
    normal = make_sense_normal(cfwd, cadj, mask, cr_ref, ci_ref, n_coils)

    def body(i, carry):
        xr, xi, pr, pi = carry
        a = tab_ref[i, 0]
        mr = xr + a * (xr - pr)
        mi = xi + a * (xi - pi)
        nr, ni = normal(mr, mi)
        gr = mr - rho * (nr - x0r)
        gi = mi - rho * (ni - x0i)
        # complex-L1 ≡ L21 over (re, im) pairs (prox.py _group_scale)
        t = rho * lam
        gn = jnp.sqrt(gr * gr + gi * gi)
        scale = jnp.maximum((gn - t) / jnp.where(gn == 0, 1.0, gn), 0.0)
        return (gr * scale, gi * scale, xr, xi)

    zr = x0r * 0.0
    xr, xi, _, _ = lax.fori_loop(0, iterations, body, (zr, zr, zr, zr))
    out_ref[0, 0] = xr
    out_ref[0, 1] = xi


def fista_l21_sense_fused(
    x0hat_b,  # (B, 2, H, W) split re/im Aᴴb
    cat,  # dft_real._dft_cat dict
    mask,  # (H, W)
    coils_r,  # (C, H, W)
    coils_i,  # (C, H, W)
    rho,
    lam,
    iterations: int,
    interpret: bool = False,
):
    B, _, H, W = x0hat_b.shape
    C = coils_r.shape[0]
    scal = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(rho, jnp.float32).reshape(-1), (B,)),
            jnp.broadcast_to(jnp.asarray(lam, jnp.float32).reshape(-1), (B,)),
        ],
        axis=1,
    )
    tab = jnp.asarray(_momentum_table("fista", iterations))
    _check_vmem_sense(H, W, C)
    return pl.pallas_call(
        functools.partial(_kernel, iterations=iterations, n_coils=C),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((H, 3 * H), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * W, W), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * W, W), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H, W), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H, W), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 2, H, W), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, H, W), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2, H, W), x0hat_b.dtype),
        interpret=interpret,
    )(
        scal, tab,
        cat["l_fr"], cat["l_fi"], cat["r_fr"], cat["r_fi"],
        mask, coils_r, coils_i, x0hat_b,
    )


def check_fista_l21_sense_fused(solver):
    """Validate `solver` for the fused SENSE FISTA-L21 path (raises ValueError)."""
    from ..models.prox import L21Regularization
    from ..models.solvers.fista import FISTA
    from ..ops.base import NormalOperator
    from ..ops.dft_real import SenseDFT2RealOperator

    if not isinstance(solver, FISTA):
        raise ValueError("fused path requires a FISTA solver")
    if not isinstance(solver.AHA, NormalOperator) or solver.AHA.weights is not None:
        raise ValueError(
            "fused path requires AHA to be the NormalOperator of a "
            "SenseDFT2RealOperator (construct the solver from A)"
        )
    op = solver.AHA.A
    if not isinstance(op, SenseDFT2RealOperator):
        raise ValueError("fused path requires SenseDFT2RealOperator")
    if solver.A is not op:
        raise ValueError(
            "fused path requires solver.A to be the SenseDFT2RealOperator "
            "itself (AHA-only solvers are not supported)"
        )
    if op.cat is None:
        raise ValueError("fused path requires compensated=True factors")
    reg = solver.reg
    if not isinstance(reg, L21Regularization) or reg.slices != 2:
        raise ValueError(
            "fused path requires L21Regularization(slices=2) — the split-"
            "real form of complex L1"
        )
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
    _check_vmem_sense(H, W, op.coils_r.shape[0])


def _check_vmem_sense(H, W, C):
    vmem_bytes = (
        16 * H * W  # split planes, momentum, grads, temps
        + 4 * 3 * H * W  # stacked concat temps
        + 6 * H * H + 6 * W * W  # four stacked DFT factors
        + (2 * C + 1) * H * W  # coil maps + mask
    ) * 4
    # 16 MiB: the TPU scoped-VMEM budget (verified empirically — the
    # fused FISTA-TV kernel compiles at 384^2, Mosaic OOMs at 512^2)
    if vmem_bytes > 16 * 1024 * 1024:
        raise ValueError(
            f"fused SENSE working set ~{vmem_bytes/2**20:.0f} MiB exceeds "
            "VMEM; use the composed solve path"
        )


def solve_fista_l21_sense_fused(solver, B_mat, interpret: bool | None = None):
    """Drop-in fast path for `solve_batched_unrolled(solver, B)` when the
    solver is FISTA + SenseDFT2RealOperator + L21(slices=2) (complex-L1
    SENSE MRI). Returns the n×K solution matrix ([re; im] rows).

    Assumptions are checked — callers get a ValueError naming the
    unsupported piece.
    """
    from ..models.regularization import normalization_factor

    check_fista_l21_sense_fused(solver)
    op = solver.AHA.A
    reg = solver.reg

    H, W = op.im_shape
    n = H * W
    B_mat = jnp.asarray(B_mat)
    bt = B_mat.T
    x0 = jax.vmap(op.rmv)(bt)  # (K, 2n) split [re; im]
    x0hat_b = x0.reshape(-1, 2, H, W)
    scale = jax.vmap(
        lambda b: normalization_factor(solver.normalize_reg, solver.A, b)
    )(bt)
    lam_eff = reg.get_lam() * scale
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out = fista_l21_sense_fused(
        x0hat_b,
        op.cat,
        op.mask,
        op.coils_r,
        op.coils_i,
        solver.rho,
        lam_eff,
        solver.iterations,
        interpret=interpret,
    )
    return out.reshape(out.shape[0], 2 * n).T
