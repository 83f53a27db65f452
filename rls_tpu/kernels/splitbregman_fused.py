"""Fully-fused SplitBregman (L21 + TV) multi-coil SENSE solve as ONE
Pallas TPU kernel.

BASELINE config #4: constrained split Bregman on the split-real SENSE
operator with two identity-trafo regularization terms — complex-L1 as
`L21Regularization(slices=2)` (group-ℓ2 over (re, im) pairs) and 2-D TV on
each split plane. The whole outer-Bregman × inner-ADMM × masked-CG ×
TV-FGP nest runs VMEM-resident per slice.

Semantics mirror splitbregman.py step() exactly for the supported
configuration (reference /root/reference/src/SplitBregman.jl:211-267):

    per inner iteration (×iterations_inner):
      β   = β_y + ρ₁(z₁ − u₁) + ρ₂(z₂ − u₂)
      x   = CG(AᴴA + (ρ₁+ρ₂)I, β, x₀=x, maxiter=cg_iters,
               ‖r‖ ≤ tol_inner·‖β‖)            [masked, == pcg(unroll=True)]
      z₁  = prox_L21(x + u₁, λ₁_eff/ρ₁)         [SplitBregman scale λ/ρ,
      z₂  = prox_TV (x + u₂, λ₂_eff/ρ₂)          not ADMM's λ/2ρ — :235]
      uᵢ += x − zᵢ
    per outer iteration (×iterations):
      β_y += Aᴴb − AᴴA x;  zᵢ = x;  uᵢ = 0      [:257-267]

The 3-D TV of the composed path (shape (2,H,W), dims (1,2)) decomposes
exactly into two independent 2-D FGP runs — no gradient couples the re/im
planes and the dual clamp/momentum are elementwise/plane-local — so the
kernel runs `make_tv_fgp` once per plane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._fgp_common import make_sense_normal, make_split_dft3, make_tv_fgp

__all__ = [
    "splitbregman_l1_tv_sense_fused",
    "check_splitbregman_l1_tv_fused",
    "solve_splitbregman_l1_tv_fused",
]


def _kernel(
    scal_ref,  # SMEM (B, 4): per-problem [rho1, rho2, lam1_eff, lam2_eff]
    lfr_ref,  # VMEM (3H, H): [hi; mid; lo] 3-way left factor stack
    lfi_ref,  # VMEM (3H, H)
    rfr_ref,  # VMEM (W, 3W): [hi mid lo] 3-way right factor stack
    rfi_ref,  # VMEM (W, 3W)
    mask_ref,  # VMEM (H, W)
    cr_ref,  # VMEM (C, H, W)
    ci_ref,  # VMEM (C, H, W)
    x0_ref,  # VMEM (1, 2, H, W): Aᴴb split re/im
    out_ref,  # VMEM (1, 2, H, W)
    *,
    iterations: int,
    iterations_inner: int,
    cg_iterations: int,
    tv_iterations: int,
    tol_inner: float,
    n_coils: int,
    fgp_unroll: bool = False,
):
    x0r = x0_ref[0, 0]
    x0i = x0_ref[0, 1]
    mask = mask_ref[...]
    b = pl.program_id(0)
    rho1 = scal_ref[b, 0]
    rho2 = scal_ref[b, 1]
    lam1 = scal_ref[b, 2]
    lam2 = scal_ref[b, 3]
    H, W = x0r.shape
    f32 = x0r.dtype

    # 3-WAY compensation (r5): this kernel chains iterations ×
    # iterations_inner × cg_iterations (≈256) CG steps on this matvec
    # and its Bregman fields integrate the residual. The 2-way 4-term
    # form caps at ~2⁻¹⁶ per multiply (the lo field holds only 8 of the
    # remaining 16 mantissa bits) — measured 6.7e-5 trajectory error vs
    # f64 (PARITY r4/r5); the hi/mid/lo 6-product scheme reaches ~2⁻²⁴
    # (see ops/_precise.split3_bf16 and docs/tpu.md).
    cfwd, cadj = make_split_dft3(
        lfr_ref[...], lfi_ref[...], rfr_ref[...], rfi_ref[...], f32,
    )
    normal = make_sense_normal(cfwd, cadj, mask, cr_ref, ci_ref, n_coils)
    # fgp_unroll: statically-unrolled λ-scaled dual loop with the r5
    # "fold" issue-count reduction — valid because the TV prox scale
    # λ₂/ρ₂ is constant across Bregman iterations. Same strict-f32 math
    # as the unrolled PGM paths; interpret mode keeps the fori loop.
    _, fgp_n = make_tv_fgp(H, W, f32, unroll=fgp_unroll,
                           opt="fold" if fgp_unroll else None)

    rho_sum = rho1 + rho2

    def matvec(vr, vi):  # composite AᴴA + (ρ₁+ρ₂)I (identity trafos)
        nr, ni = normal(vr, vi)
        return nr + rho_sum * vr, ni + rho_sum * vi

    def frob2(ur, ui):
        return jnp.sum(ur * ur) + jnp.sum(ui * ui)

    def cg(br, bi, xr, xi):
        # masked fixed-iteration CG over the joint (re, im) vector ==
        # pcg(unroll=True) on the flat split vector (base.py)
        target = tol_inner * jnp.sqrt(frob2(br, bi))
        mr, mi = matvec(xr, xi)
        r0r = br - mr
        r0i = bi - mi

        def body(_, carry):
            xr, xi, rr, ri, pr, pi, rz = carry
            qr, qi = matvec(pr, pi)
            pq = jnp.sum(pr * qr) + jnp.sum(pi * qi)
            active = jnp.sqrt(frob2(rr, ri)) > target
            denom = jnp.where(pq == 0, 1.0, pq)
            alpha = jnp.where(active, rz / denom, 0.0)
            xr = xr + alpha * pr
            xi = xi + alpha * pi
            rr = rr - alpha * qr
            ri = ri - alpha * qi
            rz_new = frob2(rr, ri)
            beta_c = jnp.where(
                rz == 0, 0.0, rz_new / jnp.where(rz == 0, 1.0, rz)
            )
            pr = jnp.where(active, rr + beta_c * pr, pr)
            pi = jnp.where(active, ri + beta_c * pi, pi)
            return (xr, xi, rr, ri, pr, pi, rz_new)

        xr, xi, _, _, _, _, _ = lax.fori_loop(
            0,
            cg_iterations,
            body,
            (xr, xi, r0r, r0i, r0r, r0i, frob2(r0r, r0i)),
        )
        return xr, xi

    t1 = lam1 / jnp.where(rho1 != 0, rho1, 1.0)
    t2 = lam2 / jnp.where(rho2 != 0, rho2, 1.0)

    def inner_body(_, carry):
        xr, xi, z1r, z1i, u1r, u1i, z2r, z2i, u2r, u2i, byr, byi = carry
        br = byr + rho1 * (z1r - u1r) + rho2 * (z2r - u2r)
        bi = byi + rho1 * (z1i - u1i) + rho2 * (z2i - u2i)
        xr, xi = cg(br, bi, xr, xi)
        # L21(slices=2) z-update: group soft threshold over (re, im)
        ar = xr + u1r
        ai = xi + u1i
        gn = jnp.sqrt(ar * ar + ai * ai)
        sc = jnp.maximum((gn - t1) / jnp.where(gn == 0, 1.0, gn), 0.0)
        z1r = jnp.where(rho1 != 0, ar * sc, ar)
        z1i = jnp.where(rho1 != 0, ai * sc, ai)
        u1r = u1r + xr - z1r
        u1i = u1i + xi - z1i
        # TV z-update, one 2-D FGP per split plane
        vr = xr + u2r
        vi = xi + u2i
        z2r = jnp.where(rho2 != 0, fgp_n(vr, t2, tv_iterations), vr)
        z2i = jnp.where(rho2 != 0, fgp_n(vi, t2, tv_iterations), vi)
        u2r = u2r + xr - z2r
        u2i = u2i + xi - z2i
        return (xr, xi, z1r, z1i, u1r, u1i, z2r, z2i, u2r, u2i, byr, byi)

    def outer_body(_, carry):
        xr, xi, byr, byi = carry
        zero = xr * 0.0
        # reference outer reset: z = Φx = x (identity), u = 0 (:262-265)
        state = (xr, xi, xr, xi, zero, zero, xr, xi, zero, zero, byr, byi)
        state = lax.fori_loop(0, iterations_inner, inner_body, state)
        xr, xi = state[0], state[1]
        nr, ni = normal(xr, xi)
        byr = byr + x0r - nr
        byi = byi + x0i - ni
        return (xr, xi, byr, byi)

    # initial carries derived from a loaded ref (not a splatted constant)
    x_init = x0r * 0.0
    xr, xi, _, _ = lax.fori_loop(
        0, iterations, outer_body, (x_init, x_init, x0r, x0i)
    )
    out_ref[0, 0] = xr
    out_ref[0, 1] = xi


def _dft_cat3(op):
    """3-way [hi; mid; lo] DFT factor stacks for `make_split_dft3`,
    rebuilt from the operator's exact f32 factors (the 2-way cat's
    hi + lo reconstructs them bit-exactly). Left stacks are (3H, H),
    right stacks (W, 3W)."""
    import numpy as np

    from ..ops._precise import stack3_left, stack3_right

    cat = op.cat
    H = cat["l_fr"].shape[0]
    W = cat["r_fr"].shape[1]
    out = {}
    # numpy-side slicing: the cat arrays are concrete operator
    # attributes, but jnp __getitem__ inside a jit trace would return
    # tracers that np.asarray cannot consume
    for key in ("l_fr", "l_fi"):
        c = np.asarray(cat[key])
        f = c[:, :H] + c[:, 2 * H :]
        # stack3_left's (3n, n) [hi; mid; lo] vertical layout is what
        # make_split_dft3's lmul slices
        out[key] = jnp.asarray(stack3_left(f))
    for key in ("r_fr", "r_fi"):
        c = np.asarray(cat[key])
        f = c[:W] + c[2 * W :]
        out[key] = jnp.asarray(stack3_right(f))
    return out


def splitbregman_l1_tv_sense_fused(
    x0hat_b,  # (B, 2, H, W) split re/im Aᴴb
    cat3,  # _dft_cat3 dict: 3-way [hi; mid; lo] factor stacks
    mask,  # (H, W)
    coils_r,  # (C, H, W)
    coils_i,  # (C, H, W)
    rho1,
    rho2,
    lam1,
    lam2,
    iterations: int,
    iterations_inner: int,
    cg_iterations: int,
    tv_iterations: int,
    tol_inner: float,
    interpret: bool = False,
    fgp_unroll: bool = False,
):
    B, _, H, W = x0hat_b.shape
    C = coils_r.shape[0]
    scal = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(v, jnp.float32).reshape(-1), (B,))
            for v in (rho1, rho2, lam1, lam2)
        ],
        axis=1,
    )
    _check_vmem_splitbregman(H, W, C)
    return pl.pallas_call(
        functools.partial(
            _kernel,
            iterations=iterations,
            iterations_inner=iterations_inner,
            cg_iterations=cg_iterations,
            tv_iterations=tv_iterations,
            tol_inner=tol_inner,
            n_coils=C,
            fgp_unroll=fgp_unroll,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3 * H, H), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * H, H), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 3 * W), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 3 * W), lambda b: (0, 0), memory_space=pltpu.VMEM),
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
        scal,
        cat3["l_fr"], cat3["l_fi"], cat3["r_fr"], cat3["r_fi"],
        mask, coils_r, coils_i, x0hat_b,
    )


def _check_vmem_splitbregman(H, W, C):
    vmem_bytes = (
        32 * H * W  # x/β_y/x0/z/u split planes + CG + FGP temps
        + 4 * 3 * H * W  # stacked concat temps
        + 6 * H * H + 6 * W * W  # four stacked DFT factors
        + (2 * C + 1) * H * W  # coil maps + mask
    ) * 4
    # 16 MiB: the TPU scoped-VMEM budget (verified empirically — the
    # fused FISTA-TV kernel compiles at 384^2, Mosaic OOMs at 512^2)
    if vmem_bytes > 16 * 1024 * 1024:
        raise ValueError(
            f"fused SplitBregman working set ~{vmem_bytes/2**20:.0f} MiB "
            "exceeds VMEM; use the composed solve path"
        )


def _term_order(solver):
    """Return (i_l21, i_tv) indices of the L21 and TV terms."""
    from ..models.prox import L21Regularization, TVRegularization

    if len(solver.reg) != 2:
        raise ValueError("fused path requires exactly two reg terms (L21 + TV)")
    if isinstance(solver.reg[0], L21Regularization) and isinstance(
        solver.reg[1], TVRegularization
    ):
        return 0, 1
    if isinstance(solver.reg[0], TVRegularization) and isinstance(
        solver.reg[1], L21Regularization
    ):
        return 1, 0
    raise ValueError(
        "fused path requires one L21Regularization and one TVRegularization"
    )


def check_splitbregman_l1_tv_fused(solver):
    """Validate `solver` for the fused SplitBregman path (raises ValueError)."""
    from ..models.solvers.splitbregman import SplitBregman
    from ..ops.base import IdentityOperator, NormalOperator
    from ..ops.dft_real import SenseDFT2RealOperator

    if not isinstance(solver, SplitBregman):
        raise ValueError("fused path requires a SplitBregman solver")
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
    i_l21, i_tv = _term_order(solver)
    l21 = solver.reg[i_l21]
    tv = solver.reg[i_tv]
    if l21.slices != 2:
        raise ValueError(
            "fused path requires L21Regularization(slices=2) — the split-"
            "real form of complex L1"
        )
    H, W = op.im_shape
    dims = (tv.dims,) if isinstance(tv.dims, int) else tuple(tv.dims)
    if tv.shape != (2, H, W) or tuple(sorted(dims)) != (1, 2):
        raise ValueError(
            "fused path requires TV over shape (2, H, W) with dims (1, 2) "
            "— per-plane 2-D TV on the split representation"
        )
    for t in solver.reg_trafo:
        if not isinstance(t, IdentityOperator):
            raise ValueError("fused path requires identity reg_trafos")
    if solver.proj:
        raise ValueError("fused path does not support projection terms")
    if solver.precon is not None:
        raise ValueError("fused path does not support a preconditioner")
    if solver.abs_tol is not None or solver.rel_tol is not None:
        raise ValueError(
            "fused path runs the fixed inner/outer schedule; abs_tol/rel_tol "
            "early outer updates are not supported"
        )
    tol_inner = solver.tol_inner
    if isinstance(tol_inner, jax.core.Tracer):
        raise ValueError(
            "fused path needs a concrete tol_inner; close the solver over "
            "jax.jit instead of passing it as a jit argument"
        )
    _check_vmem_splitbregman(H, W, op.coils_r.shape[0])


def solve_splitbregman_l1_tv_fused(solver, B_mat,
                                   interpret: bool | None = None,
                                   fgp_unroll: bool | None = None):
    """Drop-in fast path for `solve_batched_unrolled(solver, B)` when the
    solver is SplitBregman + SenseDFT2RealOperator + (L21(slices=2) + TV)
    with identity trafos (BASELINE config #4's shape). Returns the n×K
    solution matrix ([re; im] rows).
    """
    from ..models.regularization import normalization_factor

    check_splitbregman_l1_tv_fused(solver)
    op = solver.AHA.A
    i_l21, i_tv = _term_order(solver)
    H, W = op.im_shape
    n = H * W

    B_mat = jnp.asarray(B_mat)
    bt = B_mat.T
    # x0 = Aᴴb with the SAME 3-way compensation the kernel uses — a
    # lower-order op.rmv here would seed the whole Bregman data term
    # with a ~2⁻¹⁶ systematic bias that the solve then integrates.
    cat3 = _dft_cat3(op)
    cfwd3, cadj3 = make_split_dft3(
        cat3["l_fr"], cat3["l_fi"], cat3["r_fr"], cat3["r_fi"],
        jnp.float32,
    )
    C = op.coils_r.shape[0]

    def _rmv3(y):
        k = y.reshape(C, 2, H, W)
        ur, ui = jax.vmap(cadj3)(k[:, 0] * op.mask, k[:, 1] * op.mask)
        xr = jnp.sum(op.coils_r * ur + op.coils_i * ui, axis=0)
        xi = jnp.sum(op.coils_r * ui - op.coils_i * ur, axis=0)
        return jnp.stack([xr, xi])

    x0hat_b = jax.vmap(_rmv3)(bt)  # (K, 2, H, W) split [re; im]
    scale = jax.vmap(
        lambda b: normalization_factor(solver.normalize_reg, solver.A, b)
    )(bt)
    lam1_eff = solver.reg[i_l21].get_lam() * scale
    lam2_eff = solver.reg[i_tv].get_lam() * scale
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out = splitbregman_l1_tv_sense_fused(
        x0hat_b,
        cat3,
        op.mask,
        op.coils_r,
        op.coils_i,
        solver.rho0[i_l21],
        solver.rho0[i_tv],
        lam1_eff,
        lam2_eff,
        solver.iterations,
        solver.iterations_inner,
        solver.iterations_cg,
        solver.reg[i_tv].iterations_tv,
        float(solver.tol_inner),
        interpret=interpret,
        fgp_unroll=(not interpret) if fgp_unroll is None else fgp_unroll,
    )
    return out.reshape(out.shape[0], 2 * n).T
