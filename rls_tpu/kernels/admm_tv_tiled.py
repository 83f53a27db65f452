"""Row-tiled fused ADMM-TV solve for beyond-VMEM image sizes (≥512²).

The monolithic fused ADMM-TV kernel (admm_tv_fused.py) keeps the CG
state AND the TV-FGP dual fields whole-image VMEM-resident, which caps
it at ~384² under the 16 MiB scoped-VMEM budget — past that the composed
path pays the same ~13× cliff VERDICT r2 flagged for FISTA-TV. This
kernel removes the cap with a split strategy exploiting ADMM's shape:

  * the inner CG is pointwise axpys + global dots + ONE short-reach
    stencil matvec — its live set is a handful of full planes, so it
    runs UNTILED on full-image VMEM scratch (x, r, p, q) even at 512²;
  * only the TV-FGP z-update (the piece whose ~10 live dual/temp planes
    blew the budget) is row-tiled: a static in-kernel tile loop over
    (TR + 2·halo, W) windows with global-row masks
    (`_fgp_common.make_tv_fgp_window`), halo ≥ the FGP dependence cone
    (iterations_tv + 1). The xg = x + u input plane is full-image exact
    scratch, so every window is exact and the tiling adds halo
    recompute, not approximation.

grid = (problems,); the ADMM outer loop and the masked inner CG are
in-kernel `lax.fori_loop`s. Semantics mirror admm.py step() for the
same configuration the monolithic kernel supports (single TV term,
identity trafo, vary_rho="none", fixed iterations; reference
ADMM.jl:230-309), using the exact f32 VPU stencil Gram.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._fgp_common import (
    make_sepconv_normal_stencil_window,
    make_tv_fgp_window,
)

__all__ = [
    "admm_tv_tiled",
    "solve_admm_tv_tiled",
    "check_admm_tv_tiled",
    "pick_tile_rows_admm",
]


def _kernel(
    scal_ref,  # SMEM (B, 2): per-problem [rho, lam_eff]
    x0_ref,  # VMEM (1, H, W): Aᴴb
    out_ref,  # VMEM (1, H, W)
    x_s,  # VMEM scratch (H, W): primal x (doubles as CG iterate)
    z_s,  # VMEM scratch (H, W): split variable z
    u_s,  # VMEM scratch (H, W): scaled dual u
    r_s,  # VMEM scratch (H, W): CG residual
    p_s,  # VMEM scratch (H, W): CG direction
    q_s,  # VMEM scratch (H, W): CG matvec / z-update assembly
    *,
    H: int,
    W: int,
    TR: int,
    halo: int,
    taps: tuple,
    iterations: int,
    cg_iterations: int,
    tv_iterations: int,
    tol_inner: float,
    prox: str = "none",
    fgp_unroll: bool = True,
):
    b = pl.program_id(0)
    rho = scal_ref[b, 0]
    lam = scal_ref[b, 1]
    f32 = x_s.dtype
    x0hat = x0_ref[0]

    # the matvec's dependence cone is the TWO vertical stencil passes
    # (conv + correlation, kh//2 reach each) — still far smaller than the
    # FGP cone, so its tile windows are cheap
    kh = len(taps[0])
    halo_mv = -(-(2 * (kh // 2)) // 8) * 8
    T = H // TR

    def matvec_into(dst, src):
        """dst ← (AᴴA + ρI) src, row-tiled (windowed stencil gram +
        pointwise ρ·src on interiors). dst and src must be distinct."""
        for t in range(T):
            lo = max(0, t * TR - halo_mv)
            hi = min(H, (t + 1) * TR + halo_mv)
            off = t * TR - lo
            normal = make_sepconv_normal_stencil_window(
                taps[0], taps[1], H, W, hi - lo, lo, f32
            )
            v = normal(src[lo:hi, :])
            sl = slice(t * TR, (t + 1) * TR)
            dst[sl, :] = v[off : off + TR, :] + rho * src[sl, :]

    rho_safe = jnp.where(rho != 0, rho, 1.0)
    lam_z = lam / (2.0 * rho_safe)

    # initial carries derived from a loaded ref (not a splatted constant)
    x_s[...] = x0hat * 0.0
    z_s[...] = x0hat * 0.0
    u_s[...] = x0hat * 0.0

    def outer_body(_, carry):
        # --- x-update: CG on (AᴴA + ρI) x = Aᴴb + ρ(z − u) ----------------
        beta = x0hat + rho * (z_s[...] - u_s[...])
        target = tol_inner * jnp.sqrt(jnp.sum(beta * beta))
        matvec_into(r_s, x_s)  # r ← (AᴴA + ρI) x
        r_s[...] = beta - r_s[...]
        p_s[...] = r_s[...]
        r0z = jnp.sum(r_s[...] * r_s[...])

        def cg_body(_, rz):
            # masked fixed-iteration CG step == pcg(unroll=True)
            # (base.py) on scratch refs; `active` uses ‖r‖ = √rz
            matvec_into(q_s, p_s)
            pq = jnp.sum(p_s[...] * q_s[...])
            active = jnp.sqrt(rz) > target
            denom = jnp.where(pq == 0, 1.0, pq)
            alpha = jnp.where(active, rz / denom, 0.0)
            x_s[...] = x_s[...] + alpha * p_s[...]
            r_s[...] = r_s[...] - alpha * q_s[...]
            rz_new = jnp.sum(r_s[...] * r_s[...])
            beta_c = jnp.where(
                rz == 0, 0.0, rz_new / jnp.where(rz == 0, 1.0, rz)
            )
            p_s[...] = jnp.where(active, r_s[...] + beta_c * p_s[...], p_s[...])
            return rz_new

        lax.fori_loop(0, cg_iterations, cg_body, r0z)
        if prox == "positive":
            # projection terms apply right after the x-update (admm.py
            # step; reference ADMM.jl:246-249); Real is the identity here
            x_s[...] = jnp.maximum(x_s[...], 0.0)

        # --- z-update: row-tiled TV-FGP prox of x + u ---------------------
        for t in range(T):
            lo = max(0, t * TR - halo)
            hi = min(H, (t + 1) * TR + halo)
            n_rows = hi - lo
            off = t * TR - lo  # interior start within the window (static)
            _, fgp = make_tv_fgp_window(H, W, n_rows, lo, f32,
                                        unroll=fgp_unroll,
                                        opt="fold" if fgp_unroll else None)
            xg = x_s[lo:hi, :] + u_s[lo:hi, :]
            z_new = fgp(xg, lam_z, tv_iterations)
            q_s[t * TR : (t + 1) * TR, :] = z_new[off : off + TR, :]

        # --- z/u assembly (admm.py step(); ρ = 0 ⇒ prox is identity) ------
        z = jnp.where(rho != 0, q_s[...], x_s[...] + u_s[...])
        u_s[...] = u_s[...] + x_s[...] - z
        z_s[...] = z
        return carry

    lax.fori_loop(0, iterations, outer_body, jnp.asarray(0.0, f32))
    out_ref[0] = x_s[...]


def pick_tile_rows_admm(
    H: int, W: int, halo: int, vmem_budget: int | None = None
):
    """Largest 8-multiple divisor of H whose working set fits: 6 full
    scratch planes + x0/out blocks + ~10 tile-sized FGP planes (the
    matvec is also tiled, with a far smaller halo, so the FGP tiles
    dominate). Returns None when nothing fits (fall back to the
    monolithic kernel or the composed path)."""
    budget = vmem_budget if vmem_budget is not None else 14 * 1024 * 1024
    fixed = (6 + 2) * H * W * 4
    best = None
    for tr in range(8, H + 1, 8):
        if H % tr:
            continue
        tile = 10 * (tr + 2 * halo) * W * 4
        if fixed + tile <= budget:
            best = tr
    return best


def admm_tv_tiled(
    x0hat_b,  # (B, H, W) f32: Aᴴb per problem
    taps,
    rho,
    lam,
    iterations: int,
    cg_iterations: int,
    tv_iterations: int,
    tol_inner: float,
    tile_rows: int | None = None,
    interpret: bool = False,
    prox: str = "none",
):
    B, H, W = x0hat_b.shape
    halo = -(-(tv_iterations + 2) // 8) * 8
    if H % 8:
        raise ValueError(f"tiled path needs H % 8 == 0, got {H}")
    TR = (
        tile_rows
        if tile_rows is not None
        else pick_tile_rows_admm(H, W, halo)
    )
    if TR is None or H % TR:
        raise ValueError(
            f"no valid ADMM tile size for H={H}, W={W}, halo={halo}"
        )
    scal = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(rho, jnp.float32).reshape(-1), (B,)),
            jnp.broadcast_to(jnp.asarray(lam, jnp.float32).reshape(-1), (B,)),
        ],
        axis=1,
    )
    # Scoped-VMEM limit: the 16 MiB Mosaic default is a compiler knob, not
    # the hardware (v5e has 128 MiB VMEM). The picker's budget model counts
    # 6 scratch + 2 block planes + the FGP tile, but the real allocation
    # also double-buffers the in/out blocks and carries Mosaic stack slack —
    # measured on chip: 16.23 MiB at 512²/TR=256 vs the 13.9 MiB model
    # (bench_suite OOM, 2026-08-18). Grant the model + 2 extra planes +
    # 2 MiB slack, never below the 16 MiB default.
    plane = H * W * 4
    model = (6 + 2) * plane + 10 * (TR + 2 * halo) * W * 4
    vmem_limit = max(16 * 1024 * 1024, model + 2 * plane + 2 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(
            _kernel,
            H=H, W=W, TR=TR, halo=halo, taps=taps,
            iterations=iterations,
            cg_iterations=cg_iterations,
            tv_iterations=tv_iterations,
            tol_inner=tol_inner,
            prox=prox,
            fgp_unroll=not interpret,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W), x0hat_b.dtype),
        scratch_shapes=[
            pltpu.VMEM((H, W), jnp.float32) for _ in range(6)
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(scal, x0hat_b)


def check_admm_tv_tiled(solver):
    """Validate `solver` for the tiled ADMM-TV path (raises ValueError
    naming the first unsupported piece; returns taps). Same solver
    requirements as the monolithic `check_admm_tv_fused` (reference
    ADMM.jl:230-309 configuration), but sized for ≥512² images."""
    from ..models.prox import TVRegularization
    from ..models.solvers.admm import ADMM
    from ..ops.base import IdentityOperator, NormalOperator
    from ..ops.conv_direct import SeparableConvOperator

    if not isinstance(solver, ADMM):
        raise ValueError("tiled path requires an ADMM solver")
    if not isinstance(solver.AHA, NormalOperator) or solver.AHA.weights is not None:
        raise ValueError(
            "tiled path requires AHA to be the NormalOperator of a "
            "SeparableConvOperator (construct the solver from A, not AHA)"
        )
    op = solver.AHA.A
    if not isinstance(op, SeparableConvOperator):
        raise ValueError("tiled path requires SeparableConvOperator")
    if op.taps_len is None:
        raise ValueError("tiled path requires separable kernel tap metadata")
    if solver.A is None:
        raise ValueError("tiled path requires solver.A (for Aᴴb)")
    if len(solver.reg) != 1 or not isinstance(solver.reg[0], TVRegularization):
        raise ValueError("tiled path requires exactly one TVRegularization term")
    if not isinstance(solver.reg_trafo[0], IdentityOperator):
        raise ValueError("tiled path requires an identity reg_trafo")
    reg = solver.reg[0]
    H, W = op.im_shape
    dims = (reg.dims,) if isinstance(reg.dims, int) else tuple(reg.dims)
    if reg.shape != (H, W) or tuple(sorted(dims)) != (0, 1):
        raise ValueError("tiled path requires 2-D TV over both axes")
    from ..models.prox import PositiveRegularization, RealRegularization

    for p in solver.proj:
        if not isinstance(p, (PositiveRegularization, RealRegularization)):
            raise ValueError(
                "tiled path supports only Positive/Real projection terms, "
                f"got {type(p).__name__}"
            )
    if solver.vary_rho != "none":
        raise ValueError("tiled path does not support vary_rho")
    if solver.precon is not None:
        raise ValueError("tiled path does not support a preconditioner")
    tol_inner = solver.tol_inner
    if isinstance(tol_inner, jax.core.Tracer):
        raise ValueError(
            "tiled path needs a concrete tol_inner; close the solver over "
            "jax.jit instead of passing it as a jit argument"
        )
    halo = -(-(reg.iterations_tv + 2) // 8) * 8
    if H % 8:
        raise ValueError(f"tiled path needs H % 8 == 0, got {H}")
    if pick_tile_rows_admm(H, W, halo) is None:
        raise ValueError(
            f"no valid ADMM tile size for H={H}, W={W}, halo={halo} "
            "(use the composed solve path)"
        )
    return op.taps_hw()


def solve_admm_tv_tiled(
    solver,
    B_mat,
    interpret: bool | None = None,
    tile_rows: int | None = None,
):
    """Drop-in fast path for `solve_batched_unrolled(solver, B)` when the
    solver is ADMM + SeparableConvOperator + one identity-trafo 2-D TV
    term at image sizes beyond the monolithic fused kernel's VMEM ceiling
    (512²). Returns the n×K solution matrix like the composed driver."""
    from ..models.prox import PositiveRegularization

    from ..models.regularization import normalization_factor

    taps = check_admm_tv_tiled(solver)
    op = solver.AHA.A
    reg = solver.reg[0]
    H, W = op.im_shape

    B_mat = jnp.asarray(B_mat)
    bt = B_mat.T
    x0hat_b = jax.vmap(solver.A.rmv)(bt).reshape(-1, H, W)
    scale = jax.vmap(
        lambda b: normalization_factor(solver.normalize_reg, solver.A, b)
    )(bt)
    lam_eff = reg.get_lam() * scale
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out = admm_tv_tiled(
        x0hat_b,
        taps,
        solver.rho0[0],
        lam_eff,
        solver.iterations,
        solver.iterations_cg,
        reg.iterations_tv,
        float(solver.tol_inner),
        prox=(
            "positive"
            if any(
                isinstance(p, PositiveRegularization) for p in solver.proj
            )
            else "none"
        ),
        tile_rows=tile_rows,
        interpret=interpret,
    )
    return out.reshape(out.shape[0], H * W).T
