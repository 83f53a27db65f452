"""Fully-fused PDHG (Chambolle–Pock) solve as ONE Pallas TPU kernel.

The composed PDHG path (models/solvers/pdhg.py; reference
PrimalDualSolver.jl — disabled upstream but part of the API surface)
dispatches ~6 operator applications per iteration. This kernel runs the
whole fixed-iteration primal-dual loop VMEM-resident per problem:

    y₁ ← (y₁ + σ(Ax − u)) / (1 + σ)              dual data update
    y₂ ← prox_{σR∗}(y₂ + σ Φ x)                  dual reg update
    x  ← x − τ(Aᴴy₁ + Φᴴy₂), then projections    primal update

* A is a `SeparableConvOperator`; forward AND adjoint run as exact VPU
  stencil passes (`_fgp_common.make_sepconv_stencil_ops`) — no MXU, no
  compensation floor;
* Φ is the reference's 8-direction gradient (`Grad8Operator`,
  PrimalDualSolver.jl:141-159) expressed as rolls + global-index masks,
  with the TRUE adjoint (mask-then-unshift per direction); the conjugate
  prox is the exact sequential weighted 8-direction projection
  (`prox_tv_conj_8dir`, PrimalDualSolver.jl:208-302). The L1 kind
  (identity Φ, elementwise λ-ball clip — reference ProxL1Conj) is the
  one-plane special case;
* the primal-dual gap is NOT computed — it never feeds the iterate, and
  the fixed-iteration composed twin (`solve_batched_unrolled`) ignores
  it too, so the kernel matches that path exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._fgp_common import make_sepconv_stencil_ops

__all__ = ["check_pdhg_fused", "solve_pdhg_fused", "pdhg_fused"]

from ..models.solvers.pdhg import _W8 as _W8_TRIPLE  # single source

# direction (dr, dc) of the subtracted sample per plane — the order of
# Grad8Operator.mv / the reference's BB: axial, diagonal, knight-move.
# Locked to the composed path end-to-end by the tv8 equivalence tests.
_DIRS8 = ((1, 0), (0, 1), (1, 1), (1, -1), (2, 1), (2, -1), (1, 2), (1, -2))
# per-direction weights expanded from the solver's (axial, diagonal,
# knight) triple — the same expansion prox_tv_conj_8dir applies
_W8 = (
    _W8_TRIPLE[0], _W8_TRIPLE[0],
    _W8_TRIPLE[1], _W8_TRIPLE[1],
    _W8_TRIPLE[2], _W8_TRIPLE[2], _W8_TRIPLE[2], _W8_TRIPLE[2],
)


def _grad8_ops(H: int, W: int, dtype):
    """(grad, div): the 8-direction forward differences of Grad8Operator
    and the true adjoint, as rolls + global-index masks. Plane k holds
    (u[r,c] − u[r+dr,c+dc]) on its valid region, zero elsewhere; the
    adjoint of each plane is q̃ − shift₊(q̃) with q̃ = q·mask."""
    row = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    masks = []
    for dr, dc in _DIRS8:
        m = row < H - dr
        if dc >= 0:
            m = m & (col < W - dc)
        else:
            m = m & (col >= -dc)
        masks.append(m.astype(dtype))

    def roll2(v, dr, dc):
        # out[r, c] = v[r + dr, c + dc] (wrapping; callers mask)
        if dr:
            v = pltpu.roll(v, (-dr) % H, 0)
        if dc:
            v = pltpu.roll(v, (-dc) % W, 1)
        return v

    def grad(u):
        return tuple(
            (u - roll2(u, dr, dc)) * masks[k]
            for k, (dr, dc) in enumerate(_DIRS8)
        )

    def div(planes):
        out = None
        for k, (dr, dc) in enumerate(_DIRS8):
            q = planes[k] * masks[k]
            term = q - roll2(q, -dr, -dc)
            out = term if out is None else out + term
        return out

    return grad, div


def _kernel(
    scal_ref,  # SMEM (B, 3): per-problem [sigma, tau, lam_eff]
    u_ref,  # VMEM (1, H, W): the data image b
    out_ref,  # VMEM (1, H, W)
    *,
    iterations: int,
    taps: tuple,
    kind: str,  # "tv8" | "l1"
    prox: str,  # "none" | "positive"
):
    b = pl.program_id(0)
    sigma = scal_ref[b, 0]
    tau = scal_ref[b, 1]
    lam = scal_ref[b, 2]
    u = u_ref[0]
    H, W = u.shape
    f32 = u.dtype

    fwd, adj, _ = make_sepconv_stencil_ops(taps[0], taps[1], H, W, f32)
    if kind == "tv8":
        grad, div = _grad8_ops(H, W, f32)
        nplanes = 8
    elif kind == "tviso":
        # the 2-plane directional gradient (GradientOperator, dims (0,1));
        # masked forward diffs + the shared negative-divergence adjoint
        row = lax.broadcasted_iota(jnp.int32, (H, W), 0)
        col = lax.broadcasted_iota(jnp.int32, (H, W), 1)
        not_last_row = (row < H - 1).astype(f32)
        not_last_col = (col < W - 1).astype(f32)

        def grad(x):
            return (
                (pltpu.roll(x, H - 1, 0) - x) * not_last_row,
                (pltpu.roll(x, W - 1, 1) - x) * not_last_col,
            )

        def div(planes):
            pv, ph = planes
            return (
                pltpu.roll(pv, 1, 0) - pv + pltpu.roll(ph, 1, 1) - ph
            )

        nplanes = 2
    else:
        grad = lambda x: (x,)
        div = lambda planes: planes[0]
        nplanes = 1

    inv1s = 1.0 / (1.0 + sigma)
    zero = u * 0.0

    def conj_prox(planes):
        if kind == "tv8":
            # exact sequential weighted projection: direction k's group
            # norm uses the already-thresholded p₁..p_{k−1}
            planes = list(planes)
            for k in range(8):
                gnorm = jnp.sqrt(sum(p * p for p in planes))
                planes[k] = (
                    _W8[k] * jnp.sign(planes[k]) * jnp.minimum(gnorm, lam)
                )
            return tuple(planes)

        # elementwise λ-ball clip (ProxL1Conj; also the isotropic TV
        # scheme's anisotropic per-element clamp) — maps 0 → 0, so the
        # tviso planes' masked last row/col stay exactly zero
        def clip(p):
            mag = jnp.abs(p)
            return jnp.where(mag > lam, p / jnp.maximum(mag, 1e-30) * lam, p)

        return tuple(clip(p) for p in planes)

    def body(_, carry):
        x, y1, y2 = carry
        y1 = (y1 + sigma * (fwd(x) - u)) * inv1s
        g = grad(x)
        y2 = conj_prox(tuple(y2[k] + sigma * g[k] for k in range(nplanes)))
        x = x - tau * (adj(y1) + div(y2))
        if prox == "positive":
            x = jnp.maximum(x, 0.0)
        return (x, y1, y2)

    x, _, _ = lax.fori_loop(
        0, iterations, body, (zero, zero, (zero,) * nplanes)
    )
    out_ref[0] = x


def pdhg_fused(
    u_b,  # (B, H, W) f32: data images
    sigma,  # scalar or (B,)
    tau,  # scalar or (B,)
    lam,  # scalar or (B,): effective λ
    iterations: int,
    taps: tuple,
    kind: str = "tv8",
    prox: str = "none",
    interpret: bool = False,
):
    B, H, W = u_b.shape
    scal = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(v, jnp.float32).reshape(-1), (B,))
            for v in (sigma, tau, lam)
        ],
        axis=1,
    )
    _check_vmem_pdhg(H, W, kind)
    return pl.pallas_call(
        functools.partial(
            _kernel, iterations=iterations, taps=taps, kind=kind, prox=prox
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W), u_b.dtype),
        interpret=interpret,
    )(scal, u_b)


def _check_vmem_pdhg(H, W, kind):
    planes = {"tv8": 13, "tviso": 8, "l1": 6}[kind]  # x/y1/u + duals + temps
    vmem_bytes = planes * H * W * 4
    if vmem_bytes > 16 * 1024 * 1024:
        raise ValueError(
            f"fused PDHG working set ~{vmem_bytes/2**20:.0f} MiB exceeds "
            "VMEM; use the composed solve path"
        )


def check_pdhg_fused(solver):
    """Validate `solver` for the fused PDHG path (raises ValueError naming
    the unsupported piece)."""
    from ..models.prox import PositiveRegularization, RealRegularization
    from ..models.solvers.pdhg import PDHG
    from ..ops.conv_direct import SeparableConvOperator

    if not isinstance(solver, PDHG):
        raise ValueError("fused PDHG path requires a PDHG solver")
    op = solver.A
    if not isinstance(op, SeparableConvOperator):
        raise ValueError("fused PDHG path requires a SeparableConvOperator")
    if op.taps_len is None:
        raise ValueError("fused PDHG path requires tap metadata (from_taps)")
    if jnp.issubdtype(op.dtype, jnp.complexfloating):
        raise ValueError("fused PDHG path covers real systems only")
    if solver.reg_kind == "tv":
        if tuple(solver.shape) != tuple(op.im_shape):
            raise ValueError("TV shape must equal the operator image shape")
        kind = "tv8" if solver.tv_scheme == "8dir" else "tviso"
    elif solver.reg_kind == "l1":
        kind = "l1"
    else:
        raise ValueError(f"unsupported reg kind {solver.reg_kind}")
    for p in solver.proj:
        if not isinstance(p, (PositiveRegularization, RealRegularization)):
            raise ValueError(
                "fused PDHG path supports only Positive/Real projections, "
                f"got {type(p).__name__}"
            )
    _check_vmem_pdhg(op.im_shape[0], op.im_shape[1], kind)
    if any(isinstance(p, PositiveRegularization) for p in solver.proj):
        return kind, "positive"
    return kind, "none"  # Real is the identity on real systems


def solve_pdhg_fused(solver, B_mat, interpret: bool | None = None):
    """Drop-in fast path for ``solve_batched_unrolled(solver, B)`` on a
    PDHG solver over a separable-conv operator with 8-direction TV or L1
    (columns of ``B_mat`` are problems; returns n × K)."""
    from ..models.regularization import normalization_factor

    kind, prox = check_pdhg_fused(solver)
    op = solver.A
    H, W = op.im_shape
    B_mat = jnp.asarray(B_mat)
    if jnp.issubdtype(B_mat.dtype, jnp.complexfloating):
        raise ValueError(
            "fused PDHG path covers real data only (complex b: the "
            "composed real-only solver rejects it too)"
        )
    if B_mat.shape[0] != H * W:
        raise ValueError(
            f"B has {B_mat.shape[0]} rows, operator expects {H * W}"
        )
    bt = B_mat.astype(jnp.float32).T  # (P, H·W)
    scale = jax.vmap(
        lambda col: normalization_factor(solver.normalize_reg, solver.A, col)
    )(bt)
    lam_eff = (
        jnp.real(jnp.asarray(solver.reg.get_lam(), jnp.float32))
        * jnp.asarray(scale, jnp.float32)
    )
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out = pdhg_fused(
        bt.reshape(-1, H, W),
        solver.sigma,
        solver.tau,
        lam_eff,
        solver.iterations,
        op.taps_hw(),
        kind=kind,
        prox=prox,
        interpret=interpret,
    )
    return out.reshape(out.shape[0], H * W).T
