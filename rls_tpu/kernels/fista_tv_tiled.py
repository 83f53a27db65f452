"""Row-tiled fused FISTA-TV solve — beyond-VMEM image sizes (≥512²).

The whole-solve kernel (fista_tv_fused.py) keeps every live plane
VMEM-resident, which caps it at ~384² under the 16 MiB scoped-VMEM
budget; past that the composed path pays a ~13× throughput cliff
(VERDICT r2 item 2). This kernel removes the cap by streaming ROW TILES
of the iterate through HBM:

  * grid = (problems, iterations, tiles): one FISTA iteration of one
    row tile per grid step, iteration-major so every tile of x_i exists
    before any tile of iteration i+1 starts;
  * a rotating TRIPLE buffer in HBM (shipped as a discarded output in
    `pl.ANY` space) holds x_{i−1}, x_i, x_{i+1}: step i reads buffers
    i−1 and i and writes buffer i+1 — never the ones being read, so no
    read/write hazard at any grid order;
  * each tile reads a (tile_rows + 2·halo, W) window by async DMA with a
    CLAMPED dynamic start (static size, 8-row aligned) and computes with
    GLOBAL-row masks (`make_*_window` factories), so image boundaries
    land exactly and the window edge garbage stays outside the
    dependence cone: halo ≥ (tv_iters + 1) + 2·(k_h//2) + 1;
  * x_{i+1} is exact everywhere (only interior rows are written back),
    so the tiled solve is numerically EQUIVALENT to the monolithic
    kernel — tiling adds halo recompute, not approximation.

HBM traffic per iteration: 3 window reads + 1 interior write per tile
(~4× the image) — far below the VPU-bound FGP loop's compute time.
Semantics mirror FISTA.step + prox_tv_fgp (reference
/root/reference/src/FISTA.jl:139-185, ProxTV.jl:89-125), fixed-iteration
schedule from the same f64 momentum table as the monolithic kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._fgp_common import (
    make_sepconv_normal_stencil_window,
    make_tv_fgp_window,
)
from .fista_tv_fused import _momentum_table

__all__ = [
    "fista_tv_tiled",
    "solve_fista_tv_tiled",
    "check_fista_tv_tiled",
    "pick_tile_rows",
]


def _kernel(
    scal_ref,  # SMEM (P, 2): per-problem [rho, lam_eff]
    tab_ref,  # SMEM (iterations, 4): momentum table (col 0 = α)
    x0_hbm,  # ANY (P, H, W): AᴴB
    out_ref,  # VMEM (1, TR, W) solution tile (revisited; last write wins)
    xbuf_hbm,  # ANY (3, H, W): rotating x_{i-1}/x_i/x_{i+1} buffers
    x0_s,  # VMEM scratch (TRH, W)
    xi_s,  # VMEM scratch (TRH, W)
    xm_s,  # VMEM scratch (TRH, W)
    xn_s,  # VMEM scratch (TRH, W)
    sems,  # DMA semaphores (4,)
    *,
    H: int,
    W: int,
    TR: int,
    halo: int,
    taps: tuple,
    tv_iterations: int,
):
    p = pl.program_id(0)
    i = pl.program_id(1)
    t = pl.program_id(2)
    TRH = TR + 2 * halo
    f32 = x0_s.dtype

    # clamped full-size read window: row0 = clamp(t·TR − halo, 0, H − TRH);
    # all offsets stay multiples of 8 (TR, halo, H are)
    row0 = jnp.clip(t * TR - halo, 0, H - TRH)
    int_off = t * TR - row0  # interior start within the window

    cp0 = pltpu.make_async_copy(
        x0_hbm.at[p, pl.ds(row0, TRH), :], x0_s, sems.at[0]
    )
    cp0.start()
    cur = i % 3
    prev = (i - 1) % 3
    nxt = (i + 1) % 3

    @pl.when(i > 0)
    def _read_x():
        pltpu.make_async_copy(
            xbuf_hbm.at[cur, pl.ds(row0, TRH), :], xi_s, sems.at[1]
        ).start()

    @pl.when(i > 1)
    def _read_xm():
        pltpu.make_async_copy(
            xbuf_hbm.at[prev, pl.ds(row0, TRH), :], xm_s, sems.at[2]
        ).start()

    @pl.when(i == 0)
    def _zero_x():
        xi_s[...] = jnp.zeros((TRH, W), f32)

    @pl.when(i <= 1)  # x_{-1} = x_0 = 0
    def _zero_xm():
        xm_s[...] = jnp.zeros((TRH, W), f32)

    cp0.wait()

    @pl.when(i > 0)
    def _wait_x():
        pltpu.make_async_copy(
            xbuf_hbm.at[cur, pl.ds(row0, TRH), :], xi_s, sems.at[1]
        ).wait()

    @pl.when(i > 1)
    def _wait_xm():
        pltpu.make_async_copy(
            xbuf_hbm.at[prev, pl.ds(row0, TRH), :], xm_s, sems.at[2]
        ).wait()

    rho = scal_ref[p, 0]
    lam = scal_ref[p, 1]
    a = tab_ref[i, 0]

    normal = make_sepconv_normal_stencil_window(
        taps[0], taps[1], H, W, TRH, row0, f32
    )
    _, fgp = make_tv_fgp_window(H, W, TRH, row0, f32)

    x = xi_s[...]
    x0hat = x0_s[...]
    x_mom = x + a * (x - xm_s[...])
    res = normal(x_mom) - x0hat
    x_new = fgp(x_mom - rho * res, rho * lam, tv_iterations)
    xn_s[...] = x_new

    # write the interior rows of x_{i+1} back to the rotating buffer and
    # the solution tile (the final iteration's write is the last visit)
    wr = pltpu.make_async_copy(
        xn_s.at[pl.ds(int_off, TR), :],
        xbuf_hbm.at[nxt, pl.ds(t * TR, TR), :],
        sems.at[3],
    )
    wr.start()
    out_ref[0] = xn_s[pl.ds(int_off, TR), :]
    wr.wait()


def pick_tile_rows(H: int, W: int, halo: int, vmem_budget: int | None = None):
    """Largest 8-multiple divisor of H whose ~16-plane working set fits
    the scoped-VMEM budget (planes: 4 scratch windows + FGP/stencil
    temps, empirical)."""
    budget = vmem_budget if vmem_budget is not None else 14 * 1024 * 1024
    best = None
    for tr in range(8, H // 2 + 1, 8):
        if H % tr:
            continue
        trh = tr + 2 * halo
        if trh > H:
            continue
        if 16 * trh * W * 4 <= budget:
            best = tr
    return best


def fista_tv_tiled(
    x0hat_b,  # (P, H, W) f32: AᴴB per problem
    taps,  # (taps_h, taps_w) separable kernel taps
    rho,
    lam,
    iterations: int,
    tv_iterations: int,
    tile_rows: int | None = None,
    interpret: bool = False,
):
    P, H, W = x0hat_b.shape
    kh = len(taps[0])
    cone = (tv_iterations + 1) + 2 * (kh // 2) + 1
    halo = -(-cone // 8) * 8
    if H % 8:
        raise ValueError(f"tiled path needs H % 8 == 0, got {H}")
    TR = tile_rows if tile_rows is not None else pick_tile_rows(H, W, halo)
    if TR is None or H % TR or TR + 2 * halo > H or H // TR < 2:
        raise ValueError(
            f"no valid tile size for H={H}, W={W}, halo={halo} "
            "(use the monolithic fused kernel instead)"
        )
    TRH = TR + 2 * halo

    scal = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(rho, jnp.float32).reshape(-1), (P,)),
            jnp.broadcast_to(jnp.asarray(lam, jnp.float32).reshape(-1), (P,)),
        ],
        axis=1,
    )
    tab = jnp.asarray(_momentum_table("fista", iterations))

    sol, _ = pl.pallas_call(
        functools.partial(
            _kernel,
            H=H,
            W=W,
            TR=TR,
            halo=halo,
            taps=taps,
            tv_iterations=tv_iterations,
        ),
        grid=(P, iterations, H // TR),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, TR, W), lambda p, i, t: (p, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P, H, W), x0hat_b.dtype),
            jax.ShapeDtypeStruct((3, H, W), x0hat_b.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((TRH, W), jnp.float32),
            pltpu.VMEM((TRH, W), jnp.float32),
            pltpu.VMEM((TRH, W), jnp.float32),
            pltpu.VMEM((TRH, W), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(scal, tab, x0hat_b)
    return sol


def check_fista_tv_tiled(solver):
    """Validate `solver` for the tiled path (FISTA + SeparableConv + 2-D
    TV, fixed schedule). Raises ValueError naming the first unsupported
    piece; returns (taps_h, taps_w)."""
    from ..models.prox import TVRegularization
    from ..models.solvers.fista import FISTA
    from ..ops.base import NormalOperator
    from ..ops.conv_direct import SeparableConvOperator

    if not isinstance(solver, FISTA):
        raise ValueError("tiled path requires FISTA")
    if not isinstance(solver.AHA, NormalOperator):
        raise ValueError(
            "tiled path requires AHA to be the NormalOperator of a "
            "SeparableConvOperator"
        )
    if solver.AHA.weights is not None:
        raise ValueError("tiled path does not support weighted normal ops")
    op = solver.AHA.A
    if not isinstance(op, SeparableConvOperator):
        raise ValueError("tiled path requires SeparableConvOperator")
    if op.taps_len is None:
        raise ValueError("tiled path requires separable kernel tap metadata")
    if solver.A is None:
        raise ValueError("tiled path requires solver.A (for x0hat = Aᴴb)")
    reg = solver.reg
    if not isinstance(reg, TVRegularization):
        raise ValueError("tiled path requires TVRegularization")
    H, W = op.im_shape
    dims = (reg.dims,) if isinstance(reg.dims, int) else tuple(reg.dims)
    if reg.shape != (H, W) or tuple(sorted(dims)) != (0, 1):
        raise ValueError("tiled path requires 2-D TV over both axes")
    if solver.proj:
        raise ValueError("tiled path does not support projection terms")
    if getattr(solver, "restart", "none") != "none":
        raise ValueError(
            "tiled path does not support restart (per-problem reductions "
            "span tiles); use the monolithic fused kernel"
        )
    theta0 = getattr(solver, "theta", 1.0)
    if isinstance(theta0, jax.core.Tracer) or float(theta0) != 1.0:
        raise ValueError("tiled path requires the default concrete theta=1")
    taps = op.taps_hw()
    kh = len(taps[0])
    cone = (reg.iterations_tv + 1) + 2 * (kh // 2) + 1
    halo = -(-cone // 8) * 8
    if H % 8:
        raise ValueError(f"tiled path needs H % 8 == 0, got {H}")
    tr = pick_tile_rows(H, W, halo)
    if tr is None or H // tr < 2 or tr + 2 * halo > H:
        raise ValueError(
            f"no valid tile size for H={H}, W={W}, halo={halo} "
            "(use the monolithic fused kernel instead)"
        )
    return taps


def solve_fista_tv_tiled(
    solver, B_mat, interpret: bool | None = None, tile_rows: int | None = None
):
    """Drop-in fast path for `solve_batched_unrolled(solver, B)` at image
    sizes beyond the monolithic kernel's VMEM ceiling (512², 1024², …).
    Returns the n×K solution matrix like the composed driver."""
    taps = check_fista_tv_tiled(solver)
    op = solver.AHA.A
    reg = solver.reg
    H, W = op.im_shape

    B_mat = jnp.asarray(B_mat)
    bt = B_mat.T
    x0hat_b = jax.vmap(solver.A.rmv)(bt).reshape(-1, H, W)
    from ..models.regularization import normalization_factor

    scale = jax.vmap(
        lambda b: normalization_factor(solver.normalize_reg, solver.A, b)
    )(bt)
    lam_eff = reg.get_lam() * scale
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out = fista_tv_tiled(
        x0hat_b,
        taps,
        solver.rho,
        lam_eff,
        solver.iterations,
        reg.iterations_tv,
        tile_rows=tile_rows,
        interpret=interpret,
    )
    return out.reshape(out.shape[0], H * W).T
