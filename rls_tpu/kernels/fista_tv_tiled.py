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
(~4× the image) — far below the VPU-bound FGP loop's compute time. The
window reads for tile t+1 are PREFETCHED during tile t's compute
(dedicated landing buffers, copied into the compute buffers on arrival),
so only each iteration's first tile pays DMA latency.
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
from .fista_tv_fused import (
    _fista_dynamic_scalars,
    _momentum_table,
    _pogm_dynamic_coeffs,
    _pogm_restart_decision,
)

__all__ = [
    "fista_tv_tiled",
    "solve_fista_tv_tiled",
    "check_fista_tv_tiled",
    "pick_tile_rows",
]


def _kernel(
    scal_ref,  # SMEM (P, 2): per-problem [rho, lam_eff]
    tab_ref,  # SMEM (iterations, 4): momentum table (col 0 = α)
    x0_hbm,  # ANY (P, H + 2·halo, W): AᴴB, zero-padded by halo rows
    out_ref,  # VMEM (1, TR, W) solution tile (revisited; last write wins)
    xbuf_hbm,  # ANY (3, H + 2·halo, W): rotating x_{i-1}/x_i/x_{i+1}
    x0_s,  # VMEM scratch (TRH, W): compute buffers
    xi_s,  # VMEM scratch (TRH, W)
    xm_s,  # VMEM scratch (TRH, W)
    xn_s,  # VMEM scratch (TRH, W)
    p0_s,  # VMEM scratch (TRH, W): prefetch landing buffers (tile t+1)
    pi_s,  # VMEM scratch (TRH, W)
    pm_s,  # VMEM scratch (TRH, W)
    x0full_s,  # VMEM scratch (H + 2·halo, W): per-problem resident AᴴB
    sems,  # DMA semaphores (4,)
    *,
    H: int,
    W: int,
    TR: int,
    halo: int,
    taps: tuple,
    tv_iterations: int,
    fgp_unroll: bool = True,
):
    p = pl.program_id(0)
    i = pl.program_id(1)
    t = pl.program_id(2)
    T = pl.num_programs(2)
    TRH = TR + 2 * halo
    f32 = x0_s.dtype

    # the HBM buffers are halo-padded, so every tile reads the full-size
    # window at padded offset t·TR and the interior sits at the STATIC
    # offset `halo` (Mosaic needs provably 8-aligned vector slices; a
    # clamped dynamic offset is not provable). Window row j holds global
    # image row t·TR − halo + j; the pad rows are zeroed once below so
    # edge windows read exact zeros (garbage could be NaN, and NaN·0
    # would leak through the masks).
    #
    # DMA schedule: tile t's windows are PREFETCHED into p*_s during tile
    # t−1's compute (reads ride chans 0-2, started after the previous
    # copy-out so each chan is strictly start→wait→start…). Step t waits
    # the prefetch, copies p*_s → compute buffers (VMEM-to-VMEM, ~µs),
    # then immediately issues tile t+1's prefetch so the DMAs overlap the
    # VPU-bound FGP compute. Prefetch never crosses an iteration boundary
    # (tile 0 of iteration i+1 would read buffer nxt while iteration i is
    # still writing it), so iterations cold-start their first tile.
    row0 = t * TR  # padded coords
    row0_img = t * TR - halo  # global image coords for the mask factories

    @pl.when(jnp.logical_and(p == 0, jnp.logical_and(i == 0, t == 0)))
    def _zero_pads():
        xn_s[...] = jnp.zeros((TRH, W), f32)
        for buf in range(3):
            for off in (0, halo + H):
                pltpu.make_async_copy(
                    xn_s.at[pl.ds(0, halo), :],
                    xbuf_hbm.at[buf, pl.ds(off, halo), :],
                    sems.at[3],
                ).start()
                pltpu.make_async_copy(
                    xn_s.at[pl.ds(0, halo), :],
                    xbuf_hbm.at[buf, pl.ds(off, halo), :],
                    sems.at[3],
                ).wait()

    cur = i % 3
    prev = (i - 1) % 3
    nxt = (i + 1) % 3

    # AᴴB is iteration-invariant: land the whole halo-padded plane in
    # VMEM once per problem (one HBM read of the image instead of
    # T·iterations window reads — a third of the loop's read DMA), then
    # serve every tile window VMEM→VMEM.
    @pl.when(jnp.logical_and(i == 0, t == 0))
    def _load_x0():
        cp = pltpu.make_async_copy(x0_hbm.at[p], x0full_s, sems.at[0])
        cp.start()
        cp.wait()

    def reads(tt, dst0, dsti, dstm):
        """The (up to 3) window copies for tile `tt` into the given
        landing buffers — x_{i-1} only exists for i > 1, x_i for i > 0."""
        r = tt * TR
        return (
            pltpu.make_async_copy(
                x0full_s.at[pl.ds(r, TRH), :], dst0, sems.at[0]
            ),
            pltpu.make_async_copy(
                xbuf_hbm.at[cur, pl.ds(r, TRH), :], dsti, sems.at[1]
            ),
            pltpu.make_async_copy(
                xbuf_hbm.at[prev, pl.ds(r, TRH), :], dstm, sems.at[2]
            ),
        )

    def start_reads(tt, dst0, dsti, dstm):
        c0, ci, cm = reads(tt, dst0, dsti, dstm)
        c0.start()

        @pl.when(i > 0)
        def _():
            ci.start()

        @pl.when(i > 1)
        def _():
            cm.start()

    def wait_reads(tt, dst0, dsti, dstm):
        c0, ci, cm = reads(tt, dst0, dsti, dstm)
        c0.wait()

        @pl.when(i > 0)
        def _():
            ci.wait()

        @pl.when(i > 1)
        def _():
            cm.wait()

    @pl.when(t == 0)  # iteration cold start: fetch tile 0 directly
    def _cold():
        start_reads(t, x0_s, xi_s, xm_s)
        wait_reads(t, x0_s, xi_s, xm_s)

    @pl.when(t > 0)  # tile t was prefetched during t−1's compute
    def _landed():
        wait_reads(t, p0_s, pi_s, pm_s)
        x0_s[...] = p0_s[...]
        xi_s[...] = pi_s[...]
        xm_s[...] = pm_s[...]

    @pl.when(t + 1 < T)  # overlap tile t+1's DMAs with this compute
    def _prefetch():
        start_reads(t + 1, p0_s, pi_s, pm_s)

    @pl.when(i == 0)
    def _zero_x():
        xi_s[...] = jnp.zeros((TRH, W), f32)

    @pl.when(i <= 1)  # x_{-1} = x_0 = 0
    def _zero_xm():
        xm_s[...] = jnp.zeros((TRH, W), f32)

    rho = scal_ref[p, 0]
    lam = scal_ref[p, 1]
    a = tab_ref[i, 0]

    normal = make_sepconv_normal_stencil_window(
        taps[0], taps[1], H, W, TRH, row0_img, f32
    )
    # fold: issue-count-reduced unrolled window FGP (same strict-f32
    # math; AB_FLAGSHIP_r05 measured +6% on the monolithic kernel)
    _, fgp = make_tv_fgp_window(H, W, TRH, row0_img, f32,
                                unroll=fgp_unroll,
                                opt="fold" if fgp_unroll else None)

    x = xi_s[...]
    x0hat = x0_s[...]
    x_mom = x + a * (x - xm_s[...])
    res = normal(x_mom) - x0hat
    x_new = fgp(x_mom - rho * res, rho * lam, tv_iterations)
    xn_s[...] = x_new

    # write the interior rows of x_{i+1} back to the rotating buffer and
    # the solution tile (the final iteration's write is the last visit)
    wr = pltpu.make_async_copy(
        xn_s.at[pl.ds(halo, TR), :],
        xbuf_hbm.at[nxt, pl.ds(halo + t * TR, TR), :],
        sems.at[3],
    )
    wr.start()
    out_ref[0] = xn_s[halo : halo + TR, :]
    wr.wait()


def _kernel_vmem(
    scal_ref,  # SMEM (P, 2)
    tab_ref,  # SMEM (iterations, 4)
    x0_ref,  # VMEM (1, H, W): AᴴB block, resident across the i axis
    out_ref,  # VMEM (1, H, W): solution (revisited; last write wins)
    xc_s,  # VMEM scratch (H, W): x_i
    xm_s,  # VMEM scratch (H, W): x_{i-1}
    xn_s,  # VMEM scratch (H, W): x_{i+1} being assembled
    st_s,  # SMEM scratch (4,): [θ_in, θ_old, done, ‖x0hat‖] (dynamic mode)
    *,
    H: int,
    W: int,
    TR: int,
    halo: int,
    taps: tuple,
    tv_iterations: int,
    restart: bool = False,
    rel_tol: float | None = None,
    fgp_unroll: bool = False,
):
    """VMEM-carry tiled variant: the FISTA carries stay full-image VMEM
    scratch (persistent across grid steps); only the iteration TEMPS
    (stencil passes, FGP duals) are tile-sized — they are what blew the
    monolithic kernel's budget. The tile loop is a STATIC python loop,
    so every slice offset is a literal: no DMA, no dynamic-alignment
    constraints. grid = (problems, iterations).

    Unlike the HBM-streamed variant, the full iterate lives in scratch,
    so the PER-PROBLEM reductions of the dynamic FISTA schedule are
    computable in-kernel: the gradient-restart dot Σ res·(x_new − x)
    (reference FISTA.jl:171-176) and the convergence norm ‖res‖ are
    accumulated over tile INTERIORS (exact — tiles partition the rows,
    and res is exact on interior rows by the halo), with the f32 θ
    recurrence and done flag carried in SMEM scratch across grid steps.
    Semantics mirror fista_tv_fused._fista_loop_dynamic exactly."""
    p = pl.program_id(0)
    i = pl.program_id(1)
    f32 = xc_s.dtype
    dynamic = restart or rel_tol is not None
    one = jnp.asarray(1.0, f32)

    @pl.when(i == 0)
    def _init():
        xc_s[...] = jnp.zeros((H, W), f32)
        xm_s[...] = jnp.zeros((H, W), f32)
        if dynamic:
            st_s[0] = one  # θ_in (check enforces theta0 = 1)
            st_s[1] = one  # θ_old
            st_s[2] = jnp.asarray(0.0, f32)  # done flag
            if rel_tol is not None:
                st_s[3] = jnp.sqrt(jnp.sum(x0_ref[0] * x0_ref[0]))

    rho = scal_ref[p, 0]
    lam = scal_ref[p, 1]
    if dynamic:
        th_in = st_s[0]
        th_old = st_s[1]
        a = (th_old - 1.0) / th_in
        keep = st_s[2]  # freeze AFTER the step that detected convergence
        live = 1.0 - keep
    else:
        a = tab_ref[i, 0]
        live = None
    dot_acc, res_acc = _fista_vmem_sweep(
        x0_ref, xc_s, xm_s, xn_s, a, live, rho, lam,
        H, W, TR, halo, taps, tv_iterations, restart, rel_tol,
        fgp_unroll=fgp_unroll,
    )

    if dynamic:
        # the shared scalar epilogue (_fista_dynamic_scalars); the
        # reductions there are whole-plane, here tile-interior accumulators
        norm_x0 = st_s[3] if rel_tol is not None else None
        th_new, th_old_new, done_new, _ = _fista_dynamic_scalars(
            th_in, th_old, keep, dot_acc, res_acc, norm_x0,
            restart, rel_tol, f32,
        )
        st_s[0] = th_new
        st_s[1] = th_old_new
        st_s[2] = done_new
        # m1_out = m1 + live·(x − m1) — BEFORE xc is overwritten
        xm_s[...] = xm_s[...] + live * (xc_s[...] - xm_s[...])
    else:
        # rotate: x_{i-1} ← x_i, x_i ← x_{i+1} (cheap VMEM copies)
        xm_s[...] = xc_s[...]
    xc_s[...] = xn_s[...]
    out_ref[0] = xn_s[...]


def _fista_vmem_sweep(
    x0_ref, xc_s, xm_s, xn_s, a, live, rho, lam,
    H, W, TR, halo, taps, tv_iterations, restart, rel_tol,
    fgp_unroll=False,
):
    """One FISTA iteration over all row tiles of the VMEM-carry layout:
    reads xc_s/xm_s windows, writes xn_s interiors (with the `live`
    freeze factor when dynamic). Returns the (restart dot, Σres²)
    interior accumulators. Shared by the grid-stepped and the
    fori-looped kernel bodies."""
    f32 = xc_s.dtype
    dynamic = live is not None
    T = H // TR
    dot_acc = jnp.asarray(0.0, f32)
    res_acc = jnp.asarray(0.0, f32)
    for t in range(T):
        lo = max(0, t * TR - halo)
        hi = min(H, (t + 1) * TR + halo)
        n_rows = hi - lo
        off = t * TR - lo  # interior start within the window (static)
        normal = make_sepconv_normal_stencil_window(
            taps[0], taps[1], H, W, n_rows, lo, f32
        )
        # unrolled lambda-scaled FGP on the fixed schedule (+17% on the
        # monolithic kernel, ab_fgp r4); dynamic keeps the fori loop
        unrolled = fgp_unroll and not dynamic
        _, fgp = make_tv_fgp_window(H, W, n_rows, lo, f32,
                                    unroll=unrolled,
                                    opt="fold" if unrolled else None)
        x = xc_s[lo:hi, :]
        x_mom = x + a * (x - xm_s[lo:hi, :])
        res = normal(x_mom) - x0_ref[0, lo:hi, :]
        x_new = fgp(x_mom - rho * res, rho * lam, tv_iterations)
        win = slice(off, off + TR)
        sl = slice(t * TR, (t + 1) * TR)
        if dynamic:
            x_int = x[win, :]
            new_int = x_new[win, :]
            res_int = res[win, :]
            if restart == "gradient_mapping":
                mom_int = x_mom[win, :]
                dot_acc = dot_acc + jnp.sum(
                    (mom_int - new_int) * (new_int - x_int)
                )
            elif restart:
                dot_acc = dot_acc + jnp.sum(res_int * (new_int - x_int))
            if rel_tol is not None:
                res_acc = res_acc + jnp.sum(res_int * res_int)
            xn_s[sl, :] = x_int + live * (new_int - x_int)
        else:
            xn_s[sl, :] = x_new[win, :]
    return dot_acc, res_acc


def _kernel_vmem_fori(
    scal_ref,  # SMEM (P, 2)
    tab_ref,  # SMEM (iterations, 4)
    x0_ref,  # VMEM (1, H, W)
    out_ref,  # VMEM (1, H, W)
    xc_s,  # VMEM scratch (H, W)
    xm_s,  # VMEM scratch (H, W)
    xn_s,  # VMEM scratch (H, W)
    *,
    H: int,
    W: int,
    TR: int,
    halo: int,
    taps: tuple,
    tv_iterations: int,
    iterations: int,
    restart: bool = False,
    rel_tol: float | None = None,
    fgp_unroll: bool = False,
):
    """`_kernel_vmem` with the iteration axis as an in-kernel
    `lax.fori_loop` instead of a grid dimension: grid = (problems,), one
    grid step per problem, θ/done as scalar loop carries. Same math and
    tiling; trades per-iteration grid-step dispatch overhead for a
    traced loop (A/B-selectable via ``iter_loop="fori"``)."""
    from jax import lax

    p = pl.program_id(0)
    f32 = xc_s.dtype
    dynamic = restart or rel_tol is not None
    one = jnp.asarray(1.0, f32)
    rho = scal_ref[p, 0]
    lam = scal_ref[p, 1]
    # derive initial planes from a loaded ref, not a splatted constant
    # (Mosaic relayout restriction on replicated fori carries also bites
    # scratch stores feeding the loop on some versions)
    xc_s[...] = x0_ref[0] * 0.0
    xm_s[...] = x0_ref[0] * 0.0
    norm_x0 = (
        jnp.sqrt(jnp.sum(x0_ref[0] * x0_ref[0]))
        if rel_tol is not None
        else None
    )

    def body(i, carry):
        th_in, th_old, done = carry
        if dynamic:
            a = (th_old - 1.0) / th_in
            live = 1.0 - done  # freeze AFTER the detecting step
        else:
            a = tab_ref[i, 0]
            live = None
        dot_acc, res_acc = _fista_vmem_sweep(
            x0_ref, xc_s, xm_s, xn_s, a, live, rho, lam,
            H, W, TR, halo, taps, tv_iterations, restart, rel_tol,
            fgp_unroll=fgp_unroll,
        )
        if dynamic:
            th_new, th_old_new, done_new, _ = _fista_dynamic_scalars(
                th_in, th_old, done, dot_acc, res_acc, norm_x0,
                restart, rel_tol, f32,
            )
            xm_s[...] = xm_s[...] + live * (xc_s[...] - xm_s[...])
            xc_s[...] = xn_s[...]
            return (th_new, th_old_new, done_new)
        xm_s[...] = xc_s[...]
        xc_s[...] = xn_s[...]
        return carry

    lax.fori_loop(
        0, iterations, body, (one, one, jnp.asarray(0.0, f32))
    )
    out_ref[0] = xc_s[...]


def _kernel_vmem_pgm(
    scal_ref,  # SMEM (P, 2)
    tab_ref,  # SMEM (iterations, 4): full momentum table (_momentum_table)
    x0_ref,  # VMEM (1, H, W)
    out_ref,  # VMEM (1, H, W)
    *scratch,  # table mode: (x, y, z, xn, yn, zn) VMEM (H, W) planes;
    #            dynamic POGM adds (w, wn) planes and a (6,) SMEM scalar
    #            carry [θ, σ, γ_old, done, ‖x0hat‖, unused]
    H: int,
    W: int,
    TR: int,
    halo: int,
    taps: tuple,
    tv_iterations: int,
    method: str,
    iterations: int = 0,
    restart: bool = False,
    rel_tol: float | None = None,
    sigma_fac: float = 1.0,
    fgp_unroll: bool = False,
):
    """OptISTA/POGM VMEM-carry tiled variant: like `_kernel_vmem` but
    with the (x, y, z) carry triple of the table-driven PGM family
    (fista_tv_fused._pgm_loop semantics, reference OptISTA.jl:145-176 /
    POGM.jl:189-213 without restart). Every step of both methods is
    window-local given the halo cone (one normal-op stencil + one FGP
    chain per iteration — the same cone as FISTA), so the tiling stays
    exact. grid = (problems, iterations).

    With ``restart``/``rel_tol`` (POGM only), the dynamic θ/σ/γ
    recurrences of `_pogm_loop_dynamic` run on SMEM scalar carries, the
    running w plane becomes a 4th full-image carry, and the restart
    criterion's three dot products (POGM.jl:222-232) are accumulated
    exactly over tile interiors."""
    dynamic = restart or rel_tol is not None
    if dynamic:
        x_s, y_s, z_s, w_s, xn_s, yn_s, zn_s, wn_s, st_s = scratch
    else:
        x_s, y_s, z_s, xn_s, yn_s, zn_s = scratch
    p = pl.program_id(0)
    i = pl.program_id(1)
    f32 = x_s.dtype
    one = jnp.asarray(1.0, f32)

    @pl.when(i == 0)
    def _init():
        x_s[...] = jnp.zeros((H, W), f32)
        y_s[...] = jnp.zeros((H, W), f32)
        z_s[...] = jnp.zeros((H, W), f32)
        if dynamic:
            w_s[...] = jnp.zeros((H, W), f32)
            st_s[0] = one  # θ (check enforces theta0 = 1)
            st_s[1] = one  # σ
            st_s[2] = one  # γ_old
            st_s[3] = jnp.asarray(0.0, f32)  # done flag
            if rel_tol is not None:
                st_s[4] = jnp.sqrt(jnp.sum(x0_ref[0] * x0_ref[0]))

    rho = scal_ref[p, 0]
    lam = scal_ref[p, 1]
    T = H // TR

    if dynamic:
        # the θ/σ/γ recurrences of _pogm_loop_dynamic (POGM.jl:189-202),
        # via the shared _pogm_dynamic_coeffs
        th_old = st_s[0]
        sig = st_s[1]
        gam_old = st_s[2]
        keep = st_s[3]
        live = 1.0 - keep
        last = i == iterations - 1
        th, a, bcoef, gam = _pogm_dynamic_coeffs(
            th_old, sig, gam_old, rho, last, restart
        )
        e = rho * a / gam_old  # the POGM z-coupling ρα/γ_old
        prox_scale = gam  # γλ (already includes ρ)
    else:
        a = tab_ref[i, 0]
        bcoef = tab_ref[i, 1]
        g = tab_ref[i, 2]
        e = tab_ref[i, 3]
        prox_scale = rho * g

    c1_acc = jnp.asarray(0.0, f32)  # Σ w_mid·(x_new − z_new)
    c2_acc = jnp.asarray(0.0, f32)  # Σ w_mid·res
    res_acc = jnp.asarray(0.0, f32)  # Σ res²

    for t in range(T):
        lo = max(0, t * TR - halo)
        hi = min(H, (t + 1) * TR + halo)
        n_rows = hi - lo
        off = t * TR - lo  # interior start within the window (static)
        normal = make_sepconv_normal_stencil_window(
            taps[0], taps[1], H, W, n_rows, lo, f32
        )
        unrolled = fgp_unroll and not dynamic
        _, fgp = make_tv_fgp_window(H, W, n_rows, lo, f32,
                                    unroll=unrolled,
                                    opt="fold" if unrolled else None)
        x = x_s[lo:hi, :]
        y = y_s[lo:hi, :]
        z = z_s[lo:hi, :]
        res = normal(x) - x0_ref[0, lo:hi, :]
        if method == "optista":
            y_new = fgp(y - (rho * g) * res, (rho * g) * lam, tv_iterations)
            z_new = x + (y_new - y) * e
            x_new = (1.0 + a + bcoef) * z_new - a * z - bcoef * x
        else:  # pogm
            y_new = x - rho * res
            x_mid = (
                (1.0 + a + bcoef) * y_new - a * y - (bcoef + e) * x + e * z
            )
            x_new = fgp(x_mid, prox_scale * lam, tv_iterations)
            z_new = x_mid
        sl = slice(t * TR, (t + 1) * TR)
        win = slice(off, off + TR)
        if dynamic:
            x_i = x[win, :]
            y_i = y[win, :]
            z_i = z[win, :]
            xn_i = x_new[win, :]
            yn_i = y_new[win, :]
            zn_i = z_new[win, :]
            w_i = w_s[sl, :]
            if restart:
                w_mid = w_i + yn_i + (rho / gam) * (xn_i - zn_i)
                c1_acc = c1_acc + jnp.sum(w_mid * (xn_i - zn_i))
                c2_acc = c2_acc + jnp.sum(w_mid * res[win, :])
                wn_i = (rho / gam) * (zn_i - xn_i) - yn_i
            else:
                wn_i = w_i
            if rel_tol is not None:
                r_i = res[win, :]
                res_acc = res_acc + jnp.sum(r_i * r_i)
            xn_s[sl, :] = x_i + live * (xn_i - x_i)
            yn_s[sl, :] = y_i + live * (yn_i - y_i)
            zn_s[sl, :] = z_i + live * (zn_i - z_i)
            wn_s[sl, :] = w_i + live * (wn_i - w_i)
        else:
            xn_s[sl, :] = x_new[win, :]
            yn_s[sl, :] = y_new[win, :]
            zn_s[sl, :] = z_new[win, :]

    if dynamic:
        # restart decision + freeze masking, exactly as _pogm_loop_dynamic
        sig_new = sig
        if restart:
            sig_new, th = _pogm_restart_decision(
                c1_acc, c2_acc, gam, sig, th, sigma_fac, f32
            )
        if rel_tol is not None:
            rel = jnp.sqrt(res_acc) / st_s[4]
            st_s[3] = jnp.maximum(keep, (rel < rel_tol).astype(f32))
            th = th_old + live * (th - th_old)
            sig_new = sig + live * (sig_new - sig)
            gam = gam_old + live * (gam - gam_old)
        st_s[0] = th
        st_s[1] = sig_new
        st_s[2] = gam
        w_s[...] = wn_s[...]
    x_s[...] = xn_s[...]
    y_s[...] = yn_s[...]
    z_s[...] = zn_s[...]
    out_ref[0] = xn_s[...]


def pick_tile_rows_vmem(
    H: int, W: int, halo: int, vmem_budget: int | None = None,
    method: str = "fista", dynamic: bool = False,
):
    """Largest 8-multiple divisor of H for the VMEM-carry variant:
    full-image scratches + x0/out blocks + ~12 tile-sized temp planes
    must fit the budget. FISTA carries 3 full-image scratches (x, x_prev,
    x_next); OptISTA/POGM carry (x, y, z) plus 3 assembly planes; dynamic
    POGM (restart/early-exit) adds the (w, w_next) pair. Returns None
    when even the smallest tile doesn't fit (fall back to the
    HBM-streamed variant)."""
    budget = vmem_budget if vmem_budget is not None else 14 * 1024 * 1024
    if method == "fista":
        planes = 5
    elif dynamic:
        planes = 10
    else:
        planes = 8
    fixed = planes * H * W * 4  # carries + assemblies + x0 block + out block
    best = None
    for tr in range(8, H + 1, 8):
        if H % tr:
            continue
        if fixed + 12 * (tr + 2 * halo) * W * 4 <= budget:
            best = tr
    return best


def _vmem_limit_tiled(
    H: int, W: int, TR: int, halo: int, mode: str,
    method: str = "fista", dynamic: bool = False,
):
    """Explicit Mosaic vmem_limit_bytes for the tiled kernels — the same
    calibration as admm_tv_tiled / _vmem_limit_pgm_tv (ADVICE r3): the
    pickers' 14 MiB working-set model undercounts in/out block
    double-buffering and Mosaic stack slack, so gate-raised A/B runs at
    large shapes could still OOM at the 16 MiB Mosaic default. Model +
    2 extra copies of the largest streamed block + 2 MiB, floored at the
    16 MiB default."""
    trh = TR + 2 * halo
    if mode == "vmem":
        if method == "fista":
            planes = 5
        elif dynamic:
            planes = 10
        else:
            planes = 8
        model = planes * H * W * 4 + 12 * trh * W * 4
        slack = 2 * H * W * 4
    else:  # hbm-streamed: scratch windows are tile-sized, out block TR×W,
        # plus the per-problem VMEM-resident halo-padded x0 plane
        model = 19 * trh * W * 4 + (H + 2 * halo) * W * 4
        slack = 2 * TR * W * 4
    return max(16 * 1024 * 1024, model + slack + 2 * 1024 * 1024)


def pick_tile_rows(H: int, W: int, halo: int, vmem_budget: int | None = None):
    """Largest 8-multiple divisor of H whose ~19-plane working set fits
    the scoped-VMEM budget (planes: 4 compute + 3 prefetch scratch
    windows + FGP/stencil temps, empirical).

    Default budget 32 MiB: the kernel passes an explicit
    vmem_limit_bytes sized to this model (far under the 128 MiB
    physical VMEM), and larger tiles cut halo recompute — chip A/B at
    1024² (tiled_ab r4): TR=128 (the old 14 MiB pick) 10.6 p/s,
    TR=256 12.9 p/s (+22%, bitwise-equal), TR=512 12.1 p/s. The model
    includes the per-problem VMEM-resident x0 plane."""
    budget = vmem_budget if vmem_budget is not None else 32 * 1024 * 1024
    plane = (H + 2 * halo) * W * 4
    best = None
    for tr in range(8, H // 2 + 1, 8):
        if H % tr:
            continue
        trh = tr + 2 * halo
        if trh > H:
            continue
        if 19 * trh * W * 4 + plane <= budget:
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
    mode: str = "auto",
    method: str = "fista",
    restart: bool = False,
    rel_tol: float | None = None,
    sigma_fac: float = 1.0,
    iter_loop: str = "grid",
):
    P, H, W = x0hat_b.shape
    if iter_loop not in ("grid", "fori"):
        raise ValueError(f"unknown iter_loop {iter_loop!r}")
    if iter_loop == "fori" and mode == "hbm":
        raise ValueError("iter_loop='fori' applies to the vmem variant only")
    kh = len(taps[0])
    cone = (tv_iterations + 1) + 2 * (kh // 2) + 1
    halo = -(-cone // 8) * 8
    if H % 8:
        raise ValueError(f"tiled path needs H % 8 == 0, got {H}")
    if method not in ("fista", "optista", "pogm"):
        raise ValueError(f"unknown method {method!r}")
    if method != "fista" and mode == "hbm":
        raise ValueError(
            "hbm-streamed tiling is FISTA-only; OptISTA/POGM ride the "
            "VMEM-carry variant"
        )
    dynamic = restart or rel_tol is not None
    if dynamic and method == "optista":
        raise ValueError(
            "tiled restart/early-exit are FISTA/POGM-only (OptISTA has "
            "no restart scheme, matching the reference)"
        )
    if dynamic and mode == "hbm":
        raise ValueError(
            "tiled restart/early-exit need the VMEM-carry variant (the "
            "streamed kernel has no cross-tile reduction state)"
        )

    scal = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(rho, jnp.float32).reshape(-1), (P,)),
            jnp.broadcast_to(jnp.asarray(lam, jnp.float32).reshape(-1), (P,)),
        ],
        axis=1,
    )
    tab = jnp.asarray(_momentum_table(method, iterations))

    # prefer the DMA-free VMEM-carry variant when the carries fit; the
    # HBM-streamed variant has no size limit but pays window DMAs
    if mode == "auto":
        mode = (
            "vmem"
            if pick_tile_rows_vmem(H, W, halo, method=method, dynamic=dynamic)
            else "hbm"
        )
        if (method != "fista" or dynamic) and mode == "hbm":
            raise ValueError(
                f"no valid VMEM-carry tile size for H={H}, W={W}, "
                f"halo={halo} ({method}{'+restart/early-exit' if dynamic else ''} "
                "has no hbm-streamed variant)"
            )
        if iter_loop == "fori" and mode == "hbm":
            # re-check after auto-resolution: silently timing the
            # grid-stepped HBM kernel when the fori variant was asked for
            # would invalidate the A/B this flag exists for
            raise ValueError(
                f"iter_loop='fori' needs the VMEM-carry variant, but no "
                f"tile size fits H={H}, W={W}, halo={halo}"
            )
    if mode == "vmem":
        TR = (
            tile_rows
            if tile_rows is not None
            else pick_tile_rows_vmem(H, W, halo, method=method, dynamic=dynamic)
        )
        if TR is None or H % TR:
            raise ValueError(
                f"no valid VMEM-carry tile size for H={H}, W={W}, "
                f"halo={halo}"
            )
        if method == "fista":
            if iter_loop == "fori":
                kern = functools.partial(
                    _kernel_vmem_fori,
                    H=H, W=W, TR=TR, halo=halo, taps=taps,
                    tv_iterations=tv_iterations, iterations=iterations,
                    restart=restart, rel_tol=rel_tol,
                    fgp_unroll=not interpret,
                )
                scratch = [pltpu.VMEM((H, W), jnp.float32) for _ in range(3)]
            else:
                kern = functools.partial(
                    _kernel_vmem,
                    H=H, W=W, TR=TR, halo=halo, taps=taps,
                    tv_iterations=tv_iterations,
                    restart=restart, rel_tol=rel_tol,
                    fgp_unroll=not interpret,
                )
                scratch = [pltpu.VMEM((H, W), jnp.float32) for _ in range(3)]
                scratch.append(pltpu.SMEM((4,), jnp.float32))
        else:
            if iter_loop == "fori":
                raise ValueError("iter_loop='fori' is FISTA-only for now")
            kern = functools.partial(
                _kernel_vmem_pgm,
                H=H, W=W, TR=TR, halo=halo, taps=taps,
                tv_iterations=tv_iterations, method=method,
                iterations=iterations,
                restart=restart, rel_tol=rel_tol, sigma_fac=sigma_fac,
                fgp_unroll=not interpret,
            )
            n_planes = 8 if dynamic else 6
            scratch = [pltpu.VMEM((H, W), jnp.float32) for _ in range(n_planes)]
            if dynamic:
                scratch.append(pltpu.SMEM((6,), jnp.float32))
        if method == "fista" and iter_loop == "fori":
            grid = (P,)
            imap = lambda p: (p, 0, 0)
        else:
            grid = (P, iterations)
            imap = lambda p, i: (p, 0, 0)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, H, W), imap, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, H, W), imap, memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((P, H, W), x0hat_b.dtype),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_limit_tiled(
                    H, W, TR, halo, "vmem", method=method, dynamic=dynamic
                )
            ),
            interpret=interpret,
        )(scal, tab, x0hat_b)

    if W % 128 and not interpret:
        # Mosaic DMA slices need lane extent ≡ 0 (mod 128); the streamed
        # windows are full-width, so W itself must be 128-aligned on chip
        raise ValueError(
            f"hbm-streamed tiles need W % 128 == 0 on TPU, got {W}"
        )
    TR = tile_rows if tile_rows is not None else pick_tile_rows(H, W, halo)
    if TR is None or H % TR or TR + 2 * halo > H or H // TR < 2:
        raise ValueError(
            f"no valid tile size for H={H}, W={W}, halo={halo} "
            "(use the monolithic fused kernel instead)"
        )
    TRH = TR + 2 * halo
    # halo-pad the HBM-resident inputs so every window read is full-size
    # at an 8-aligned offset (see _kernel)
    x0_pad = jnp.pad(x0hat_b, ((0, 0), (halo, halo), (0, 0)))

    sol, _ = pl.pallas_call(
        functools.partial(
            _kernel,
            H=H,
            W=W,
            TR=TR,
            halo=halo,
            taps=taps,
            tv_iterations=tv_iterations,
            fgp_unroll=not interpret,
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
            jax.ShapeDtypeStruct((3, H + 2 * halo, W), x0hat_b.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((TRH, W), jnp.float32),
            pltpu.VMEM((TRH, W), jnp.float32),
            pltpu.VMEM((TRH, W), jnp.float32),
            pltpu.VMEM((TRH, W), jnp.float32),
            pltpu.VMEM((TRH, W), jnp.float32),
            pltpu.VMEM((TRH, W), jnp.float32),
            pltpu.VMEM((TRH, W), jnp.float32),
            pltpu.VMEM((H + 2 * halo, W), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_tiled(H, W, TR, halo, "hbm")
        ),
        interpret=interpret,
    )(scal, tab, x0_pad)
    return sol


def check_fista_tv_tiled(solver, early_exit: bool = False):
    """Validate `solver` for the tiled path (FISTA/OptISTA/POGM +
    SeparableConv + 2-D TV, fixed schedule; OptISTA/POGM are VMEM-carry
    only). Raises ValueError naming the first unsupported piece; returns
    (taps, method). Pass ``early_exit=True`` when the solve will run the
    convergence-freeze schedule — it needs the larger dynamic VMEM-carry
    layout, so sizing must account for it HERE or a borderline image
    passes the check and fails at solve time."""
    from ..models.prox import TVRegularization
    from ..models.solvers.fista import FISTA
    from ..models.solvers.optista import OptISTA
    from ..models.solvers.pogm import POGM
    from ..ops.base import NormalOperator
    from ..ops.conv_direct import SeparableConvOperator

    if isinstance(solver, FISTA):
        method = "fista"
    elif isinstance(solver, OptISTA):
        method = "optista"
    elif isinstance(solver, POGM):
        method = "pogm"
    else:
        raise ValueError("tiled path requires FISTA, OptISTA, or POGM")
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
    solver_restart = getattr(solver, "restart", "none")
    if solver_restart not in ("none", "gradient", "gradient_mapping"):
        raise ValueError(
            f"tiled path does not support restart={solver_restart!r}"
        )
    if solver_restart == "gradient_mapping" and method != "fista":
        raise ValueError(
            "gradient_mapping restart is a FISTA mode; use the composed path"
        )
    if solver_restart == "gradient" and method not in ("fista", "pogm"):
        raise ValueError(
            "tiled gradient restart is FISTA/POGM-only (VMEM-carry "
            "reductions); use the monolithic fused kernel"
        )
    if method == "pogm":
        sigma_fac = getattr(solver, "sigma_fac", 1.0)
        if isinstance(sigma_fac, jax.core.Tracer):
            raise ValueError(
                "tiled POGM needs a concrete solver.sigma_fac; close the "
                "solver over jax.jit instead of passing it as a jit argument"
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
    dynamic = solver_restart in ("gradient", "gradient_mapping") or early_exit
    tr_v = pick_tile_rows_vmem(H, W, halo, method=method, dynamic=dynamic)
    tr_h = (
        pick_tile_rows(H, W, halo)
        if method == "fista" and not dynamic
        else None
    )
    if tr_h is not None and (H // tr_h < 2 or tr_h + 2 * halo > H):
        tr_h = None
    if W % 128 and jax.default_backend() != "cpu":
        tr_h = None  # chip DMA lane-alignment (see fista_tv_tiled)
    if tr_v is None and tr_h is None:
        raise ValueError(
            f"no valid tile size for H={H}, W={W}, halo={halo} "
            "(use the monolithic fused kernel instead)"
        )
    if dynamic and tr_v is None:
        raise ValueError(
            f"tiled restart/early-exit needs the VMEM-carry variant, but "
            f"no tile size fits H={H}, W={W}, halo={halo}"
        )
    return taps, method


def solve_fista_tv_tiled(
    solver,
    B_mat,
    interpret: bool | None = None,
    tile_rows: int | None = None,
    mode: str = "auto",
    early_exit: bool = False,
    iter_loop: str = "grid",
):
    """Drop-in fast path for `solve_batched_unrolled(solver, B)` at image
    sizes beyond the monolithic kernel's VMEM ceiling (512², 1024², …).
    Returns the n×K solution matrix like the composed driver.

    ``mode``: "vmem" keeps the solver carries full-image VMEM-resident
    and loops tiles statically in-kernel (DMA-free; mid sizes ~512–768²);
    "hbm" streams halo windows through a rotating HBM triple buffer (no
    size limit; FISTA only); "auto" picks vmem when it fits. OptISTA and
    POGM ride the VMEM-carry (x, y, z) variant.
    ``solver.restart == "gradient"`` (FISTA and POGM) rides the
    VMEM-carry dynamic schedule; with ``early_exit=True`` (concrete
    ``solver.rel_tol > 0``) converged problems freeze in-kernel — the
    `solve_batched` done-masking semantics on the fixed grid, like the
    monolithic kernel's."""
    taps, method = check_fista_tv_tiled(solver, early_exit=early_exit)
    restart = getattr(solver, "restart", "none")
    restart = False if restart == "none" else restart
    rel_tol = None
    if early_exit:
        if method not in ("fista", "pogm"):
            raise ValueError("tiled early_exit is FISTA/POGM-only")
        if solver.rel_tol is None or isinstance(solver.rel_tol, jax.core.Tracer):
            raise ValueError("tiled early_exit needs a concrete solver.rel_tol")
        rel_tol = float(solver.rel_tol)
    sigma_fac = float(getattr(solver, "sigma_fac", 1.0))
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
        mode=mode,
        method=method,
        restart=restart,
        rel_tol=rel_tol,
        sigma_fac=sigma_fac,
        iter_loop=iter_loop,
    )
    return out.reshape(out.shape[0], H * W).T
