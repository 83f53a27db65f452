"""Shared in-kernel building blocks for the fused Pallas solvers.

One home for the pieces that tv_pallas.py, fista_tv_fused.py,
admm_tv_fused.py, and fista_l1_dft_fused.py would otherwise copy:

  * `make_tv_fgp(H, W, dtype)` — the TV-FGP dual loop (roll + iota-mask
    gradients; duals keep an exactly-zero last row/col, re-masked at the
    clamp so the adjoint needs no masks) and its gradient/adjoint ops;
  * `make_gram_normal(lcat, rcat, dtype)` — the bf16 hi/lo-compensated
    Gram sandwich `B_h X B_wᵀ` as two stacked MXU matmuls (and the
    concat-free `make_gram_normal_noconcat` variant);
  * `make_sepconv_normal_stencil(...)` — the same Gram as four zero-padded
    VPU stencil passes for short-tap separable kernels;
  * `make_split_dft` / `make_sense_normal` — the split-real DFT sandwiches
    and the multi-coil SENSE normal op.

All pure jnp/lax + pltpu.roll — Mosaic-lowerable inside any kernel body.
Semantics mirror prox.py:prox_tv_fgp (reference ProxTV.jl:89-125) and
ops/conv_direct.SeparableConvOperator._sandwich.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from jax.experimental.pallas import tpu as pltpu

from ..ops._precise import split3_bf16, split_bf16

__all__ = [
    "make_tv_fgp",
    "make_tv_fgp_fold_multi",
    "make_tv_fgp_stateful",
    "make_tv_fgp_window",
    "make_gram_normal",
    "make_gram_normal_noconcat",
    "make_sepconv_normal_stencil",
    "make_sepconv_stencil_ops",
    "make_sepconv_normal_stencil_window",
    "make_split_dft",
    "make_split_dft3",
    "make_sense_normal",
    "rne_bf16_f32",
    "split_bf16",
]


def make_gram_normal(lcat, rcat, dtype):
    """Compensated `AᴴA u = B_h u B_wᵀ` with pre-stacked [hi hi lo] factors."""

    def normal(u):
        uh, ul = split_bf16(u)
        m = jnp.dot(
            lcat,
            jnp.concatenate([uh, ul, uh], axis=0),
            preferred_element_type=dtype,
        )
        mh, ml = split_bf16(m)
        return jnp.dot(
            jnp.concatenate([mh, ml, mh], axis=1),
            rcat,
            preferred_element_type=dtype,
        )

    return normal


def rne_bf16_f32(v):
    """Round-to-nearest-even to the bf16 grid, staying f32 — by integer
    bit arithmetic, so the XLA/Mosaic simplifiers cannot elide it (a
    convert round-trip would be removed). Matches `convert(v, bf16)`
    bit-exactly for finite inputs."""
    vi = lax.bitcast_convert_type(v, jnp.uint32)
    lsb = (vi >> 16) & jnp.uint32(1)
    rounded = vi + jnp.uint32(0x7FFF) + lsb
    return lax.bitcast_convert_type(rounded & jnp.uint32(0xFFFF0000), jnp.float32)


def make_gram_normal_noconcat(l2, lh, r2, rh, dtype, full4: bool = False):
    """Compensated Gram sandwich WITHOUT the runtime `[xh; xl; xh]` concat
    buffers: `B u ≈ B_hi u_hi + B_lo u_hi + B_hi u_lo` as one stacked-
    OUTPUT matmul `[B_hi; B_lo] @ u_hi` (halves added) plus the correction
    `B_hi @ u_lo`. Both operands of every matmul are exactly
    bf16-representable (truncation split), so the math is identical on
    bf16-rounding MXUs and f32-native backends — same MAC count as
    make_gram_normal, no (3H, W)/(H, 3W) temporaries.

    `l2`/`r2` are the output-stacked [hi; lo] factors, `lh`/`rh` the hi
    factors alone.

    ``full4`` adds the fourth lo·lo cross product per side (the 3-term
    form drops it at ~2⁻¹⁶ relative per multiply — harmless in
    self-correcting prox-gradient iterations, but solvers that INTEGRATE
    matvec error across outer iterations amplify it: SplitBregman's ~256
    chained CG steps missed the 1e-4 parity bar until its DFT got the
    4-term rule in r4, and ADMM's scaled dual u accumulates every CG
    x-error — see docs/tpu.md's 4-term rule). Cost: 4 unit matmuls per
    side instead of 3 (the lo correction rides the already-stacked
    factor, so it is one extra stacked-operand matmul, not two).
    """
    H = lh.shape[0]
    W = rh.shape[1]

    def left(u):
        uh, ul = split_bf16(u)
        m2 = jnp.dot(l2, uh, preferred_element_type=dtype)  # (2H, W)
        if full4:
            c2 = jnp.dot(l2, ul, preferred_element_type=dtype)
            return m2[:H] + m2[H:] + c2[:H] + c2[H:]
        corr = jnp.dot(lh, ul, preferred_element_type=dtype)
        return m2[:H] + m2[H:] + corr

    def right(m):
        mh, ml = split_bf16(m)
        m2 = jnp.dot(mh, r2, preferred_element_type=dtype)  # (H, 2W)
        if full4:
            c2 = jnp.dot(ml, r2, preferred_element_type=dtype)
            return m2[:, :W] + m2[:, W:] + c2[:, :W] + c2[:, W:]
        corr = jnp.dot(ml, rh, preferred_element_type=dtype)
        return m2[:, :W] + m2[:, W:] + corr

    def normal(u):
        return right(left(u))

    return normal


def make_split_dft(lfr, lfi, rfr, rfi, dtype, full4: bool = False):
    """Compensated split-real 2-D DFT sandwiches `(cfwd, cadj)`.

    `lfr/lfi` are the stacked `[hi hi lo]` left factors (H, 3H) of the
    DFT's real/imag parts, `rfr/rfi` the right factors (3W, W) — the
    pre-stacked compensation layout of `ops/dft_real._dft_cat`. Mirrors
    `SubsampledDFT2RealOperator`'s forward/adjoint exactly (semantics of
    reference FFT ops; built split-real for the FFT-less TPU runtime).

    ``full4`` adds the fourth lo·lo cross product (the 3-term form drops
    it at ~2⁻¹⁶ relative per multiply — harmless in self-correcting
    prox-gradient iterations, but long CG/Krylov chains amplify it; see
    cgnr_fused._mm_comp and docs/tpu.md's 4-term rule). Cost: 4 unit
    matmuls per multiply instead of 3.
    """

    H = lfr.shape[0]
    W = rfr.shape[1]
    if jnp.dtype(dtype) == jnp.float64:
        # f64 diagnostic path (interpret mode only): the hi/lo split is
        # f32-specific, so reconstruct the exact f32 factors (hi + lo)
        # and use plain matmuls — used to separate algorithm-semantics
        # deviations from f32 rounding when chasing parity.
        lfac = {"fr": (lfr[:, :H] + lfr[:, 2 * H:]).astype(dtype),
                "fi": (lfi[:, :H] + lfi[:, 2 * H:]).astype(dtype)}
        rfac = {"fr": (rfr[:W] + rfr[2 * W:]).astype(dtype),
                "fi": (rfi[:W] + rfi[2 * W:]).astype(dtype)}

        def cfwd64(ur, ui):
            lr = lfac["fr"] @ ur - lfac["fi"] @ ui
            li = lfac["fr"] @ ui + lfac["fi"] @ ur
            kr = lr @ rfac["fr"] - li @ rfac["fi"]
            ki = lr @ rfac["fi"] + li @ rfac["fr"]
            return kr, ki

        def cadj64(kr, ki):
            lr = lfac["fr"] @ kr + lfac["fi"] @ ki
            li = lfac["fr"] @ ki - lfac["fi"] @ kr
            vr = lr @ rfac["fr"] + li @ rfac["fi"]
            vi = li @ rfac["fr"] - lr @ rfac["fi"]
            return vr, vi

        return cfwd64, cadj64
    # concat-free compensation (see make_gram_normal_noconcat): derive the
    # output-stacked [hi; lo] and hi-only factors once, per DFT component
    lf = {}
    rf = {}
    for key, cat in (("fr", lfr), ("fi", lfi)):
        lf[key] = (
            jnp.concatenate([cat[:, :H], cat[:, 2 * H :]], axis=0),
            cat[:, :H],
        )
    for key, cat in (("fr", rfr), ("fi", rfi)):
        rf[key] = (
            jnp.concatenate([cat[:W], cat[2 * W :]], axis=1),
            cat[:W],
        )

    def lmul(l2_lh, u):
        l2, lh = l2_lh
        uh, ul = split_bf16(u)
        m2 = jnp.dot(l2, uh, preferred_element_type=dtype)
        if full4:
            c2 = jnp.dot(l2, ul, preferred_element_type=dtype)
            return m2[:H] + m2[H:] + c2[:H] + c2[H:]
        corr = jnp.dot(lh, ul, preferred_element_type=dtype)
        return m2[:H] + m2[H:] + corr

    def rmul(u, r2_rh):
        r2, rh = r2_rh
        uh, ul = split_bf16(u)
        m2 = jnp.dot(uh, r2, preferred_element_type=dtype)
        if full4:
            c2 = jnp.dot(ul, r2, preferred_element_type=dtype)
            return m2[:, :W] + m2[:, W:] + c2[:, :W] + c2[:, W:]
        corr = jnp.dot(ul, rh, preferred_element_type=dtype)
        return m2[:, :W] + m2[:, W:] + corr

    lfr, lfi = lf["fr"], lf["fi"]
    rfr, rfi = rf["fr"], rf["fi"]

    def cfwd(ur, ui):
        lr = lmul(lfr, ur) - lmul(lfi, ui)
        li = lmul(lfr, ui) + lmul(lfi, ur)
        kr = rmul(lr, rfr) - rmul(li, rfi)
        ki = rmul(lr, rfi) + rmul(li, rfr)
        return kr, ki

    def cadj(kr, ki):
        lr = lmul(lfr, kr) + lmul(lfi, ki)
        li = lmul(lfr, ki) - lmul(lfi, kr)
        vr = rmul(lr, rfr) + rmul(li, rfi)
        vi = rmul(li, rfr) - rmul(lr, rfi)
        return vr, vi

    return cfwd, cadj


def make_split_dft3(l3fr, l3fi, r3fr, r3fi, dtype):
    """3-way-compensated split-real 2-D DFT sandwiches `(cfwd, cadj)`.

    `l3fr/l3fi` are the `[hi; mid; lo]` output-stacked left factors
    (3H, H) from `ops/_precise.stack3_left`, `r3fr/r3fi` the (W, 3W)
    right factors from `stack3_right`. Six products per multiply —
    hh + hm + mh + mm + hl + lh, dropping ml/lm/ll at ≲2⁻²⁴ — reach
    ~1e-7 relative where the 2-way 4-term form caps at ~2⁻¹⁶ (the lo
    field of a 2-way split holds only 8 of the remaining 16 mantissa
    bits). Every factor operand is exactly bf16-representable, so chip
    MXU math equals CPU f32 math. Cost: 6 unit matmuls per multiply in
    4 issues (two double-output stacks + two singles) vs full4's 4.
    Used by the SplitBregman SENSE kernel, whose Bregman fields
    integrate matvec error across ~256 chained CG steps."""
    H = l3fr.shape[1]
    W = r3fr.shape[0]

    def lmul(l3, u):
        uh, um, ul = split3_bf16(u)
        l2 = l3[: 2 * H]  # [Lh; Lm]
        a = jnp.dot(l2, uh, preferred_element_type=dtype)  # Lh·uh, Lm·uh
        b = jnp.dot(l2, um, preferred_element_type=dtype)  # Lh·um, Lm·um
        c = jnp.dot(l3[:H], ul, preferred_element_type=dtype)  # Lh·ul
        d = jnp.dot(l3[2 * H :], uh, preferred_element_type=dtype)  # Ll·uh
        return a[:H] + a[H:] + b[:H] + b[H:] + c + d

    def rmul(u, r3):
        uh, um, ul = split3_bf16(u)
        r2 = r3[:, : 2 * W]  # [Rh Rm]
        a = jnp.dot(uh, r2, preferred_element_type=dtype)
        b = jnp.dot(um, r2, preferred_element_type=dtype)
        c = jnp.dot(ul, r3[:, :W], preferred_element_type=dtype)
        d = jnp.dot(uh, r3[:, 2 * W :], preferred_element_type=dtype)
        return a[:, :W] + a[:, W:] + b[:, :W] + b[:, W:] + c + d

    def cfwd(ur, ui):
        lr = lmul(l3fr, ur) - lmul(l3fi, ui)
        li = lmul(l3fr, ui) + lmul(l3fi, ur)
        kr = rmul(lr, r3fr) - rmul(li, r3fi)
        ki = rmul(lr, r3fi) + rmul(li, r3fr)
        return kr, ki

    def cadj(kr, ki):
        lr = lmul(l3fr, kr) + lmul(l3fi, ki)
        li = lmul(l3fr, ki) - lmul(l3fi, kr)
        vr = rmul(lr, r3fr) + rmul(li, r3fi)
        vi = rmul(li, r3fr) - rmul(lr, r3fi)
        return vr, vi

    return cfwd, cadj


def make_sense_normal(cfwd, cadj, mask, cr_ref, ci_ref, n_coils: int):
    """Split-real multi-coil SENSE normal op `AᴴA (xr, xi)`.

    Per coil: complex sensitivity multiply, masked DFT sandwich, conjugate
    sensitivity accumulate — `SenseDFT2RealOperator.normal` semantics.
    `cr_ref`/`ci_ref` may be refs or arrays indexable as `[c]`.
    """

    def normal(xr, xi):
        acc_r = xr * 0.0
        acc_i = xr * 0.0
        for c in range(n_coils):  # static coil loop
            crm = cr_ref[c]
            cim = ci_ref[c]
            ur = crm * xr - cim * xi
            ui = crm * xi + cim * xr
            kr, ki = cfwd(ur, ui)
            vr, vi = cadj(kr * mask, ki * mask)
            acc_r = acc_r + crm * vr + cim * vi
            acc_i = acc_i + crm * vi - cim * vr
        return acc_r, acc_i

    return normal


def make_sepconv_stencil_ops(
    taps_h, taps_w, H: int, W: int, dtype, groups: int = 1
):
    """Separable-conv `(fwd, adj, normal)` as zero-padded VPU stencil
    passes — exact f32, no MXU at all.

    The operator is `A u = a_h u a_wᵀ` with banded a (SAME zero-padded
    1-D conv per axis, band layout a[c, c+i−k//2] = taps[i]); `fwd` is
    the col-pass + row-pass pair, `adj` the transposed passes, `normal`
    the four-pass Gram `AᴴA u`. Each pass is realized as `pltpu.roll` +
    inline iota masks (the masks zero the wrapped entries, reproducing
    the zero padding — and the banded matrices' boundary rows —
    exactly). For a k-tap kernel this is ~2k (fwd/adj) or ~4k (normal)
    fused VPU ops/pixel vs the compensated matmuls' MACs/pixel: the MXU
    path wins for dense factors, the stencil wins for short taps.

    ``groups`` stacks G independent problems along the row axis (input
    (G·H, W)): the period-H masks zero cross-problem leakage at every
    shift, so one G×-larger op replaces G small ones — amortizing the
    per-op issue overhead the per-problem kernels are bound by.
    """
    import numpy as np

    th = [float(t) for t in np.asarray(taps_h).ravel()]
    tw = [float(t) for t in np.asarray(taps_w).ravel()]
    GH = groups * H
    row = lax.broadcasted_iota(jnp.int32, (GH, W), 0) % H
    col = lax.broadcasted_iota(jnp.int32, (GH, W), 1)

    def shifted(u, s, axis):
        # out[i] = u[i + s] with zero fill (no wrap-around, no
        # cross-problem leakage: masks use the period-H row index)
        n = GH if axis == 0 else W
        per = H if axis == 0 else W
        idx = row if axis == 0 else col
        if s == 0:
            return u
        r = pltpu.roll(u, (-s) % n, axis)
        if s > 0:
            mask = (idx < per - s).astype(dtype)
        else:
            mask = (idx >= -s).astype(dtype)
        return r * mask

    def _pass(u, taps, axis, adjoint):
        r = len(taps) // 2
        acc = None
        for k, t in enumerate(taps):
            s = k - r
            if adjoint:
                s = -s
            term = t * shifted(u, s, axis)
            acc = term if acc is None else acc + term
        return acc

    def fwd(u):
        return _pass(_pass(u, th, 0, adjoint=False), tw, 1, adjoint=False)

    def adj(u):
        return _pass(_pass(u, th, 0, adjoint=True), tw, 1, adjoint=True)

    def normal(u):
        v = _pass(u, th, 0, adjoint=False)
        v = _pass(v, th, 0, adjoint=True)
        v = _pass(v, tw, 1, adjoint=False)
        v = _pass(v, tw, 1, adjoint=True)
        return v

    return fwd, adj, normal


def make_sepconv_normal_stencil(
    taps_h, taps_w, H: int, W: int, dtype, groups: int = 1
):
    """Gram-only view of `make_sepconv_stencil_ops` (see there)."""
    return make_sepconv_stencil_ops(taps_h, taps_w, H, W, dtype, groups)[2]


def make_sepconv_normal_stencil_window(
    taps_h, taps_w, H: int, W: int, n_rows: int, row0, dtype
):
    """Window variant of `make_sepconv_normal_stencil` for row-tiled
    kernels: operates on an (n_rows, W) scratch window whose row j holds
    GLOBAL image row ``row0 + j`` (row0 may be a traced scalar, negative
    for the top tile's halo). The zero-padding masks use global row
    indices, so image boundaries land exactly; rows outside the image and
    the window's wraparound edges produce garbage only within the
    dependence cone of the window edge — callers must keep a halo ≥ the
    total cone (2·(k_h//2) per column pass pair + the consumer's cone).
    """
    import numpy as np

    th = [float(t) for t in np.asarray(taps_h).ravel()]
    tw = [float(t) for t in np.asarray(taps_w).ravel()]
    g = lax.broadcasted_iota(jnp.int32, (n_rows, W), 0) + row0
    col = lax.broadcasted_iota(jnp.int32, (n_rows, W), 1)

    def shifted(u, s, axis):
        if s == 0:
            return u
        if axis == 0:
            r = pltpu.roll(u, (-s) % n_rows, 0)
            mask = ((g + s >= 0) & (g + s < H)).astype(dtype)
        else:
            r = pltpu.roll(u, (-s) % W, 1)
            mask = ((col + s >= 0) & (col + s < W)).astype(dtype)
        return r * mask

    def _pass(u, taps, axis, adjoint):
        r = len(taps) // 2
        acc = None
        for k, t in enumerate(taps):
            s = k - r
            if adjoint:
                s = -s
            term = t * shifted(u, s, axis)
            acc = term if acc is None else acc + term
        return acc

    def normal(u):
        v = _pass(u, th, 0, adjoint=False)
        v = _pass(v, th, 0, adjoint=True)
        v = _pass(v, tw, 1, adjoint=False)
        v = _pass(v, tw, 1, adjoint=True)
        return v

    return normal


def make_tv_fgp_window(H: int, W: int, n_rows: int, row0, dtype,
                       unroll: bool = False, store=None,
                       opt: str | None = None):
    """Window variant of `make_tv_fgp` for row-tiled kernels (see
    `make_sepconv_normal_stencil_window` for the window convention).

    The dual clamp re-zeroes every INVALID global row each iteration —
    rows outside the image stay exactly zero, so the image-row dual
    dynamics equal the full-image kernel's within the dependence cone
    (±1 dual row per FGP iteration + 1 for the final adjoint ⇒ cone =
    iterations + 1)."""
    g = lax.broadcasted_iota(jnp.int32, (n_rows, W), 0) + row0
    col = lax.broadcasted_iota(jnp.int32, (n_rows, W), 1)
    vmask = ((g >= 0) & (g < H - 1)).astype(dtype)
    hmask = (((g >= 0) & (g < H)) & (col < W - 1)).astype(dtype)
    # gt's vertical roll brings the dual row ABOVE; at global row 0 that
    # row does not exist and the wrap would deliver the window's LAST row
    # — an unmasked interior dual when the window starts at the image top
    # (the full-image kernel gets an exact zero there because its last
    # dual row is masked). Mask the wrapped term at g == 0 explicitly.
    has_above = (g > 0).astype(dtype)

    def gv(u):
        return roll_any(u, n_rows - 1, 0) - u

    def gh(u):
        return roll_any(u, W - 1, 1) - u

    def gt(pv, ph):
        tv = roll_any(pv, 1, 0) * has_above - pv
        th = roll_any(ph, 1, 1) - ph
        return tv + th

    dn, up = _dual_casts(dtype, store)
    zeros = jnp.zeros((n_rows, W), store if store is not None else dtype)

    def fgp(xg, lam_tv, iterations: int):
        lam_safe = jnp.where(lam_tv > 0, lam_tv, 1.0)
        inv8 = 1.0 / (8.0 * lam_safe)

        def body(_, carry):
            pv, ph, rv, rh, t = carry
            xtmp = xg - lam_tv * up(gt(rv, rh))
            qv = up(rv) + gv(xtmp) * inv8
            qh = up(rh) + gh(xtmp) * inv8
            qv = jnp.clip(qv, -1.0, 1.0) * vmask
            qh = jnp.clip(qh, -1.0, 1.0) * hmask
            t_new = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) / 2.0
            t2 = (t - 1.0) / t_new
            rv_new = dn((1.0 + t2) * qv - t2 * up(pv))
            rh_new = dn((1.0 + t2) * qh - t2 * up(ph))
            return (dn(qv), dn(qh), rv_new, rh_new, t_new)

        pv, ph, _, _, _ = lax.fori_loop(
            0,
            iterations,
            body,
            (zeros, zeros, zeros, zeros, jnp.asarray(1.0, dtype)),
        )
        return xg - lam_tv * up(gt(pv, ph))

    def fgp_unrolled(xg, lam_tv, iterations: int):
        """Statically-unrolled λ-scaled window FGP — the tiled twin of
        `_fgp_unrolled_scaled` (duals carry P = λ·p, momentum t2 baked,
        iteration 0 collapses to one gradient+clip): identical math up
        to f32 rounding, ~20% fewer VPU ops, measured +17% on the
        monolithic kernel (ab_fgp r4)."""
        if iterations == 0:
            return xg
        pv = dn(jnp.clip(gv(xg) * 0.125, -lam_tv, lam_tv) * vmask)
        ph = dn(jnp.clip(gh(xg) * 0.125, -lam_tv, lam_tv) * hmask)
        rv, rh = pv, ph
        t2s = _fgp_t2_schedule(iterations)
        for i in range(1, iterations):
            xtmp = xg - up(gt(rv, rh))
            qv = jnp.clip(up(rv) + gv(xtmp) * 0.125, -lam_tv, lam_tv) * vmask
            qh = jnp.clip(up(rh) + gh(xtmp) * 0.125, -lam_tv, lam_tv) * hmask
            t2 = t2s[i]
            rv = dn((1.0 + t2) * qv - t2 * up(pv))
            rh = dn((1.0 + t2) * qh - t2 * up(ph))
            pv, ph = dn(qv), dn(qh)
        return xg - up(gt(pv, ph))

    if opt is not None:
        # issue-count-reduced unrolled variants, same strict-f32 math
        # as fgp_unrolled (see _fgp_unrolled_fold/_fgp_unrolled_packed)
        if opt not in ("fold", "pack"):
            raise ValueError(f"unknown fgp opt {opt!r}")
        if not unroll or store is not None:
            raise ValueError("opt variants require unroll=True, f32 duals")
        if opt == "fold":

            def fgp_win_fold(xg, lam_tv, iterations: int):
                bv = lam_tv * vmask
                bh = lam_tv * hmask
                if iterations == 0:
                    return xg
                y = xg * 0.125
                pv = jnp.clip(gv(y), -bv, bv)
                ph = jnp.clip(gh(y), -bh, bh)
                rv, rh = pv, ph
                t2s = _fgp_t2_schedule(iterations)
                for i in range(1, iterations):
                    y = (xg - gt(rv, rh)) * 0.125
                    qv = jnp.clip(rv + gv(y), -bv, bv)
                    qh = jnp.clip(rh + gh(y), -bh, bh)
                    t2 = t2s[i]
                    rv = (1.0 + t2) * qv - t2 * pv
                    rh = (1.0 + t2) * qh - t2 * ph
                    pv, ph = qv, qh
                return xg - gt(pv, ph)

            return gt, fgp_win_fold

        maskcat = jnp.concatenate([vmask, hmask], axis=0)

        def fgp_win_pack(xg, lam_tv, iterations: int):
            lam2 = (
                jnp.concatenate([lam_tv, lam_tv], axis=0)
                if getattr(lam_tv, "ndim", 0) == 2
                else lam_tv
            )
            bounds = lam2 * maskcat
            if iterations == 0:
                return xg
            y = xg * 0.125
            P = jnp.clip(
                jnp.concatenate([gv(y), gh(y)], axis=0), -bounds, bounds
            )
            R = P
            t2s = _fgp_t2_schedule(iterations)
            for i in range(1, iterations):
                rv = lax.slice_in_dim(R, 0, n_rows, axis=0)
                rh = lax.slice_in_dim(R, n_rows, 2 * n_rows, axis=0)
                y = (xg - gt(rv, rh)) * 0.125
                Q = jnp.clip(
                    R + jnp.concatenate([gv(y), gh(y)], axis=0),
                    -bounds, bounds,
                )
                t2 = t2s[i]
                R = (1.0 + t2) * Q - t2 * P
                P = Q
            pv = lax.slice_in_dim(P, 0, n_rows, axis=0)
            ph = lax.slice_in_dim(P, n_rows, 2 * n_rows, axis=0)
            return xg - gt(pv, ph)

        return gt, fgp_win_pack

    return gt, (fgp_unrolled if unroll else fgp)


def roll_any(u, shift: int, axis: int):
    """`pltpu.roll` for 32-bit dtypes; concat-of-slices for 16-bit ones.

    Mosaic's `tpu.dynamic_rotate` is "not implemented: Rotate with
    non-32-bit data" (probed on chip, r5), so bf16-stored dual fields
    cannot ride `pltpu.roll`. A static roll is exactly
    `concat([u[shift:], u[:shift]])`, which Mosaic lowers for 16-bit
    types via relayout shifts. `shift` must be a Python int."""
    if jnp.dtype(u.dtype).itemsize == 4:
        return pltpu.roll(u, shift, axis)
    n = u.shape[axis]
    shift = shift % n
    if shift == 0:
        return u
    # pltpu.roll convention: out[i] = u[(i - shift) mod n]
    tail = lax.slice_in_dim(u, n - shift, n, axis=axis)
    head = lax.slice_in_dim(u, 0, n - shift, axis=axis)
    return lax.concatenate([tail, head], dimension=axis)


def _dual_casts(f32, store):
    """(downcast, upcast) pair for dual-field STORAGE dtype ``store``.

    ``store=None`` keeps everything in the compute dtype (identity).
    ``store=bf16`` halves the VMEM bytes of every dual-field read/write —
    the r4 roofline ablation (tools/roofline_ablate.py) attributed the
    flagship bound to per-iteration dual/plane VMEM traffic, and the dual
    fields account for ~3/4 of the FGP loop's plane touches. Arithmetic
    stays f32 (upcast at use); only what crosses an iteration boundary is
    rounded, so the added error is ≤ 2⁻⁹ of the clamp bound λ per field —
    an inexact-prox perturbation the outer PGM iteration absorbs (A/B'd
    on chip for speed AND parity before becoming a default)."""
    if store is None:
        ident = lambda v: v  # noqa: E731
        return ident, ident
    return (lambda v: v.astype(store)), (lambda v: v.astype(f32))


def _fgp_t2_schedule(iterations: int):
    """The FGP momentum coefficients t2_i = (t_i - 1)/t_{i+1} as Python
    floats (f64 recurrence). Data-independent, so unrolled kernels bake
    them as constants instead of carrying the θ recurrence on-device."""
    import math

    t = 1.0
    out = []
    for _ in range(iterations):
        t_new = (1.0 + math.sqrt(1.0 + 4.0 * t * t)) / 2.0
        out.append((t - 1.0) / t_new)
        t = t_new
    return out


def _fgp_grid(H: int, W: int, dtype, groups: int):
    """Shared FGP machinery: per-problem boundary masks (period-H row
    index under ``groups`` stacking) and the gradient/adjoint stencils.
    One home for what `make_tv_fgp` and `make_tv_fgp_stateful` build."""
    GH = groups * H
    row = lax.broadcasted_iota(jnp.int32, (GH, W), 0) % H
    col = lax.broadcasted_iota(jnp.int32, (GH, W), 1)
    not_last_row = (row < H - 1).astype(dtype)
    not_last_col = (col < W - 1).astype(dtype)

    def gv(u):
        return roll_any(u, GH - 1, 0) - u

    def gh(u):
        return roll_any(u, W - 1, 1) - u

    def gt(pv, ph):
        tv = roll_any(pv, 1, 0) - pv
        th = roll_any(ph, 1, 1) - ph
        return tv + th

    # pre-rolled recombination (see _fgp_unrolled_scaled prerolls)
    def rollv(u):
        return roll_any(u, 1, 0)

    def rollh(u):
        return roll_any(u, 1, 1)

    def gt2(sv, v, sh, h):
        return sv - v + sh - h

    return GH, not_last_row, not_last_col, gv, gh, gt, (rollv, rollh, gt2)


def _fgp_unrolled_scaled(
    xg, lam_tv, iterations, duals, gv, gh, gt, not_last_row, not_last_col,
    store=None, prerolls=None,
):
    """Statically-unrolled λ-scaled FGP dual loop (duals carry P = λ·p,
    momentum t2 baked as constants). ``duals=None`` is the cold start —
    iteration 0 (all duals zero) collapses to a single gradient+clip, the
    λ = 0 clamp pins the duals to exactly zero so the prox degenerates to
    the identity. ``store`` sets the dual-field STORAGE dtype (see
    `_dual_casts`); arithmetic stays in xg's dtype. Returns
    ``(x, (pv, ph))`` with the duals in the storage dtype.

    ``prerolls=(rollv, rollh, gt2)`` switches a 16-bit store to the
    PRE-ROLLED scheme: Mosaic's rotate is 32-bit-only and the
    concat-of-slices roll on packed bf16 costs the relayout what the
    bandwidth saves (chip A/B r5: 440.9 vs 451.5 p/s median), so instead
    the momentum field's +1-shifted copies are produced by f32
    `pltpu.roll` at the moment the field is computed and stored in bf16
    alongside it — the 16-bit fields are then only ever read
    elementwise. gt2 recombines them: ``gt(rv, rh) ==
    gt2(roll(rv), rv, roll(rh), rh)`` (rounding commutes with the
    permutation, so rolling before the downcast is exact)."""
    dn, up = _dual_casts(xg.dtype, store)
    pre = prerolls is not None and store is not None
    if pre:
        rollv, rollh, gt2 = prerolls
    if duals is None:
        if iterations == 0:
            z = dn(xg * 0.0)
            return xg, (z, z)
        pv_f = jnp.clip(gv(xg) * 0.125, -lam_tv, lam_tv) * not_last_row
        ph_f = jnp.clip(gh(xg) * 0.125, -lam_tv, lam_tv) * not_last_col
        pv, ph = dn(pv_f), dn(ph_f)
        if pre:
            srv, srh = dn(rollv(pv_f)), dn(rollh(ph_f))
        start = 1
    else:
        pv, ph = duals
        if pre:
            srv, srh = dn(rollv(up(pv))), dn(rollh(up(ph)))
        start = 0
    rv, rh = pv, ph  # momentum restart: r ← p, t ← 1
    t2s = _fgp_t2_schedule(iterations)
    for i in range(start, iterations):
        if pre:
            xtmp = xg - gt2(up(srv), up(rv), up(srh), up(rh))
        else:
            xtmp = xg - up(gt(rv, rh))
        qv_f = jnp.clip(up(rv) + gv(xtmp) * 0.125, -lam_tv, lam_tv) * not_last_row
        qh_f = jnp.clip(up(rh) + gh(xtmp) * 0.125, -lam_tv, lam_tv) * not_last_col
        t2 = t2s[i]  # t2s[0] = 0 ⇒ iteration 0 is the plain step
        rv_f = (1.0 + t2) * qv_f - t2 * up(pv)
        rh_f = (1.0 + t2) * qh_f - t2 * up(ph)
        if pre:
            srv, srh = dn(rollv(rv_f)), dn(rollh(rh_f))
        rv, rh = dn(rv_f), dn(rh_f)
        pv, ph = dn(qv_f), dn(qh_f)
    if pre:
        # final adjoint: one-time upcast, f32 rolls
        return xg - gt(up(pv), up(ph)), (pv, ph)
    return xg - up(gt(pv, ph)), (pv, ph)


def _fgp_unrolled_fold(
    xg, lam_tv, iterations, gv, gh, gt, not_last_row, not_last_col,
):
    """`_fgp_unrolled_scaled` with two issue-count reductions, both
    identical to it in strict f32 semantics — platform FMA contraction
    may round `r + g·⅛` once in one form and twice in the other
    (≤1-ulp, data-dependent; the chip A/B measured rel 0.0) — (r5
    roofline: the bound is per-op issue/dependency latency, so fewer
    VPU ops at equal math is the remaining lever):

      * the boundary mask is folded into the clamp as per-element clip
        BOUNDS ``±λ·mask`` (computed once per call) — ``clip(q, -0, 0)``
        pins masked rows to ±0 exactly like ``clip(q, -λ, λ)·0`` did,
        and unmasked rows see the identical ±λ bound, so the post-clip
        mask multiply (2 ops/iteration) disappears;
      * the ×0.125 gradient scale is applied ONCE to the shared plane
        (``y = xtmp·0.125``) instead of once per direction — scaling by
        a power of two is exact in f32, so ``(roll(x)−x)·⅛ ≡
        roll(x·⅛)−x·⅛`` bit-for-bit (1 op/iteration saved).

    26 → 23 VPU plane ops per dual iteration; measured on chip via
    tools/ab_flagship.py before any default change."""
    bv = lam_tv * not_last_row
    bh = lam_tv * not_last_col
    if iterations == 0:
        z = xg * 0.0
        return xg, (z, z)
    y = xg * 0.125
    pv = jnp.clip(gv(y), -bv, bv)
    ph = jnp.clip(gh(y), -bh, bh)
    rv, rh = pv, ph
    t2s = _fgp_t2_schedule(iterations)
    for i in range(1, iterations):
        y = (xg - gt(rv, rh)) * 0.125
        qv = jnp.clip(rv + gv(y), -bv, bv)
        qh = jnp.clip(rh + gh(y), -bh, bh)
        t2 = t2s[i]
        rv = (1.0 + t2) * qv - t2 * pv
        rh = (1.0 + t2) * qh - t2 * ph
        pv, ph = qv, qh
    return xg - gt(pv, ph), (pv, ph)


def _fgp_unrolled_packed(
    xg, lam_tv, iterations, gv, gh, gt, maskcat, GH,
):
    """`_fgp_unrolled_scaled` with the dual fields PACKED along sublanes
    as one (2·GH, W) plane ``[v; h]`` — clamp, gradient step, and
    momentum each issue as ONE double-size VPU op instead of two, so the
    per-iteration issue count drops 26 → ~18 at the cost of one
    double-size concat (the packed gradient). Same math: the per-half
    op sequence (sub, ×⅛ exact, add, clamp with ±λ·mask bounds,
    momentum) matches `_fgp_unrolled_fold` element-for-element; only
    the issue grouping changes (same FMA-contraction caveat). Targets the r5 roofline attribution
    (per-op issue/dependency latency, not VMEM bytes)."""
    # grouped kernels pass λ as a (GH, W) per-problem plane — duplicate
    # it along the packing axis once per call
    lam2 = (
        jnp.concatenate([lam_tv, lam_tv], axis=0)
        if getattr(lam_tv, "ndim", 0) == 2
        else lam_tv
    )
    bounds = lam2 * maskcat  # (2GH, W): [λ·vmask; λ·hmask]
    if iterations == 0:
        z = xg * 0.0
        return xg, (z, z)
    y = xg * 0.125
    P = jnp.clip(
        jnp.concatenate([gv(y), gh(y)], axis=0), -bounds, bounds
    )
    R = P
    t2s = _fgp_t2_schedule(iterations)
    for i in range(1, iterations):
        rv = lax.slice_in_dim(R, 0, GH, axis=0)
        rh = lax.slice_in_dim(R, GH, 2 * GH, axis=0)
        y = (xg - gt(rv, rh)) * 0.125
        Q = jnp.clip(
            R + jnp.concatenate([gv(y), gh(y)], axis=0), -bounds, bounds
        )
        t2 = t2s[i]
        R = (1.0 + t2) * Q - t2 * P
        P = Q
    pv = lax.slice_in_dim(P, 0, GH, axis=0)
    ph = lax.slice_in_dim(P, GH, 2 * GH, axis=0)
    return xg - gt(pv, ph), (pv, ph)


def make_tv_fgp_fold_multi(H: int, W: int, dtype):
    """G-problem INTERLEAVED fold-FGP: ``fgp(xgs, lam_tvs, iterations)``
    over tuples of (H, W) planes, one per independent problem.

    Each problem's math is exactly `_fgp_unrolled_fold` (same op
    sequence, same strict-f32 semantics); what changes is PROGRAM ORDER:
    every dual-iteration line is emitted for all G problems before the
    next line, so the kernel body presents G independent dependency
    chains side by side. The r5 roofline attribution (docs/tpu.md) says
    roughly half the per-op cost of the flagship's dual loop is
    issue/dependency latency; plane-stacking (``groups``/``pack``)
    cannot recover it because Mosaic issues per (8, 128) vreg either
    way — but independent adjacent ops let the static VLIW scheduler
    fill one chain's stalls with another chain's work. Unlike
    ``groups`` stacking, per-problem λ/ρ stay true SMEM scalars (no
    iota select ladder, no λ planes).
    """
    _, not_last_row, not_last_col, gv, gh, gt, _ = _fgp_grid(H, W, dtype, 1)

    def fgp_multi(xgs, lam_tvs, iterations: int):
        G = len(xgs)
        assert len(lam_tvs) == G
        bvs = tuple(l * not_last_row for l in lam_tvs)
        bhs = tuple(l * not_last_col for l in lam_tvs)
        if iterations == 0:
            return tuple(xgs)
        ys = tuple(x * 0.125 for x in xgs)
        pvs = tuple(jnp.clip(gv(y), -bv, bv) for y, bv in zip(ys, bvs))
        phs = tuple(jnp.clip(gh(y), -bh, bh) for y, bh in zip(ys, bhs))
        rvs, rhs = pvs, phs
        t2s = _fgp_t2_schedule(iterations)
        for i in range(1, iterations):
            ys = tuple(
                (x - gt(rv, rh)) * 0.125
                for x, rv, rh in zip(xgs, rvs, rhs)
            )
            qvs = tuple(
                jnp.clip(rv + gv(y), -bv, bv)
                for rv, y, bv in zip(rvs, ys, bvs)
            )
            qhs = tuple(
                jnp.clip(rh + gh(y), -bh, bh)
                for rh, y, bh in zip(rhs, ys, bhs)
            )
            t2 = t2s[i]
            rvs = tuple((1.0 + t2) * qv - t2 * pv for qv, pv in zip(qvs, pvs))
            rhs = tuple((1.0 + t2) * qh - t2 * ph for qh, ph in zip(qhs, phs))
            pvs, phs = qvs, qhs
        return tuple(
            x - gt(pv, ph) for x, pv, ph in zip(xgs, pvs, phs)
        )

    return fgp_multi


def make_tv_fgp(H: int, W: int, dtype, groups: int = 1, unroll: bool = False,
                store=None, opt: str | None = None):
    """Returns `(gt, fgp)`:

    `fgp(xg, lam_tv, iterations)` — the FGP dual loop solving the TV prox
    at `xg` with strength `lam_tv`; `gt(pv, ph)` — the dual-to-primal
    adjoint (negative divergence), exposed for callers that apply a final
    correction themselves.

    The dual fields keep an exactly-zero last row/col (the clamp re-masks
    them every iteration), so the roll wrap-around brings zeros and gt
    needs no masks — 4 fewer VPU mask-multiplies per iteration than the
    naive masked form.

    ``groups`` stacks G independent problems along the row axis (fields
    are (G·H, W)); the dual clamp re-zeroes every per-problem boundary
    row (period-H mask), so rolls across a boundary carry exactly zero —
    the same argument as the single-problem last row.

    ``unroll=True`` switches to a statically-unrolled λ-scaled dual loop:
    the momentum scalars become baked constants (no in-loop θ
    recurrence/sqrt/divide), the duals carry P = λ·p so the λ multiply
    disappears from every `gt` application, and iteration 0 (all duals
    zero) collapses to a single gradient+clip. Identical math up to f32
    rounding; ~20% fewer VPU ops per dual iteration.

    ``store`` sets the dual-field storage dtype (see `_dual_casts`);
    bf16 halves dual VMEM traffic at a ≤2⁻⁹·λ inexact-prox perturbation.

    ``opt`` selects an issue-count-reduced unrolled variant (identical
    to the plain unrolled loop in strict f32 semantics, ≤1-ulp under
    platform FMA contraction; requires ``unroll=True`` and f32 duals): ``"fold"`` folds the boundary mask into the clamp
    bounds and shares the exact ×⅛ gradient scale;``"pack"``
    additionally stacks the two dual planes along sublanes so clamp /
    gradient / momentum each issue as one double-size VPU op.
    """
    GH, not_last_row, not_last_col, gv, gh, gt, prerolls = _fgp_grid(
        H, W, dtype, groups
    )
    if opt is not None:
        if opt not in ("fold", "pack"):
            raise ValueError(f"unknown fgp opt {opt!r}")
        if not unroll or store is not None:
            raise ValueError("opt variants require unroll=True, f32 duals")
        if opt == "pack":
            maskcat = jnp.concatenate([not_last_row, not_last_col], axis=0)

            def fgp_packed(xg, lam_tv, iterations: int):
                return _fgp_unrolled_packed(
                    xg, lam_tv, iterations, gv, gh, gt, maskcat, GH
                )[0]

            return gt, fgp_packed

        def fgp_folded(xg, lam_tv, iterations: int):
            return _fgp_unrolled_fold(
                xg, lam_tv, iterations, gv, gh, gt,
                not_last_row, not_last_col,
            )[0]

        return gt, fgp_folded
    dn, up = _dual_casts(dtype, store)
    zeros = jnp.zeros((GH, W), store if store is not None else dtype)

    def fgp_loop(xg, lam_tv, iterations: int):
        lam_safe = jnp.where(lam_tv > 0, lam_tv, 1.0)
        inv8 = 1.0 / (8.0 * lam_safe)

        def body(_, carry):
            pv, ph, rv, rh, t = carry
            xtmp = xg - lam_tv * up(gt(rv, rh))
            qv = up(rv) + gv(xtmp) * inv8
            qh = up(rh) + gh(xtmp) * inv8
            # q/max(1,|q|) on real scalars IS clip(q, -1, 1) — saves the
            # multi-cycle VPU divide in the hottest loop of the bench
            qv = jnp.clip(qv, -1.0, 1.0) * not_last_row
            qh = jnp.clip(qh, -1.0, 1.0) * not_last_col
            t_new = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) / 2.0
            t2 = (t - 1.0) / t_new
            rv_new = dn((1.0 + t2) * qv - t2 * up(pv))
            rh_new = dn((1.0 + t2) * qh - t2 * up(ph))
            return (dn(qv), dn(qh), rv_new, rh_new, t_new)

        pv, ph, _, _, _ = lax.fori_loop(
            0,
            iterations,
            body,
            (zeros, zeros, zeros, zeros, jnp.asarray(1.0, dtype)),
        )
        return xg - lam_tv * up(gt(pv, ph))

    def fgp_unrolled(xg, lam_tv, iterations: int):
        # λ-scaled duals: P = λ·p ⇒ xtmp = xg − gt(R), clamp at ±λ (the
        # division 1/(8λ) disappears entirely); cold start = duals None
        return _fgp_unrolled_scaled(
            xg, lam_tv, iterations, None,
            gv, gh, gt, not_last_row, not_last_col, store=store,
            prerolls=prerolls,
        )[0]

    return gt, (fgp_unrolled if unroll else fgp_loop)


def make_tv_fgp_stateful(
    H: int, W: int, dtype, groups: int = 1, unroll: bool = False,
    store=None,
):
    """`make_tv_fgp` variant whose FGP loop takes and returns its dual
    fields: ``fgp(xg, lam_tv, iterations, (pv, ph)) -> (x, (pv, ph))``.

    Carrying the duals across a solver's outer iterations WARM-STARTS the
    prox: successive TV subproblems differ only by one gradient step of
    the iterate, so the previous optimal duals are a near-optimal start
    and far fewer inner iterations reach the same prox accuracy. The FGP
    momentum restarts every call (r ← p, t ← 1) — plain FISTA momentum carried
    across different subproblems diverges.

    The duals are λ-scaled (P = λ·p, like the unrolled cold loop), which
    keeps the carry consistent across calls as long as ``lam_tv`` is the
    SAME every call — true for FISTA's fixed ρλ, NOT for OptISTA/POGM's
    per-iteration γλ (callers must gate on that). The zero init
    (= cold FGP) is the all-zeros pair; clamping re-masks the boundary
    rows every iteration, so stale duals can never leak outside the
    feasible set.
    """
    GH, not_last_row, not_last_col, gv, gh, gt, prerolls = _fgp_grid(
        H, W, dtype, groups
    )
    dn, up = _dual_casts(dtype, store)

    def fgp_unrolled(xg, lam_tv, iterations: int, duals):
        return _fgp_unrolled_scaled(
            xg, lam_tv, iterations, duals,
            gv, gh, gt, not_last_row, not_last_col, store=store,
            prerolls=prerolls,
        )

    def fgp_loop(xg, lam_tv, iterations: int, duals):
        pv0, ph0 = duals

        def body(_, carry):
            pv, ph, rv, rh, t = carry
            xtmp = xg - up(gt(rv, rh))
            qv = jnp.clip(up(rv) + gv(xtmp) * 0.125, -lam_tv, lam_tv) * not_last_row
            qh = jnp.clip(up(rh) + gh(xtmp) * 0.125, -lam_tv, lam_tv) * not_last_col
            t_new = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) / 2.0
            t2 = (t - 1.0) / t_new
            rv_new = dn((1.0 + t2) * qv - t2 * up(pv))
            rh_new = dn((1.0 + t2) * qh - t2 * up(ph))
            return (dn(qv), dn(qh), rv_new, rh_new, t_new)

        pv, ph, _, _, _ = lax.fori_loop(
            0,
            iterations,
            body,
            (pv0, ph0, pv0, ph0, jnp.asarray(1.0, dtype)),
        )
        return xg - up(gt(pv, ph)), (pv, ph)

    return gt, (fgp_unrolled if unroll else fgp_loop)
