"""Fully-fused FISTA-TV solve as ONE Pallas TPU kernel.

The flagship configuration (BASELINE.json north star: batched FISTA with a
TV prox on a 256² image-recon operator) spends its life in three places:
the AᴴA normal-op matvec, the TV-FGP dual loop, and the FISTA momentum
elementwise chain. Composed from XLA + pallas_call pieces, every iteration
round-trips x / x_old / x0hat and the TV duals through HBM and crosses an
XLA↔Mosaic boundary twice.

This kernel runs the ENTIRE solve — all FISTA iterations, each containing
the MXU normal-op sandwich and the full FGP dual loop — for one problem per
grid step, with every live array VMEM-resident. HBM traffic is one read of
AᴴB and the banded Gram factors plus one write of the solution.

Requirements (checked by the `solve_fista_tv_fused` wrapper):
  * operator: `SeparableConvOperator` (banded Gram factors, f32)
  * regularizer: 2-D `TVRegularization` over both axes
  * restart: "none" (any method, f64 momentum table) or "gradient"
    (FISTA: in-kernel θ recurrence + one restart dot per iteration,
    reference FISTA.jl:171-176; POGM: in-kernel θ/σ/γ recurrences + the
    w-plane restart criterion, reference POGM.jl:189-232)
  * fixed grid; convergence-based early exit (FISTA.jl:187-189 /
    solve_batched done-masking) available as a per-problem freeze mask
    via ``early_exit=True`` — converged problems pass through untouched
Semantics mirror FISTA.step (fista.py) + prox_tv_fgp (prox.py), which in
turn mirror /root/reference/src/FISTA.jl:139-185 and
/root/reference/src/proximalMaps/ProxTV.jl:89-125.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fista_tv_fused", "solve_fista_tv_fused", "solve_pgm_tv_fused"]


def _momentum_table(method: str, iterations: int, theta0: float = 1.0):
    """Per-iteration momentum scalars for the proximal-gradient family.

    Every inertial coefficient of FISTA / OptISTA / POGM(no-restart)
    depends only on the iteration index (and is ρ-independent — ρ factors
    are applied inside the kernel against the per-problem SMEM ρ), so the
    whole schedule is precomputed host-side in f64 and shipped as one
    (iterations, 4) SMEM table:

      col 0: α  (inertia)         col 1: β  (secondary inertia)
      col 2: γ  (grad/prox scale multiplier on ρ; 1 for FISTA/POGM-grad)
      col 3: extra — 1/γ (OptISTA z-step) | ρα/γ_old /ρ (POGM coupling)

    Semantics mirror fista.py / optista.py (OptISTA.jl:145-176) /
    pogm.py (POGM.jl:189-213) exactly, including OptISTA's
    final-iteration √(1+8θ²) variant.
    """
    import numpy as np

    tab = np.zeros((iterations, 4), np.float64)
    if method == "fista":
        th_old = th = float(theta0)
        for i in range(iterations):
            tab[i, 0] = (th_old - 1.0) / th
            tab[i, 2] = 1.0
            th_old, th = th, (1.0 + np.sqrt(1.0 + 4.0 * th * th)) / 2.0
    elif method == "optista":
        # θ_N: N-1 standard steps then the 8θ² variant (OptISTA.jl:145-149)
        tn = float(theta0)
        for _ in range(iterations - 1):
            tn = (1.0 + np.sqrt(1.0 + 4.0 * tn * tn)) / 2.0
        tn = (1.0 + np.sqrt(1.0 + 8.0 * tn * tn)) / 2.0
        th = float(theta0)
        for i in range(iterations):
            gamma = 2.0 * th / tn**2 * (tn**2 - 2.0 * th**2 + th)
            th_old = th
            if i == iterations - 1:
                th = (1.0 + np.sqrt(1.0 + 8.0 * th_old**2)) / 2.0
            else:
                th = (1.0 + np.sqrt(1.0 + 4.0 * th_old**2)) / 2.0
            tab[i, 0] = (th_old - 1.0) / th
            tab[i, 1] = th_old / th
            tab[i, 2] = gamma
            tab[i, 3] = 1.0 / gamma
    elif method == "pogm":
        th = float(theta0)
        gamma_over_rho_old = None  # γ₋₁ = 1 is ρ-dependent, but α₀ = 0
        for i in range(iterations):
            th_old = th
            th = (1.0 + np.sqrt(1.0 + 4.0 * th_old**2)) / 2.0
            alpha = (th_old - 1.0) / th
            beta = th_old / th  # σ = 1 without restart
            gamma_over_rho = (2.0 * th_old + th - 1.0) / th
            tab[i, 0] = alpha
            tab[i, 1] = beta
            tab[i, 2] = gamma_over_rho  # prox scale multiplier on ρ
            tab[i, 3] = 0.0 if gamma_over_rho_old is None else alpha / gamma_over_rho_old
            gamma_over_rho_old = gamma_over_rho
    else:
        raise ValueError(f"unknown method {method!r}")
    return tab.astype(np.float32)


from ._fgp_common import (  # noqa: E402
    make_gram_normal,
    make_gram_normal_noconcat,
    make_sepconv_normal_stencil,
    make_tv_fgp,
    make_tv_fgp_fold_multi,
    make_tv_fgp_stateful,
)


def _kernel(
    scal_ref,  # SMEM (B, 2): per-problem [rho, lam_eff]
    tab_ref,  # SMEM (iterations, 4): momentum schedule (_momentum_table)
    lcat_ref,  # VMEM (H, 3H): [Bh_hi Bh_hi Bh_lo]
    rcat_ref,  # VMEM (3W, W): [Bw_hi; Bw_hi; Bw_lo] (right factor, pre-T)
    x0_ref,  # VMEM (1, H, W): AᴴB for this problem
    out_ref,  # VMEM (1, H, W)
    *,
    iterations: int,
    tv_iterations: int,
    method: str,
    gram: str = "stacked",
    restart: bool = False,
    rel_tol: float | None = None,
    fgp_unroll: bool = False,
    fgp_dual_bf16: bool = False,
    fgp_opt: str | None = None,
    sigma_fac: float = 1.0,
    warm_tv: bool = False,
):
    x0hat = x0_ref[0]
    b = pl.program_id(0)
    rho = scal_ref[b, 0]
    lam = scal_ref[b, 1]
    H, W = x0hat.shape
    f32 = x0hat.dtype

    # (the stencil gram routes through _kernel_grouped, which takes no
    # factor inputs at all)
    if gram == "noconcat":
        lcat = lcat_ref[...]
        rcat = rcat_ref[...]
        # derive the output-stacked [hi; lo] factors once per grid step
        l2 = jnp.concatenate([lcat[:, :H], lcat[:, 2 * H :]], axis=0)
        r2 = jnp.concatenate([rcat[:W], rcat[2 * W :]], axis=1)
        normal = make_gram_normal_noconcat(
            l2, lcat[:, :H], r2, rcat[:W], f32
        )
    else:
        normal = make_gram_normal(lcat_ref[...], rcat_ref[...], f32)
    store = jnp.bfloat16 if fgp_dual_bf16 else None
    if warm_tv:
        _, fgp_s = make_tv_fgp_stateful(H, W, f32, unroll=fgp_unroll,
                                        store=store)

        def fgp_state(xg, lam_tv, duals):
            return fgp_s(xg, lam_tv, tv_iterations, duals)

        out_ref[0] = _fista_loop_warm(
            normal, fgp_state, tab_ref, rho, lam, x0hat, iterations,
            dual_dtype=store,
        )
        return
    _, fgp_n = make_tv_fgp(H, W, f32, unroll=fgp_unroll, store=store,
                           opt=fgp_opt)

    def fgp(xg, lam_tv):
        return fgp_n(xg, lam_tv, tv_iterations)

    if restart or rel_tol is not None:
        dyn = _pogm_loop_dynamic if method == "pogm" else _fista_loop_dynamic
        out_ref[0] = dyn(
            normal, fgp, rho, lam, x0hat, iterations, restart, rel_tol,
            **({"sigma_fac": sigma_fac} if method == "pogm" else {}),
        )
    else:
        out_ref[0] = _pgm_loop(
            normal, fgp, tab_ref, rho, lam, x0hat, iterations, method
        )


def _fista_dynamic_scalars(
    th_in, th_old, done, dot_acc, res_acc, norm_x0, restart, rel_tol, f32
):
    """One home for the dynamic FISTA schedule's scalar epilogue — the θ
    recurrence, gradient-restart reset (FISTA.jl:171-176: restart dot > 0
    ⇒ θ ← 1) and convergence-freeze masking — shared by the monolithic
    dynamic loop and both tiled VMEM-carry kernels (whose reductions are
    tile-interior accumulators instead of whole-plane sums).

    Returns ``(th_new, th_old_new, done_new, live)`` where ``live`` is
    the pre-decision 1−done (problems freeze AFTER the detecting step).
    """
    one = jnp.asarray(1.0, f32)
    th = th_in
    if restart:
        th = jnp.where(dot_acc > 0.0, one, th)
    th_old_new = th
    th_new = (1.0 + jnp.sqrt(1.0 + 4.0 * th * th)) / 2.0
    done_new = done
    live = 1.0 - done
    if rel_tol is not None:
        rel = jnp.sqrt(res_acc) / norm_x0
        done_new = jnp.maximum(done, (rel < rel_tol).astype(f32))
        th_old_new = th_old + live * (th_old_new - th_old)
        th_new = th_in + live * (th_new - th_in)
    return th_new, th_old_new, done_new, live


def _pogm_dynamic_coeffs(th_old, sig, gam_old, rho, last, restart):
    """The dynamic POGM per-iteration coefficients (POGM.jl:189-202):
    θ recurrence (with the last-iteration √(1+8θ²) variant under
    restart), inertia α, σ-scaled β, and γ. Shared by the monolithic
    dynamic loop and the tiled VMEM-carry POGM kernel. Returns
    ``(th, alpha, beta, gam)``."""
    if restart:
        th = jnp.where(
            last,
            (1.0 + jnp.sqrt(1.0 + 8.0 * th_old * th_old)) / 2.0,
            (1.0 + jnp.sqrt(1.0 + 4.0 * th_old * th_old)) / 2.0,
        )
    else:
        th = (1.0 + jnp.sqrt(1.0 + 4.0 * th_old * th_old)) / 2.0
    alpha = (th_old - 1.0) / th
    beta = sig * th_old / th
    if restart:
        gam = rho * (1.0 + alpha + beta)
    else:
        gam = rho * (2.0 * th_old + th - 1.0) / th
    return th, alpha, beta, gam


def _pogm_restart_decision(c1, c2, gam, sig, th, sigma_fac, f32):
    """The POGM gradient-restart decision from the two w_mid reductions
    (POGM.jl:222-232): crit = c1/γ − c2 < 0 ⇒ θ ← 1, σ ← 1; else
    σ ← σ·σ_fac. Returns ``(sig_new, th_new)``."""
    one = jnp.asarray(1.0, f32)
    fire = (c1 / gam - c2) < 0.0
    return jnp.where(fire, one, sig * sigma_fac), jnp.where(fire, one, th)


def _fista_loop_dynamic(
    normal, fgp, rho, lam, x0hat, iterations, restart, rel_tol, theta0=1.0
):
    """FISTA loop with a data-dependent momentum schedule: in-kernel f32 θ
    recurrence, optional gradient-restart test (reference FISTA.jl:171-176:
    Re⟨∇f(y), x_new − x_prev⟩ > 0 ⇒ θ ← 1) and optional per-problem
    convergence freeze (FISTA.jl:187-189 / solve_batched done-masking:
    once ‖res‖/‖x0hat‖ < rel_tol every later update is a no-op, so the
    fixed grid returns exactly the early-exited iterate). `rho`/`lam`
    must be per-problem scalars (the reductions are whole-plane)."""
    f32 = x0hat.dtype
    early = rel_tol is not None
    norm_x0 = jnp.sqrt(jnp.sum(x0hat * x0hat)) if early else None

    def body(i, carry):
        x, m1, th_in, th_old, done = carry
        a = (th_old - 1.0) / th_in
        x_mom = x + a * (x - m1)
        res = normal(x_mom) - x0hat
        x_new = fgp(x_mom - rho * res, rho * lam)
        if restart == "gradient_mapping":
            # composite gradient-mapping test (fista.py step): correct
            # under the prox where the raw-∇f dot misfires
            dot_acc = jnp.sum((x_mom - x_new) * (x_new - x))
        elif restart:
            dot_acc = jnp.sum(res * (x_new - x))
        else:
            dot_acc = None
        res_acc = jnp.sum(res * res) if early else None
        th_new, th_old_new, done, live = _fista_dynamic_scalars(
            th_in, th_old, done, dot_acc, res_acc, norm_x0,
            restart, rel_tol, f32,
        )
        if early:
            x_out = x + live * (x_new - x)
            m1_out = m1 + live * (x - m1)
            return (x_out, m1_out, th_new, th_old_new, done)
        return (x_new, x, th_new, th_old_new, done)

    x_init = x0hat * 0.0
    th_i = jnp.asarray(theta0, f32)
    x, *_ = lax.fori_loop(
        0, iterations, body, (x_init, x_init, th_i, th_i, jnp.asarray(0.0, f32))
    )
    return x


def _pogm_loop_dynamic(
    normal,
    fgp,
    rho,
    lam,
    x0hat,
    iterations,
    restart,
    rel_tol,
    sigma_fac=1.0,
    theta0=1.0,
):
    """POGM loop with the data-dependent pieces in-kernel: f32 θ/σ/γ
    recurrences, the gradient-restart criterion on the running w plane
    (reference POGM.jl:222-232: Re((⟨w,x⟩−⟨w,z⟩)/γ − ⟨w,res⟩) < 0 ⇒
    θ ← 1, σ ← 1; else σ ← σ·σ_fac), the restart-mode γ = ρ(1+α+β)
    (POGM.jl:198-202) and the final-iteration √(1+8θ²) variant, plus the
    optional per-problem convergence freeze (same masking as
    `_fista_loop_dynamic`). Semantics mirror pogm.py step() exactly."""
    f32 = x0hat.dtype
    early = rel_tol is not None
    norm_x0 = jnp.sqrt(jnp.sum(x0hat * x0hat)) if early else None
    one = jnp.asarray(1.0, f32)

    def body(i, carry):
        x, y, z, w, th_in, sig, gam_old, done = carry
        x_old = x
        res = normal(x) - x0hat
        xg = x - rho * res
        th_old = th_in
        last = i == iterations - 1
        # (the last-iteration 8θ² variant only applies with restart on,
        # POGM.jl:190-194 — folded into _pogm_dynamic_coeffs)
        th, alpha, beta, gam = _pogm_dynamic_coeffs(
            th_old, sig, gam_old, rho, last, restart
        )
        y_old = y
        y_new = xg
        x_mid = (
            (1.0 + alpha + beta) * y_new
            - alpha * y_old
            - (beta + rho * alpha / gam_old) * x_old
            + (rho * alpha / gam_old) * z
        )
        z_new = x_mid
        x_new = fgp(x_mid, gam * lam)
        w_new = w
        sig_new = sig
        if restart:
            w_mid = w + y_new + (rho / gam) * (x_new - z_new)
            sig_new, th = _pogm_restart_decision(
                jnp.sum(w_mid * (x_new - z_new)),
                jnp.sum(w_mid * res),
                gam, sig, th, sigma_fac, f32,
            )
            w_new = (rho / gam) * (z_new - x_new) - y_new
        if early:
            rel = jnp.sqrt(jnp.sum(res * res)) / norm_x0
            keep = done  # freeze AFTER the step that detected convergence
            done = jnp.maximum(done, (rel < rel_tol).astype(f32))
            live = 1.0 - keep
            x_new = x + live * (x_new - x)
            y_new = y + live * (y_new - y)
            z_new = z + live * (z_new - z)
            w_new = w + live * (w_new - w)
            th = th_in + live * (th - th_in)
            sig_new = sig + live * (sig_new - sig)
            gam = gam_old + live * (gam - gam_old)
        return (x_new, y_new, z_new, w_new, th, sig_new, gam, done)

    x_init = x0hat * 0.0
    th_i = jnp.asarray(theta0, f32)
    x, *_ = lax.fori_loop(
        0,
        iterations,
        body,
        (x_init, x_init, x_init, x_init, th_i, one, one, jnp.asarray(0.0, f32)),
    )
    return x


def _pgm_loop(normal, fgp, tab_ref, rho, lam, x0hat, iterations, method):
    """Table-driven proximal-gradient loop shared by the per-problem and
    grouped kernels. carry = (x, m1, m2); m1/m2 are x_prev (FISTA) or
    (y, z) (OptISTA/POGM). Semantics mirror fista.py/optista.py/pogm.py
    step() exactly (track_residual=False, no restart, no projections).
    `rho`/`lam` may be scalars or broadcastable planes."""

    def body(i, carry):
        x, m1, m2 = carry
        a = tab_ref[i, 0]
        bcoef = tab_ref[i, 1]
        g = tab_ref[i, 2]
        e = tab_ref[i, 3]
        if method == "fista":
            x_mom = x + a * (x - m1)
            res = normal(x_mom) - x0hat
            x_new = fgp(x_mom - rho * res, rho * lam)
            return (x_new, x, m2)
        if method == "optista":
            y, z = m1, m2
            res = normal(x) - x0hat
            y_new = fgp(y - (rho * g) * res, (rho * g) * lam)
            z_new = x + (y_new - y) * e
            x_new = (1.0 + a + bcoef) * z_new - a * z - bcoef * x
            return (x_new, y_new, z_new)
        # pogm (restart="none", σ = 1)
        y, z = m1, m2
        res = normal(x) - x0hat
        y_new = x - rho * res
        x_mid = (
            (1.0 + a + bcoef) * y_new - a * y - (bcoef + e) * x + e * z
        )
        x_new = fgp(x_mid, (rho * g) * lam)
        return (x_new, y_new, x_mid)

    # initial carries derived from a loaded ref (not a splatted constant):
    # Mosaic refuses to relayout a replicated constant into the loop carry
    x_init = x0hat * 0.0
    x, _, _ = lax.fori_loop(
        0, iterations, body, (x_init, x_init, x_init)
    )
    return x


def _fista_loop_warm(
    normal, fgp_state, tab_ref, rho, lam, x0hat, iterations,
    dual_dtype=None,
):
    """Table-driven FISTA loop with WARM-STARTED TV duals: the FGP dual
    fields survive across outer iterations (carried in the loop), so each
    prox starts from the previous subproblem's duals instead of zero.
    Requires the prox scale ρλ to be constant over the schedule — true
    for FISTA, not for OptISTA/POGM's γ-scaled prox (callers gate on
    method == "fista").

    Measured value (flagship-style piecewise-constant deblurring, 64²,
    50 outer iterations, error vs the tv=80 exact-prox trajectory):
    tv=10 warm 5.8e-4 vs cold 7.2e-4; tv=6 warm 1.27e-3 vs cold 1.38e-3 —
    a ~15-20% accuracy refinement at equal cost in the CONVERGED regime.
    At tv≤4, or on fast-moving early trajectories (random-noise targets,
    few outer iterations), the stale duals cost as much as they save and
    cold matches or wins — warm_tv is an accuracy refinement, NOT an
    inner-iteration discount. Opt-in accordingly.

    This intentionally deviates from the reference's cold-per-call FGP
    (ProxTV.jl:89-125 re-allocates zero duals every call).
    """

    def body(i, carry):
        x, m1, pv, ph = carry
        a = tab_ref[i, 0]
        x_mom = x + a * (x - m1)
        res = normal(x_mom) - x0hat
        x_new, (pv, ph) = fgp_state(x_mom - rho * res, rho * lam, (pv, ph))
        return (x_new, x, pv, ph)

    # initial carries derived from a loaded ref (not a splatted constant)
    x_init = x0hat * 0.0
    d_init = x_init.astype(dual_dtype) if dual_dtype is not None else x_init
    x, _, _, _ = lax.fori_loop(
        0, iterations, body, (x_init, x_init, d_init, d_init)
    )
    return x


def _pgm_loop_multi(
    normal, fgp_multi, tab_ref, rhos, lams, x0hats, iterations, method
):
    """`_pgm_loop` over G INTERLEAVED problems: one fori_loop whose body
    emits every per-iteration line for all G problems before the next
    line (tuples of (H, W) planes in the carry). Per-problem math is
    identical to `_pgm_loop` + fold-FGP; only program order changes —
    G independent dependency chains sit side by side for the static
    scheduler (see `make_tv_fgp_fold_multi`). ρ/λ are per-problem SMEM
    scalars."""
    G = len(x0hats)

    def body(i, carry):
        xs, m1s, m2s = carry
        a = tab_ref[i, 0]
        bcoef = tab_ref[i, 1]
        g = tab_ref[i, 2]
        e = tab_ref[i, 3]
        if method == "fista":
            x_moms = tuple(x + a * (x - m1) for x, m1 in zip(xs, m1s))
            ress = tuple(
                normal(xm) - x0 for xm, x0 in zip(x_moms, x0hats)
            )
            xgs = tuple(
                xm - r * res for xm, r, res in zip(x_moms, rhos, ress)
            )
            x_news = fgp_multi(
                xgs, tuple(r * l for r, l in zip(rhos, lams))
            )
            return (x_news, xs, m2s)
        if method == "optista":
            ys, zs = m1s, m2s
            ress = tuple(normal(x) - x0 for x, x0 in zip(xs, x0hats))
            y_news = fgp_multi(
                tuple(
                    y - (r * g) * res for y, r, res in zip(ys, rhos, ress)
                ),
                tuple((r * g) * l for r, l in zip(rhos, lams)),
            )
            z_news = tuple(
                x + (yn - y) * e for x, yn, y in zip(xs, y_news, ys)
            )
            x_news = tuple(
                (1.0 + a + bcoef) * zn - a * z - bcoef * x
                for zn, z, x in zip(z_news, zs, xs)
            )
            return (x_news, y_news, z_news)
        # pogm (restart="none", σ = 1)
        ys, zs = m1s, m2s
        ress = tuple(normal(x) - x0 for x, x0 in zip(xs, x0hats))
        y_news = tuple(x - r * res for x, r, res in zip(xs, rhos, ress))
        x_mids = tuple(
            (1.0 + a + bcoef) * yn - a * y - (bcoef + e) * x + e * z
            for yn, y, x, z in zip(y_news, ys, xs, zs)
        )
        x_news = fgp_multi(
            x_mids, tuple((r * g) * l for r, l in zip(rhos, lams))
        )
        return (x_news, y_news, x_mids)

    x_inits = tuple(x0 * 0.0 for x0 in x0hats)
    xs, _, _ = lax.fori_loop(
        0, iterations, body, (x_inits, x_inits, x_inits)
    )
    return xs


def _kernel_interleaved(
    scal_ref,  # SMEM (B, 2): per-problem [rho, lam_eff]
    tab_ref,  # SMEM (iterations, 4)
    lcat_ref,  # VMEM (H, 3H)
    rcat_ref,  # VMEM (3W, W)
    x0_ref,  # VMEM (G, H, W): AᴴB for this step's G problems
    out_ref,  # VMEM (G, H, W)
    *,
    iterations: int,
    tv_iterations: int,
    method: str,
    group: int,
):
    """G problems per grid step as G INTERLEAVED (H, W) chains — NOT
    plane-stacked like `_kernel_grouped`. Targets the r5 roofline bound
    (per-op issue/dependency latency, docs/tpu.md): independent ops
    adjacent in program order let the VLIW scheduler fill one chain's
    stalls with another's work, which bigger planes cannot (Mosaic
    issues per (8, 128) vreg either way — measured: group=2 stacking
    448.9 p/s vs 575.5 ungrouped, pack ≈ fold). Per-problem semantics
    are exactly `_kernel` with the fold FGP (same strict-f32 math)."""
    G = group
    _, H, W = x0_ref.shape
    f32 = x0_ref.dtype
    b = pl.program_id(0)
    rhos = tuple(scal_ref[b * G + g, 0] for g in range(G))
    lams = tuple(scal_ref[b * G + g, 1] for g in range(G))
    lcat = lcat_ref[...]
    rcat = rcat_ref[...]
    l2 = jnp.concatenate([lcat[:, :H], lcat[:, 2 * H :]], axis=0)
    r2 = jnp.concatenate([rcat[:W], rcat[2 * W :]], axis=1)
    normal = make_gram_normal_noconcat(l2, lcat[:, :H], r2, rcat[:W], f32)
    fgp_m = make_tv_fgp_fold_multi(H, W, f32)

    def fgp_multi(xgs, lam_tvs):
        return fgp_m(xgs, lam_tvs, tv_iterations)

    x0hats = tuple(x0_ref[g] for g in range(G))
    xs = _pgm_loop_multi(
        normal, fgp_multi, tab_ref, rhos, lams, x0hats, iterations, method
    )
    for g in range(G):
        out_ref[g] = xs[g]


def _kernel_grouped(
    scal_ref,  # SMEM (B, 2): per-problem [rho, lam_eff]
    tab_ref,  # SMEM (iterations, 4)
    *refs,  # stencil: (x0, out); noconcat: (lcat, rcat, x0, out)
    iterations: int,
    tv_iterations: int,
    method: str,
    taps: tuple | None,
    group: int,
    gram: str = "stencil",
    restart: bool = False,
    rel_tol: float | None = None,
    fgp_unroll: bool = False,
    fgp_dual_bf16: bool = False,
    fgp_opt: str | None = None,
    sigma_fac: float = 1.0,
    warm_tv: bool = False,
):
    """G problems per grid step, stacked along the row axis: every
    elementwise/roll op is G× larger, amortizing the per-op issue
    overhead that bounds the per-problem kernel. Gram: the factor-free
    VPU stencil, or the compensated-MXU noconcat sandwich applied per
    row-slice (the matmuls stay per-problem; only the VPU-bound
    dual/momentum chain runs grouped)."""
    G = group
    if gram == "stencil":
        x0_ref, out_ref = refs
    else:
        lcat_ref, rcat_ref, x0_ref, out_ref = refs
    _, H, W = x0_ref.shape
    x0hat = x0_ref[...].reshape(G * H, W)
    f32 = x0hat.dtype
    b = pl.program_id(0)
    if G == 1:
        # SMEM scalars — the (G·H, W) select planes below would cost two
        # full planes of VMEM (what keeps 512² from fitting the budget)
        rho = scal_ref[b, 0]
        lam = scal_ref[b, 1]
    else:
        # per-problem ρ/λ as (G·H, W) planes via an iota select ladder
        gidx = lax.broadcasted_iota(jnp.int32, (G * H, W), 0) // H
        rho = None
        lam = None
        for g_i in range(G):
            sel = (gidx == g_i).astype(f32)
            r_g = scal_ref[b * G + g_i, 0] * sel
            l_g = scal_ref[b * G + g_i, 1] * sel
            rho = r_g if rho is None else rho + r_g
            lam = l_g if lam is None else lam + l_g

    if gram == "stencil":
        normal = make_sepconv_normal_stencil(
            taps[0], taps[1], H, W, f32, groups=G
        )
    else:
        lcat = lcat_ref[...]
        rcat = rcat_ref[...]
        l2 = jnp.concatenate([lcat[:, :H], lcat[:, 2 * H :]], axis=0)
        r2 = jnp.concatenate([rcat[:W], rcat[2 * W :]], axis=1)
        base = make_gram_normal_noconcat(l2, lcat[:, :H], r2, rcat[:W], f32)
        if G == 1:
            normal = base
        else:

            def normal(u):  # per-problem matmul slices, restacked
                return jnp.concatenate(
                    [base(u[g * H : (g + 1) * H]) for g in range(G)], axis=0
                )

    store = jnp.bfloat16 if fgp_dual_bf16 else None
    if warm_tv:
        _, fgp_s = make_tv_fgp_stateful(H, W, f32, groups=G,
                                        unroll=fgp_unroll, store=store)

        def fgp_state(xg, lam_tv, duals):
            return fgp_s(xg, lam_tv, tv_iterations, duals)

        out_ref[...] = _fista_loop_warm(
            normal, fgp_state, tab_ref, rho, lam, x0hat, iterations,
            dual_dtype=store,
        ).reshape(G, H, W)
        return

    _, fgp_n = make_tv_fgp(H, W, f32, groups=G, unroll=fgp_unroll,
                           store=store, opt=fgp_opt)

    def fgp(xg, lam_tv):
        return fgp_n(xg, lam_tv, tv_iterations)

    if restart or rel_tol is not None:
        # whole-plane reductions: only valid per problem, i.e. G == 1
        # (enforced by fista_tv_fused)
        dyn = _pogm_loop_dynamic if method == "pogm" else _fista_loop_dynamic
        x = dyn(
            normal, fgp, rho, lam, x0hat, iterations, restart, rel_tol,
            **({"sigma_fac": sigma_fac} if method == "pogm" else {}),
        )
    else:
        x = _pgm_loop(
            normal, fgp, tab_ref, rho, lam, x0hat, iterations, method
        )
    out_ref[...] = x.reshape(G, H, W)


def fista_tv_fused(
    x0hat_b,  # (B, H, W) f32: AᴴB per problem
    lcat,  # (H, 3H)
    rcat,  # (3W, W)
    rho,  # scalar or (B,)
    lam,  # scalar or (B,): effective λ (already normalization-scaled)
    iterations: int,
    tv_iterations: int,
    interpret: bool = False,
    method: str = "fista",
    gram: str = "stacked",
    taps: tuple | None = None,
    group: int = 1,
    restart: bool = False,
    rel_tol: float | None = None,
    fgp_unroll: bool = False,
    fgp_dual_bf16: bool = False,
    fgp_opt: str | None = None,
    sigma_fac: float = 1.0,
    warm_tv: bool = False,
    interleave: int = 1,
):
    B, H, W = x0hat_b.shape
    if interleave > 1:
        # G interleaved per-problem chains per grid step (see
        # _kernel_interleaved) — fixed-schedule fold-FGP noconcat only
        if gram != "noconcat":
            raise ValueError("interleave > 1 requires gram='noconcat'")
        if group > 1:
            raise ValueError("interleave and group are mutually exclusive")
        if restart or rel_tol is not None or warm_tv or fgp_dual_bf16:
            raise ValueError(
                "interleave > 1 is the fixed-schedule f32 fold path: no "
                "restart/early-exit/warm_tv/bf16 duals"
            )
        if B % interleave:
            raise ValueError(
                f"batch {B} not divisible by interleave {interleave}"
            )
        G = interleave
        scal = jnp.stack(
            [
                jnp.broadcast_to(
                    jnp.asarray(rho, jnp.float32).reshape(-1), (B,)
                ),
                jnp.broadcast_to(
                    jnp.asarray(lam, jnp.float32).reshape(-1), (B,)
                ),
            ],
            axis=1,
        )
        tab = jnp.asarray(_momentum_table(method, iterations))
        _check_vmem_pgm_tv_interleaved(H, W, G)
        return pl.pallas_call(
            functools.partial(
                _kernel_interleaved,
                iterations=iterations,
                tv_iterations=tv_iterations,
                method=method,
                group=G,
            ),
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (H, 3 * H), lambda b: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (3 * W, W), lambda b: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (G, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (G, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, W), x0hat_b.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_limit_pgm_tv_interleaved(H, W, G)
            ),
            interpret=interpret,
        )(scal, tab, lcat, rcat, x0hat_b)
    if (restart or rel_tol is not None) and method not in ("fista", "pogm"):
        raise ValueError(
            "restart/early-exit are FISTA/POGM-only in the fused path"
        )
    if (restart or rel_tol is not None) and group > 1:
        raise ValueError(
            "restart/early-exit need per-problem reductions; group must be 1"
        )
    if warm_tv and method != "fista":
        raise ValueError(
            "warm_tv carries λ-scaled duals across iterations, which needs "
            "a constant prox scale — FISTA only (OptISTA/POGM scale by γ_i)"
        )
    if warm_tv and (restart or rel_tol is not None):
        raise ValueError(
            "warm_tv is not implemented for the dynamic (restart/early-"
            "exit) schedules yet"
        )
    if fgp_opt is not None and (not fgp_unroll or fgp_dual_bf16 or warm_tv):
        raise ValueError(
            "fgp_opt variants are issue-count-reduced forms of the "
            "statically-unrolled f32 cold-start loop — they require "
            "fgp_unroll=True and exclude fgp_dual_bf16/warm_tv"
        )
    scal = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(rho, jnp.float32).reshape(-1), (B,)),
            jnp.broadcast_to(jnp.asarray(lam, jnp.float32).reshape(-1), (B,)),
        ],
        axis=1,
    )
    tab = jnp.asarray(_momentum_table(method, iterations))
    # validation BEFORE the guard: clear errors beat a misleading VMEM one
    if gram == "stencil" and taps is None:
        raise ValueError("gram='stencil' requires taps")
    if group > 1 and gram not in ("stencil", "noconcat"):
        raise ValueError("group > 1 requires gram='stencil' or 'noconcat'")
    if B % group:
        raise ValueError(f"batch {B} not divisible by group {group}")
    _check_vmem_pgm_tv(H * group, W, gram, im_h=H, warm_tv=warm_tv)
    comp_params = pltpu.CompilerParams(
        vmem_limit_bytes=_vmem_limit_pgm_tv(
            H * group, W, gram, im_h=H, warm_tv=warm_tv
        )
    )
    if gram == "stencil" or (gram == "noconcat" and group > 1):
        # the grouped kernel (group may be 1): the stencil needs no
        # lcat/rcat inputs, so that path never DMAs them; the noconcat
        # variant DMAs the factor blocks once per grid step
        factor_args = () if gram == "stencil" else (lcat, rcat)
        factor_specs = (
            []
            if gram == "stencil"
            else [
                pl.BlockSpec(
                    (H, 3 * H), lambda b: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (3 * W, W), lambda b: (0, 0), memory_space=pltpu.VMEM
                ),
            ]
        )
        return pl.pallas_call(
            functools.partial(
                _kernel_grouped,
                iterations=iterations,
                tv_iterations=tv_iterations,
                method=method,
                taps=taps,
                group=group,
                gram=gram,
                restart=restart,
                rel_tol=rel_tol,
                fgp_unroll=fgp_unroll,
                fgp_dual_bf16=fgp_dual_bf16,
                fgp_opt=fgp_opt,
                sigma_fac=sigma_fac,
                warm_tv=warm_tv,
            ),
            grid=(B // group,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *factor_specs,
                pl.BlockSpec(
                    (group, H, W), lambda b: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (group, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, W), x0hat_b.dtype),
            compiler_params=comp_params,
            interpret=interpret,
        )(scal, tab, *factor_args, x0hat_b)
    return pl.pallas_call(
        functools.partial(
            _kernel,
            iterations=iterations,
            tv_iterations=tv_iterations,
            method=method,
            gram=gram,
            restart=restart,
            rel_tol=rel_tol,
            fgp_unroll=fgp_unroll,
            fgp_dual_bf16=fgp_dual_bf16,
            fgp_opt=fgp_opt,
            sigma_fac=sigma_fac,
            warm_tv=warm_tv,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((H, 3 * H), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * W, W), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W), x0hat_b.dtype),
        compiler_params=comp_params,
        interpret=interpret,
    )(scal, tab, lcat, rcat, x0hat_b)


def solve_fista_tv_fused(solver, B_mat, interpret: bool | None = None):
    """Backward-compatible alias of `solve_pgm_tv_fused` for FISTA."""
    return solve_pgm_tv_fused(solver, B_mat, interpret=interpret)


def check_pgm_tv_fused(solver):
    """Validate `solver` for the fused PGM-TV path.

    Raises ValueError naming the first unsupported piece; returns the
    momentum-table method string on success. Used by `solve_pgm_tv_fused`
    and by `auto.solve_batched_fast` to decide applicability WITHOUT
    catching execution-time errors.
    """
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
        raise ValueError("fused path requires FISTA, OptISTA, or POGM")
    # the kernel applies the GRAM factors of A, so AHA must actually be
    # A's NormalOperator — a bare operator passed as AHA means "this IS
    # AᴴA already", which the kernel cannot honor (it would square it)
    if not isinstance(solver.AHA, NormalOperator):
        raise ValueError(
            "fused path requires AHA to be the NormalOperator of a "
            "SeparableConvOperator (construct the solver from A, not AHA)"
        )
    if solver.AHA.weights is not None:
        raise ValueError("fused path does not support weighted normal ops")
    op = solver.AHA.A
    if not isinstance(op, SeparableConvOperator):
        raise ValueError("fused path requires SeparableConvOperator")
    if solver.A is None:
        raise ValueError("fused path requires solver.A (for x0hat = Aᴴb)")
    if op.cat is None:
        raise ValueError("fused path requires compensated=True factors")
    reg = solver.reg
    if not isinstance(reg, TVRegularization):
        raise ValueError("fused path requires TVRegularization")
    H, W = op.im_shape
    dims = (reg.dims,) if isinstance(reg.dims, int) else tuple(reg.dims)
    if reg.shape != (H, W) or tuple(sorted(dims)) != (0, 1):
        raise ValueError("fused path requires 2-D TV over both axes")
    if solver.proj:
        raise ValueError("fused path does not support projection terms")
    solver_restart = getattr(solver, "restart", "none")
    if solver_restart not in ("none", "gradient", "gradient_mapping"):
        raise ValueError(f"fused path does not support restart={solver_restart!r}")
    if solver_restart == "gradient" and method not in ("fista", "pogm"):
        raise ValueError(
            "fused gradient restart is implemented for FISTA "
            "(reference FISTA.jl:171-176) and POGM (POGM.jl:222-232) "
            "only; use the composed path"
        )
    if solver_restart == "gradient_mapping" and method != "fista":
        raise ValueError(
            "gradient_mapping restart is a FISTA mode; use the composed path"
        )
    if method == "pogm":
        sigma_fac = getattr(solver, "sigma_fac", 1.0)
        if isinstance(sigma_fac, jax.core.Tracer):
            raise ValueError(
                "fused POGM needs a concrete solver.sigma_fac; close the "
                "solver over jax.jit instead of passing it as a jit argument"
            )
    theta0 = getattr(solver, "theta", 1.0)
    if isinstance(theta0, jax.core.Tracer):
        # the momentum table is built host-side from theta — a traced theta
        # cannot be validated and a silent theta=1 assumption would return
        # WRONG results; close the solver over jit instead of passing it
        # as a traced argument
        raise ValueError(
            "fused path needs a concrete solver.theta; close the solver "
            "over jax.jit (jit(lambda B: solve_pgm_tv_fused(solver, B))) "
            "instead of passing it as a jit argument"
        )
    if float(theta0) != 1.0:
        raise ValueError("fused path requires the default theta=1 schedule")
    _check_vmem_pgm_tv(H, W)
    return method


def _vmem_model_pgm_tv(
    H, W, gram: str = "stacked", im_h: int | None = None,
    warm_tv: bool = False,
):
    """Working-set model in bytes: live set ≈ x, x_old, x0hat, momentum/
    residual temps, 4 TV duals + 2 stacked concat temps (3×) + the two
    Gram factor blocks. The stencil path carries no factor blocks and no
    concat temps, but its loop carries + FGP duals + stencil temps still
    measure ~18 planes (empirical: 384² and 256²-G2 compile, 512² and
    256²-G4 OOM under the 16 MiB default limit). `H` is the total
    (grouped) row extent; `im_h` the per-problem image height for the
    factor-block terms (defaults to H)."""
    fh = H if im_h is None else im_h
    warm = 2 if warm_tv else 0  # the two dual carry planes survive the loop
    if gram == "stencil":
        return (18 + warm) * H * W * 4
    return (
        (12 + warm) * H * W + 2 * 3 * H * W + 3 * fh * fh + 3 * W * W
    ) * 4


def _vmem_gate_bytes():
    """Acceptance gate for the fused path. Default 16 MiB — the Mosaic
    scoped-VMEM default, under which all dispatch-eligible shapes were
    chip-validated. RLS_TPU_VMEM_GATE_MIB overrides for A/B runs (v5e has
    128 MiB of physical VMEM; the kernel passes an explicit
    vmem_limit_bytes sized to its model, so shapes past 16 MiB compile —
    but they dispatch only when the gate is raised deliberately)."""
    import os

    return int(os.environ.get("RLS_TPU_VMEM_GATE_MIB", "16")) * 1024 * 1024


def _vmem_limit_pgm_tv(
    H, W, gram: str = "stacked", im_h: int | None = None,
    warm_tv: bool = False,
):
    """Explicit Mosaic vmem_limit_bytes: the model plus 2 planes of
    in/out double-buffering plus 2 MiB slack, never below the 16 MiB
    default (same calibration as admm_tv_tiled: the model undercounts
    block double-buffering and Mosaic stack slack). The stacked/noconcat
    paths also DMA the lcat (H×3H) / rcat (3W×W) factor blocks, which
    Mosaic may double-buffer too — count one extra copy of each."""
    model = _vmem_model_pgm_tv(H, W, gram, im_h=im_h, warm_tv=warm_tv)
    slack = 2 * H * W * 4 + 2 * 1024 * 1024
    if gram != "stencil":
        fh = H if im_h is None else im_h
        slack += (3 * fh * fh + 3 * W * W) * 4
    return max(16 * 1024 * 1024, model + slack)


def _check_vmem_pgm_tv(
    H, W, gram: str = "stacked", im_h: int | None = None,
    warm_tv: bool = False,
):
    vmem_bytes = _vmem_model_pgm_tv(H, W, gram, im_h=im_h, warm_tv=warm_tv)
    if vmem_bytes > _vmem_gate_bytes():
        raise ValueError(
            f"fused FISTA-TV working set ~{vmem_bytes/2**20:.0f} MiB exceeds "
            "VMEM; use the composed solve path"
        )


def _vmem_model_pgm_tv_interleaved(H, W, G):
    """Working-set model for the interleaved kernel: per problem the
    live chain is ~the single-problem noconcat set minus the shared
    factor/concat buffers (x, m1, m2, x0hat, x_mom/res/xg temps, 4 FGP
    duals + y/q temps + the 2 folded bound planes ≈ 16 planes), plus
    the shared factor blocks once."""
    return (16 * G * H * W + 3 * H * H + 3 * W * W) * 4


def _vmem_limit_pgm_tv_interleaved(H, W, G):
    model = _vmem_model_pgm_tv_interleaved(H, W, G)
    # in/out double-buffering is (G, H, W) blocks; count one extra copy
    # of each plus the factor blocks and 2 MiB slack (same calibration
    # as _vmem_limit_pgm_tv)
    slack = 2 * G * H * W * 4 + (3 * H * H + 3 * W * W) * 4 + 2 * 1024 * 1024
    return max(16 * 1024 * 1024, model + slack)


def _check_vmem_pgm_tv_interleaved(H, W, G):
    vmem_bytes = _vmem_model_pgm_tv_interleaved(H, W, G)
    if vmem_bytes > _vmem_gate_bytes():
        raise ValueError(
            f"interleaved fused FISTA-TV working set ~{vmem_bytes/2**20:.0f} "
            "MiB exceeds VMEM; lower interleave or use the composed path"
        )


def solve_pgm_tv_fused(
    solver,
    B_mat,
    interpret: bool | None = None,
    early_exit: bool = False,
    warm_tv: bool = False,
    fgp_unroll: bool | None = None,
    fgp_dual_bf16: bool | None = None,
    fgp_opt: str | None = None,
    interleave: int = 1,
):
    """Drop-in fast path for `solve_batched_unrolled(solver, B)` when the
    solver is FISTA / OptISTA / POGM + SeparableConvOperator + 2-D TV (the
    flagship bench shape). Returns the n×K solution matrix like the
    composed driver. ``solver.restart == "gradient"`` rides the in-kernel
    restart loop (FISTA and POGM). With ``early_exit=True`` (and a
    concrete ``solver.rel_tol > 0``) converged problems freeze in-kernel —
    the `solve_batched` done-masking semantics on the fixed grid.

    ``warm_tv=True`` (FISTA, fixed schedule only) carries the TV-FGP dual
    fields across outer iterations: each prox warm-starts from the
    previous subproblem's duals. Measured effect: a ~15-20% accuracy
    refinement at equal inner budget in the CONVERGED regime, a wash on
    early/fast-moving trajectories or at tiny budgets — an accuracy
    refinement, NOT an inner-iteration discount (see `_fista_loop_warm`
    and docs/tpu.md for the curves). Costs exact trajectory parity with
    the reference's cold-per-call FGP (ProxTV.jl:89-125).

    Assumptions are *checked*, not silently ignored — callers get a
    ValueError naming the unsupported piece.
    """
    method = check_pgm_tv_fused(solver)
    restart = getattr(solver, "restart", "none")
    restart = False if restart == "none" else restart
    if warm_tv and (method != "fista" or restart):
        raise ValueError("warm_tv requires FISTA with restart='none'")
    rel_tol = None
    if early_exit:
        if method not in ("fista", "pogm"):
            raise ValueError("early_exit is FISTA/POGM-only in the fused path")
        if solver.rel_tol is None or isinstance(solver.rel_tol, jax.core.Tracer):
            raise ValueError("early_exit needs a concrete solver.rel_tol")
        rel_tol = float(solver.rel_tol)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if fgp_unroll is None:
        # default the FIXED-schedule paths to the statically-unrolled
        # λ-scaled FGP: identical math up to f32 rounding, ~20% fewer VPU
        # ops, measured +17% on chip (ab_fgp r4: noconcat_g1_unroll 575.5
        # vs _fori 489.9 p/s, vs_ref 5e-5). The dynamic (restart/early-
        # exit) loops keep the fori variant until they get their own A/B,
        # and interpret mode keeps fori too: the unrolled body runs each
        # op Python-eagerly, ~10× slower there (the unrolled math has its
        # own explicit interpret-mode test).
        fgp_unroll = not (restart or rel_tol is not None) and not interpret
    if fgp_dual_bf16 is None:
        # bf16-stored FGP duals measured NEGATIVE on chip (interleaved
        # A/B, AB_FLAGSHIP_r05.json: 440.9/438.3 p/s median for the
        # concat-roll/pre-rolled schemes vs 451.5-457.8 for f32, parity
        # 7.3e-5): the kernel is bound by per-op issue latency, not dual
        # VMEM bytes, so the conversions cost more than the bytes save
        # (docs/tpu.md roofline section). Stays opt-in.
        fgp_dual_bf16 = False
    if fgp_opt is None and fgp_unroll and not fgp_dual_bf16 and not warm_tv:
        # issue-count-reduced unrolled FGP (mask folded into the clamp
        # bounds + shared exact ×⅛ scale): same strict-f32 math as the
        # plain unrolled loop (chip A/B measured rel 0.0; ≤1-ulp under
        # FMA contraction) and +6% median interleaved in-session
        # (AB_FLAGSHIP_r05: fold 473.9 / pack 472.9 vs 445.7 p/s).
        # "fold" is the default for its tighter windows; "pack"
        # (sublane-stacked duals) stays opt-in.
        fgp_opt = "fold"
    if interleave > 1 and (restart or rel_tol is not None or warm_tv
                           or fgp_dual_bf16 or not fgp_unroll):
        raise ValueError(
            "interleave > 1 is the fixed-schedule f32 fold path: no "
            "restart/early-exit/warm_tv/bf16 duals (and requires the "
            "unrolled FGP)"
        )
    op_ = solver.AHA.A
    H_, W_ = op_.im_shape
    if interleave > 1 and (W_ % 64 or H_ % 64):
        raise ValueError(
            "interleave > 1 rides the compensated-MXU gram, which needs "
            "H, W % 64 == 0"
        )
    if (W_ % 64 or H_ % 64) and op_.taps_len is not None:
        # Mosaic rejects the compensated grams' in-kernel lane-dim REF
        # slices at offsets not divisible by 128 ("offset mismatch on
        # non-concat dimension"); the [hi hi lo] factors are sliced at
        # lane offset 2H, so H, W % 64 == 0 is required. The VPU stencil
        # gram is exact f32 and slice-free — route smaller images there
        return _solve_pgm_tv_fused_stencil(
            solver, B_mat, interpret, method, restart, rel_tol,
            warm_tv=warm_tv, fgp_unroll=fgp_unroll,
            fgp_dual_bf16=fgp_dual_bf16, fgp_opt=fgp_opt,
        )
    sigma_fac = float(getattr(solver, "sigma_fac", 1.0))
    op = solver.AHA.A
    reg = solver.reg
    H, W = op.im_shape
    # concat-free compensation: identical math (both operand sets are
    # exactly bf16-representable), consistently >= the stacked form in
    # on-chip A/B windows (skips the (3H, W)/(H, 3W) temporaries)
    gram = "noconcat"

    B_mat = jnp.asarray(B_mat)
    bt = B_mat.T  # (K, n)
    if op.taps_len is not None and solver.A is op:
        # exact-f32 Aᴴb seed (SeparableConvOperator.rmv_stencil): free
        # parity headroom vs the compensated rmv's ~2.5e-5 residual
        x0hat_b = jax.vmap(op.rmv_stencil)(bt).reshape(-1, H, W)
    else:
        x0hat_b = jax.vmap(solver.A.rmv)(bt).reshape(-1, H, W)
    from ..models.regularization import normalization_factor

    scale = jax.vmap(
        lambda b: normalization_factor(solver.normalize_reg, solver.A, b)
    )(bt)
    lam_eff = reg.get_lam() * scale
    lcat, rcat = op.cat["normal"]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out = fista_tv_fused(
        x0hat_b,
        lcat,
        rcat,
        solver.rho,
        lam_eff,
        solver.iterations,
        reg.iterations_tv,
        interpret=interpret,
        method=method,
        gram=gram,
        restart=restart,
        rel_tol=rel_tol,
        sigma_fac=sigma_fac,
        warm_tv=warm_tv,
        fgp_unroll=fgp_unroll,
        fgp_dual_bf16=fgp_dual_bf16,
        fgp_opt=fgp_opt,
        interleave=interleave,
    )
    return out.reshape(out.shape[0], H * W).T


def _solve_pgm_tv_fused_stencil(
    solver, B_mat, interpret, method, restart, rel_tol, warm_tv=False,
    fgp_unroll=False, fgp_dual_bf16=False, fgp_opt=None,
):
    """Stencil-gram variant of the fused solve (see solve_pgm_tv_fused):
    exact f32 VPU stencils instead of the compensated MXU matmuls — used
    for images whose width is not 128-aligned."""
    sigma_fac = float(getattr(solver, "sigma_fac", 1.0))
    op = solver.AHA.A
    reg = solver.reg
    H, W = op.im_shape
    taps = op.taps_hw()
    B_mat = jnp.asarray(B_mat)
    bt = B_mat.T
    if solver.A is op:
        x0hat_b = jax.vmap(op.rmv_stencil)(bt).reshape(-1, H, W)
    else:
        x0hat_b = jax.vmap(solver.A.rmv)(bt).reshape(-1, H, W)
    from ..models.regularization import normalization_factor

    scale = jax.vmap(
        lambda b: normalization_factor(solver.normalize_reg, solver.A, b)
    )(bt)
    lam_eff = reg.get_lam() * scale
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dummy = jnp.zeros((1, 1), jnp.float32)  # factor slots unused by stencil
    out = fista_tv_fused(
        x0hat_b,
        dummy,
        dummy,
        solver.rho,
        lam_eff,
        solver.iterations,
        reg.iterations_tv,
        interpret=interpret,
        method=method,
        gram="stencil",
        taps=taps,
        restart=restart,
        rel_tol=rel_tol,
        sigma_fac=sigma_fac,
        warm_tv=warm_tv,
        fgp_unroll=fgp_unroll,
        fgp_dual_bf16=fgp_dual_bf16,
        fgp_opt=fgp_opt,
    )
    return out.reshape(out.shape[0], H * W).T
