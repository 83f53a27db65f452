"""Fused whole-solve proximal-gradient (FISTA/OptISTA/POGM) kernel for
dense systems.

The reference's canonical solver tests run FISTA/OptISTA/POGM on small
dense random systems (/root/reference/test/testSolvers.jl:15-60); on the
composed path every iteration is a handful of tiny dispatch-bound XLA
ops. This kernel runs the ENTIRE K-iteration accelerated proximal
gradient loop in ONE Pallas call, the dense sibling of
`fista_tv_fused` and the PGM sibling of `cgnr_fused`:

* problems ride the SUBLANE axis, features the LANE axis; the normal-op
  matvec is two FULLY-compensated (4-term hi/lo) MXU matmuls on
  VMEM-resident pre-split factors (Krylov-grade accuracy — see
  `cgnr_fused._mm_comp`);
* FISTA's θ momentum recurrence runs per problem in f32 — EXACTLY the
  composed `FISTA.step` scalar path (fista.py:135-171; reference
  FISTA.jl:144-176), so gradient restart (θ ← 1 on an obtuse
  res·(x−x_prev) angle, or the composite gradient-mapping variant) is
  one lane reduction per iteration; OptISTA and POGM (restart="none")
  ride the shared f64-precomputed momentum table
  (`fista_tv_fused._momentum_table` + `_pgm_loop` — semantics
  optista.py/pogm.py, reference OptISTA.jl:145-199 / POGM.jl:189-219);
* the prox (complex-safe L1 soft threshold / L2 shrinkage, reference
  ProxL1.jl:18-22 / ProxL2.jl) and the Positive/Real projections run
  in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops._precise import split_bf16
from .cgnr_fused import _mm_comp, chunked_batch_run
from .fista_tv_fused import _momentum_table, _pgm_loop

__all__ = ["check_pgm_dense_fused", "solve_pgm_dense_fused"]

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _kernel(
    tab_ref,  # SMEM (steps, 4): momentum schedule (OptISTA/POGM only)
    scal_ref,  # VMEM (P, 3): per-problem [lam_eff, rho, theta0]
    b_ref,  # VMEM (P, m)
    mf2_ref,  # VMEM (n, 2m) [Aᵀ_hi | Aᵀ_lo]
    ma2_ref,  # VMEM (m, 2n) [A_hi | A_lo]
    x_out,  # VMEM (P, n)
    *,
    steps: int,
    m: int,
    n: int,
    method: str,  # "fista" | "optista" | "pogm"
    reg_kind: str,  # "l1" | "l2"
    restart: str,  # "none" | "gradient" | "gradient_mapping"
    prox: str,  # "none" | "positive"
):
    lam = scal_ref[:, 0:1]
    rho = scal_ref[:, 1:2]
    th0 = scal_ref[:, 2:3]
    mf2 = mf2_ref[...]
    ma2 = ma2_ref[...]

    x0hat = _mm_comp(b_ref[...], ma2, n)  # Aᴴ b
    x_init = x0hat * 0.0
    eps = jnp.asarray(jnp.finfo(jnp.float32).eps, jnp.float32)

    if method != "fista":
        # OptISTA/POGM ride the shared f64-table loop (fista_tv_fused
        # _pgm_loop, semantics = optista.py/pogm.py step); the prox
        # callable covers L1/L2 (+ POGM's post-prox projections —
        # OptISTA applies none in-step, the check rejects them)
        def normal(v):
            return _mm_comp(_mm_comp(v, mf2, m), ma2, n)

        def prox_fn(xg, lam_s):
            if reg_kind == "l1":
                mag = jnp.abs(xg)
                x = jnp.maximum(mag - lam_s, 0.0) * (xg + eps) / (mag + eps)
            else:
                x = xg / (1.0 + 2.0 * lam_s)
            if prox == "positive":
                x = jnp.maximum(x, 0.0)
            return x

        x_out[...] = _pgm_loop(
            normal, prox_fn, tab_ref, rho, lam, x0hat, steps, method
        )
        return

    def body(_, carry):
        x, x_old, theta, theta_old = carry
        # momentum (FISTA.jl:144-148)
        alpha = (theta_old - 1.0) / theta
        xm = x + alpha * (x - x_old)
        x_prev = x
        # normal-op residual + gradient step (FISTA.jl:152-154)
        res = _mm_comp(_mm_comp(xm, mf2, m), ma2, n) - x0hat
        xg = xm - rho * res
        # prox (FISTA.jl:164-168)
        rl = rho * lam
        if reg_kind == "l1":
            mag = jnp.abs(xg)
            x = jnp.maximum(mag - rl, 0.0) * (xg + eps) / (mag + eps)
        else:  # l2 shrinkage
            x = xg / (1.0 + 2.0 * rl)
        if prox == "positive":
            x = jnp.maximum(x, 0.0)
        # gradient restart (FISTA.jl:171-176; fista.py step for the
        # composite gradient-mapping variant)
        if restart == "gradient":
            obtuse = jnp.sum(res * (x - x_prev), axis=1, keepdims=True) > 0
            theta = jnp.where(obtuse, 1.0, theta)
        elif restart == "gradient_mapping":
            obtuse = jnp.sum((xm - x) * (x - x_prev), axis=1, keepdims=True) > 0
            theta = jnp.where(obtuse, 1.0, theta)
        theta_old_new = theta
        theta_new = (1.0 + jnp.sqrt(1.0 + 4.0 * theta_old_new**2)) / 2.0
        return (x, x_prev, theta_new, theta_old_new)

    x, _, _, _ = lax.fori_loop(
        0, steps, body, (x_init, x_init, th0, th0)
    )
    x_out[...] = x


def _kernel_cplx(
    tab_ref,  # SMEM (steps, 4): momentum schedule (OptISTA/POGM only)
    scal_ref,  # VMEM (P, 3): per-problem [lam_eff, rho, theta0]
    br_ref,  # VMEM (P, m) Re b
    bi_ref,  # VMEM (P, m) Im b
    fr2_ref,  # VMEM (n, 2m) [Arᵀ_hi | Arᵀ_lo] — forward real factor
    fi2_ref,  # VMEM (n, 2m) [Aiᵀ_hi | Aiᵀ_lo] — forward imag factor
    ar2_ref,  # VMEM (m, 2n) [Ar_hi | Ar_lo] — adjoint real factor
    ai2_ref,  # VMEM (m, 2n) [Ai_hi | Ai_lo] — adjoint imag factor
    xr_out,  # VMEM (P, n)
    xi_out,  # VMEM (P, n)
    *,
    steps: int,
    m: int,
    n: int,
    method: str,
    reg_kind: str,
    restart: str,
    prox: str,
):
    """Complex variant of the dense PGM kernel: the iterate lives as
    separate re/im planes (no lane-dim concats — Mosaic-safe at any n),
    every A/Aᴴ apply is four fully-compensated real matmuls with the
    complex multiply pattern, the L1 prox is the complex-safe GROUP soft
    threshold over the plane pair (ProxL1.jl:18-22), and the restart dot
    is the real part of the complex inner product (both planes summed).
    """
    lam = scal_ref[:, 0:1]
    rho = scal_ref[:, 1:2]
    th0 = scal_ref[:, 2:3]
    fr2 = fr2_ref[...]
    fi2 = fi2_ref[...]
    ar2 = ar2_ref[...]
    ai2 = ai2_ref[...]

    def fwd(xr, xi):  # A x (unconjugated)
        qr = _mm_comp(xr, fr2, m) - _mm_comp(xi, fi2, m)
        qi = _mm_comp(xr, fi2, m) + _mm_comp(xi, fr2, m)
        return qr, qi

    def adj(qr, qi):  # Aᴴ q (conjugate transpose)
        vr = _mm_comp(qr, ar2, n) + _mm_comp(qi, ai2, n)
        vi = _mm_comp(qi, ar2, n) - _mm_comp(qr, ai2, n)
        return vr, vi

    x0r, x0i = adj(br_ref[...], bi_ref[...])  # Aᴴ b
    zr = x0r * 0.0
    eps = jnp.asarray(jnp.finfo(jnp.float32).eps, jnp.float32)

    def prox_pair(gr, gi, lam_s):
        if reg_kind == "l1":
            mag = jnp.sqrt(gr * gr + gi * gi)
            sc = jnp.maximum(mag - lam_s, 0.0) / (mag + eps)
            pr_, pi_ = sc * (gr + eps), sc * gi
        else:
            pr_, pi_ = gr / (1.0 + 2.0 * lam_s), gi / (1.0 + 2.0 * lam_s)
        if prox == "positive":
            pr_ = jnp.maximum(pr_, 0.0)
            pi_ = pi_ * 0.0
        elif prox == "real":
            pi_ = pi_ * 0.0
        return pr_, pi_

    def residual(xr, xi):
        qr, qi = fwd(xr, xi)
        rr, ri = adj(qr, qi)
        return rr - x0r, ri - x0i

    if method != "fista":
        # table-driven OptISTA/POGM on plane pairs — the complex twin of
        # fista_tv_fused._pgm_loop (semantics optista.py/pogm.py step)
        def body_tab(i, carry):
            xr, xi, m1r, m1i, m2r, m2i = carry
            a = tab_ref[i, 0]
            bcoef = tab_ref[i, 1]
            g = tab_ref[i, 2]
            e = tab_ref[i, 3]
            rr, ri = residual(xr, xi)
            if method == "optista":  # m1 = y, m2 = z
                ynr, yni = prox_pair(
                    m1r - (rho * g) * rr, m1i - (rho * g) * ri,
                    (rho * g) * lam,
                )
                znr = xr + (ynr - m1r) * e
                zni = xi + (yni - m1i) * e
                xnr = (1.0 + a + bcoef) * znr - a * m2r - bcoef * xr
                xni = (1.0 + a + bcoef) * zni - a * m2i - bcoef * xi
                return (xnr, xni, ynr, yni, znr, zni)
            # pogm: m1 = y, m2 = x_mid
            ynr = xr - rho * rr
            yni = xi - rho * ri
            xmr = (1.0 + a + bcoef) * ynr - a * m1r - (bcoef + e) * xr + e * m2r
            xmi = (1.0 + a + bcoef) * yni - a * m1i - (bcoef + e) * xi + e * m2i
            xnr, xni = prox_pair(xmr, xmi, (rho * g) * lam)
            return (xnr, xni, ynr, yni, xmr, xmi)

        xr, xi, *_ = lax.fori_loop(
            0, steps, body_tab, (zr, zr, zr, zr, zr, zr)
        )
        xr_out[...] = xr
        xi_out[...] = xi
        return

    def body(_, carry):
        xr, xi, xro, xio, theta, theta_old = carry
        alpha = (theta_old - 1.0) / theta
        ymr = xr + alpha * (xr - xro)
        ymi = xi + alpha * (xi - xio)
        rr, ri = residual(ymr, ymi)
        nxr, nxi = prox_pair(ymr - rho * rr, ymi - rho * ri, rho * lam)
        if restart == "gradient":
            dot = jnp.sum(
                rr * (nxr - xr) + ri * (nxi - xi), axis=1, keepdims=True
            )
            theta = jnp.where(dot > 0, 1.0, theta)
        elif restart == "gradient_mapping":
            dot = jnp.sum(
                (ymr - nxr) * (nxr - xr) + (ymi - nxi) * (nxi - xi),
                axis=1,
                keepdims=True,
            )
            theta = jnp.where(dot > 0, 1.0, theta)
        theta_old_new = theta
        theta_new = (1.0 + jnp.sqrt(1.0 + 4.0 * theta_old_new**2)) / 2.0
        return (nxr, nxi, xr, xi, theta_new, theta_old_new)

    xr, xi, *_ = lax.fori_loop(
        0, steps, body, (zr, zr, zr, zr, th0, th0)
    )
    xr_out[...] = xr
    xi_out[...] = xi


def check_pgm_dense_fused(solver):
    """Validate `solver` for the fused dense FISTA kernel (raises
    ValueError naming the unsupported piece)."""
    from ..models.prox import (
        L1Regularization,
        L2Regularization,
        PositiveRegularization,
        RealRegularization,
    )
    from ..models.solvers.fista import FISTA
    from ..models.solvers.optista import OptISTA
    from ..models.solvers.pogm import POGM
    from ..ops.base import DenseOperator, NormalOperator

    if isinstance(solver, FISTA):
        method = "fista"
    elif isinstance(solver, OptISTA):
        method = "optista"
    elif isinstance(solver, POGM):
        method = "pogm"
    else:
        raise ValueError(
            "fused dense PGM path covers FISTA/OptISTA/POGM solvers"
        )
    if solver.A is None or not isinstance(solver.A, DenseOperator):
        raise ValueError("fused dense PGM path requires a dense operator A")
    is_cplx = jnp.issubdtype(solver.A.mat.dtype, jnp.complexfloating)
    if not (
        isinstance(solver.AHA, NormalOperator)
        and solver.AHA.A is solver.A
        and solver.AHA.weights is None
    ):
        raise ValueError(
            "fused dense PGM path requires the default AHA = AᴴA normal "
            "operator"
        )
    if type(solver.reg) is L1Regularization:
        kind = "l1"
    elif type(solver.reg) is L2Regularization:
        kind = "l2"
    else:
        raise ValueError(
            "fused dense PGM path supports plain L1/L2 regularization, got "
            f"{type(solver.reg).__name__}"
        )
    if jnp.ndim(solver.reg.get_lam()) != 0:
        raise ValueError("fused dense PGM path requires a scalar λ")
    restart = getattr(solver, "restart", "none")
    if method == "fista":
        if restart not in ("none", "gradient", "gradient_mapping"):
            raise ValueError(f"unsupported restart {restart}")
    elif restart != "none":
        raise ValueError(
            "dense OptISTA/POGM ride the fixed f64 momentum table; "
            "restart needs the composed path"
        )
    if isinstance(getattr(solver, "theta", 1.0), jax.core.Tracer):
        raise ValueError(
            "fused dense PGM path needs a concrete theta (the f64 "
            "momentum table is precomputed host-side)"
        )
    for p in solver.proj:
        if not isinstance(p, (PositiveRegularization, RealRegularization)):
            raise ValueError(
                "fused dense PGM path supports only Positive/Real "
                f"projections, got {type(p).__name__}"
            )
    if method == "optista" and solver.proj:
        raise ValueError(
            "OptISTA applies no projection terms in-step (optista.py); "
            "use the composed path"
        )
    m, n = solver.A.mat.shape
    fac = 8 if is_cplx else 4  # complex: re+im factor pairs, both sides
    if fac * m * n * 4 + 2 * 1024 * 1024 > _VMEM_BUDGET_BYTES:
        raise ValueError(
            f"fused dense PGM factors for a {m}x{n} matrix exceed VMEM; "
            "use the composed path"
        )
    if any(isinstance(p, PositiveRegularization) for p in solver.proj):
        prox = "positive"
    elif is_cplx and any(
        isinstance(p, RealRegularization) for p in solver.proj
    ):
        prox = "real"  # zeroes the imaginary plane — not an identity here
    else:
        prox = "none"
    return method, kind, prox


def solve_pgm_dense_fused(
    solver, B_mat, interpret: bool | None = None, batch_chunk: int | None = None
):
    """Drop-in fast path for ``solve_batched_unrolled(solver, B)`` on a
    real dense FISTA solver (columns of ``B_mat`` are problems; returns
    n × K)."""
    from ..models.regularization import normalization_factor

    method, kind, prox = check_pgm_dense_fused(solver)
    mat0 = jnp.asarray(solver.A.mat)
    B_mat = jnp.asarray(B_mat)
    is_cplx = jnp.issubdtype(mat0.dtype, jnp.complexfloating) or jnp.issubdtype(
        B_mat.dtype, jnp.complexfloating
    )
    m, n = mat0.shape
    if B_mat.shape[0] != m:
        raise ValueError(f"B has {B_mat.shape[0]} rows, operator expects {m}")
    if is_cplx:
        # covers complex A AND the real-A/complex-b case (the plane
        # kernel with Im A = 0 — the planes still couple through the
        # joint momentum/restart scalars, so plane-stacking would be
        # wrong and plain casting would silently drop Im b)
        if prox == "none":
            # the check saw only A; with a REAL A and complex b the Real
            # projection is NOT the identity (it zeroes the imag plane)
            from ..models.prox import RealRegularization

            if any(isinstance(pp, RealRegularization) for pp in solver.proj):
                prox = "real"
        return _solve_cplx(
            solver, B_mat, method, kind, prox, interpret, batch_chunk
        )
    mat = mat0.astype(jnp.float32)
    bt = B_mat.astype(jnp.float32).T  # (P, m)
    P = bt.shape[0]

    scale = jax.vmap(
        lambda col: normalization_factor(solver.normalize_reg, solver.A, col)
    )(bt)
    lam_eff = jnp.real(jnp.asarray(solver.reg.get_lam(), jnp.float32)) * (
        jnp.asarray(scale, jnp.float32)
    )
    scal = jnp.stack(
        [
            jnp.broadcast_to(lam_eff.reshape(-1), (P,)),
            jnp.broadcast_to(
                jnp.asarray(solver.rho, jnp.float32).reshape(-1), (P,)
            ),
            jnp.broadcast_to(
                jnp.asarray(solver.theta, jnp.float32).reshape(-1), (P,)
            ),
        ],
        axis=1,
    )

    at_hi, at_lo = split_bf16(mat.T)
    a_hi, a_lo = split_bf16(mat)
    mf2 = jnp.concatenate([at_hi, at_lo], axis=1)
    ma2 = jnp.concatenate([a_hi, a_lo], axis=1)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    per_problem = (5 * n + m) * 4  # x/x_old/xm/res live planes + b
    p_max = (
        batch_chunk
        if batch_chunk is not None
        else max(
            1, (_VMEM_BUDGET_BYTES - 4 * m * n * 4) // max(per_problem, 1)
        )
    )

    steps = solver.total_steps
    if method == "fista":
        tab = jnp.zeros((1, 4), jnp.float32)  # unused dummy
    else:
        tab = jnp.asarray(
            _momentum_table(method, steps, float(solver.theta))
        )

    def run(scal_c, bt_c):
        return pl.pallas_call(
            functools.partial(
                _kernel,
                steps=steps,
                m=m,
                n=n,
                method=method,
                reg_kind=kind,
                restart=getattr(solver, "restart", "none"),
                prox=prox,
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bt_c.shape[0], n), jnp.float32),
            interpret=interpret,
        )(tab, scal_c, bt_c, mf2, ma2)

    x = chunked_batch_run(run, p_max, scal, bt)
    return x.T


def _solve_cplx(solver, B_mat, method, kind, prox, interpret, batch_chunk):
    """Complex dense PGM via the separate-plane kernel (_kernel_cplx)."""
    from ..models.regularization import normalization_factor

    mat0 = jnp.asarray(solver.A.mat)
    m, n = mat0.shape
    B_mat = B_mat.astype(jnp.complex64)
    bt = B_mat.T  # (P, m) complex
    P = bt.shape[0]
    scale = jax.vmap(
        lambda col: normalization_factor(solver.normalize_reg, solver.A, col)
    )(bt)
    lam_eff = jnp.real(jnp.asarray(solver.reg.get_lam(), jnp.float32)) * (
        jnp.real(jnp.asarray(scale)).astype(jnp.float32)
    )
    scal = jnp.stack(
        [
            jnp.broadcast_to(lam_eff.reshape(-1), (P,)),
            jnp.broadcast_to(
                jnp.real(jnp.asarray(solver.rho)).astype(jnp.float32).reshape(-1),
                (P,),
            ),
            jnp.broadcast_to(
                jnp.asarray(solver.theta, jnp.float32).reshape(-1), (P,)
            ),
        ],
        axis=1,
    )
    ar = jnp.real(mat0).astype(jnp.float32)
    ai = jnp.imag(mat0).astype(jnp.float32)

    def cat2(v, axis):
        hi, lo = split_bf16(v)
        return jnp.concatenate([hi, lo], axis=axis)

    fr2 = cat2(ar.T, 1)  # (n, 2m)
    fi2 = cat2(ai.T, 1)
    ar2 = cat2(ar, 1)  # (m, 2n)
    ai2 = cat2(ai, 1)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    if method == "fista":
        tab = jnp.zeros((1, 4), jnp.float32)  # unused dummy
    else:
        tab = jnp.asarray(
            _momentum_table(method, solver.total_steps, float(solver.theta))
        )

    per_problem = (10 * n + 4 * m) * 4  # plane pairs of x/x_old/y/res + b
    p_max = (
        batch_chunk
        if batch_chunk is not None
        else max(
            1, (_VMEM_BUDGET_BYTES - 8 * m * n * 4) // max(per_problem, 1)
        )
    )

    def run(scal_c, br_c, bi_c):
        return pl.pallas_call(
            functools.partial(
                _kernel_cplx,
                steps=solver.total_steps,
                m=m,
                n=n,
                method=method,
                reg_kind=kind,
                restart=getattr(solver, "restart", "none"),
                prox=prox,
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((br_c.shape[0], n), jnp.float32),
                jax.ShapeDtypeStruct((br_c.shape[0], n), jnp.float32),
            ),
            interpret=interpret,
        )(tab, scal_c, br_c, bi_c, fr2, fi2, ar2, ai2)

    br = jnp.real(bt).astype(jnp.float32)
    bi = jnp.imag(bt).astype(jnp.float32)
    xr, xi = chunked_batch_run(run, p_max, scal, br, bi)
    return (xr + 1j * xi).astype(jnp.complex64).T
