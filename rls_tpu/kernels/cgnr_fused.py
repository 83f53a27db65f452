"""Fused whole-solve CGNR Pallas kernel for dense systems.

The composed CGNR path (models/solvers/cgnr.py, reference CGNR.jl) runs
one XLA op sequence per iteration — for small dense systems (the
BASELINE `cgnr_l2_dense64` config: 64×64, 64 effective iterations) that
is hundreds of tiny dispatch-bound HBM round-trips. This kernel runs the
ENTIRE K-iteration CG recurrence on the normal equations in ONE Pallas
call:

* the whole batch is solved at once — problems ride the SUBLANE axis,
  features the LANE axis, so every matvec is a real (P, n)·(n, m) MXU
  matmul and every per-problem dot a lane reduction;
* both matvec factors (Aᵀ for the forward, A for the adjoint) sit
  VMEM-resident as pre-split ``[hi | lo]`` bf16 pairs, and every matmul
  is compensated in the concat-free 2-matmul form (see
  `_fgp_common.make_gram_normal_noconcat`) — f32-accurate Krylov
  recurrences on a bf16-input MXU;
* the division guards match `CGNR.step` exactly (identity step once CG
  has terminated), so the kernel reproduces `solve_batched_unrolled`
  bit-for-bit in exact arithmetic — including running the fixed
  ``total_steps = min(iterations, n)`` schedule;
* the final Positive/Real projections (reference CGNR.jl:144-148) are
  applied in-kernel.

Semantics: CGNR.jl:105-143 via models/solvers/cgnr.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops._precise import split_bf16

__all__ = ["check_cgnr_fused", "solve_cgnr_fused"]

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _mm_comp(x, m2, mh, out_cols: int):
    """Compensated ``x @ M`` with M pre-split column-stacked ``[hi | lo]``
    (m2: (in, 2·out)) and ``mh`` the hi half alone. Both operands of every
    MXU matmul are exactly bf16-representable, so the result is the same
    on bf16-rounding MXUs and f32-native backends."""
    xh, xl = split_bf16(x)
    m2out = jnp.dot(xh, m2, preferred_element_type=jnp.float32)
    corr = jnp.dot(xl, mh, preferred_element_type=jnp.float32)
    return m2out[:, :out_cols] + m2out[:, out_cols:] + corr


def _kernel(
    lam_ref,  # VMEM (P, 1) per-problem effective λ
    b_ref,  # VMEM (P, m)
    mf2_ref,  # VMEM (n, 2m) [Aᵀ_hi | Aᵀ_lo] — forward factor
    mfh_ref,  # VMEM (n, m)  Aᵀ_hi
    ma2_ref,  # VMEM (m, 2n) [A_hi | A_lo] — adjoint factor
    mah_ref,  # VMEM (m, n)  A_hi
    x_out,  # VMEM (P, n)
    *,
    steps: int,
    m: int,
    n: int,
    prox: str,
):
    lam = lam_ref[...]
    mf2 = mf2_ref[...]
    mfh = mfh_ref[...]
    ma2 = ma2_ref[...]
    mah = mah_ref[...]

    # r₀ = Aᴴ b (x₀ = 0); p₀ = r₀ — derived from loaded data (Mosaic will
    # not relayout a splatted constant into a loop carry)
    r0 = _mm_comp(b_ref[...], ma2, mah, n)
    x0 = r0 * 0.0

    def body(_, carry):
        x, r, p = carry
        q = _mm_comp(p, mf2, mfh, m)  # A p
        v = _mm_comp(q, ma2, mah, n)  # Aᴴ A p
        zeta = jnp.sum(r * r, axis=1, keepdims=True)
        pv = jnp.sum(p * v, axis=1, keepdims=True)
        pp = jnp.sum(p * p, axis=1, keepdims=True)
        denom = pv + lam * pp
        # guarded divisions — identical to CGNR.step: identity step at
        # exact convergence so the fixed-step schedule is harmless
        alpha = jnp.where(
            zeta > 0, zeta / jnp.where(denom == 0.0, 1.0, denom), 0.0
        )
        x = x + alpha * p
        r = r - alpha * v - (lam * alpha) * p
        znew = jnp.sum(r * r, axis=1, keepdims=True)
        beta = znew / jnp.where(zeta > 0, zeta, 1.0)
        p = r + beta * p
        return (x, r, p)

    x, _, _ = lax.fori_loop(0, steps, body, (x0, r0, r0))
    if prox == "positive":
        x = jnp.maximum(x, 0.0)
    x_out[...] = x


def check_cgnr_fused(solver):
    """Validate `solver` for the fused whole-solve CGNR kernel (raises
    ValueError naming the unsupported piece)."""
    from ..models.prox import PositiveRegularization
    from ..models.solvers.cgnr import CGNR
    from ..ops.base import DenseOperator, NormalOperator

    if not isinstance(solver, CGNR):
        raise ValueError("fused CGNR path requires a CGNR solver")
    if solver.A is None or not isinstance(solver.A, DenseOperator):
        raise ValueError("fused CGNR path requires a dense operator A")
    if jnp.issubdtype(solver.A.mat.dtype, jnp.complexfloating):
        raise ValueError(
            "fused CGNR path covers real systems only (complex systems: "
            "use the scan path or a split-real operator)"
        )
    if not (
        isinstance(solver.AHA, NormalOperator)
        and solver.AHA.A is solver.A
        and solver.AHA.weights is None
    ):
        raise ValueError(
            "fused CGNR path requires the default AHA = AᴴA normal "
            "operator (custom/weighted AHA: use the scan path)"
        )
    lam = solver.l2.get_lam()
    if jnp.ndim(lam) != 0:
        raise ValueError(
            "fused CGNR path requires a scalar L2 λ (vector-λ Tikhonov: "
            "use the scan path)"
        )
    m, n = solver.A.mat.shape
    # both pre-split factors (6mn floats) + double the per-problem planes
    # headroom must fit the scoped-VMEM budget
    if 6 * m * n * 4 + 2 * 1024 * 1024 > _VMEM_BUDGET_BYTES:
        raise ValueError(
            f"fused CGNR factors for a {m}x{n} matrix (~{6*m*n*4/2**20:.0f}"
            " MiB) exceed VMEM; use the scan path"
        )
    if any(isinstance(r, PositiveRegularization) for r in solver.constr):
        return "positive"
    return "none"  # Real projection is the identity on real systems


def solve_cgnr_fused(solver, B_mat, interpret: bool | None = None):
    """Drop-in fast path for ``solve_batched_unrolled(solver, B)`` on a
    real dense CGNR solver: the whole batch of K-iteration CG solves runs
    as ONE Pallas call (columns of ``B_mat`` are problems; returns n × K).
    """
    prox = check_cgnr_fused(solver)
    from ..models.regularization import normalization_factor

    mat = jnp.asarray(solver.A.mat, jnp.float32)
    m, n = mat.shape
    B_mat = jnp.asarray(B_mat, jnp.float32)
    if B_mat.shape[0] != m:
        raise ValueError(f"B has {B_mat.shape[0]} rows, operator expects {m}")
    bt = B_mat.T  # (P, m)
    P = bt.shape[0]

    lam0 = jnp.real(jnp.asarray(solver.l2.get_lam(), jnp.float32))
    scale = jax.vmap(
        lambda col: normalization_factor(solver.normalize_reg, solver.A, col)
    )(bt)
    lam = (lam0 * jnp.asarray(scale, jnp.float32)).reshape(P, 1)

    per_problem = P * (4 * n + 2 * m) * 4  # x/r/p/q live planes + b + out
    if 6 * m * n * 4 + per_problem > _VMEM_BUDGET_BYTES:
        raise ValueError(
            f"fused CGNR working set ~{(6*m*n*4 + per_problem)/2**20:.0f} "
            "MiB exceeds VMEM at this batch size; split the batch"
        )

    at_hi, at_lo = split_bf16(mat.T)
    a_hi, a_lo = split_bf16(mat)
    mf2 = jnp.concatenate([at_hi, at_lo], axis=1)  # (n, 2m)
    ma2 = jnp.concatenate([a_hi, a_lo], axis=1)  # (m, 2n)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    x = pl.pallas_call(
        functools.partial(
            _kernel, steps=solver.total_steps, m=m, n=n, prox=prox
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, n), jnp.float32),
        interpret=interpret,
    )(lam, bt, mf2, at_hi, ma2, a_hi)
    return x.T
