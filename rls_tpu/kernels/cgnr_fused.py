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
  is FULLY compensated (all four hi/lo cross products as two stacked
  matmuls — see `_mm_comp`; Krylov recurrences amplify the lo·lo term
  the cheaper 3-term form drops) — f32-accurate on a bf16-input MXU;
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


def _mm_comp(x, m2, out_cols: int):
    """FULLY compensated ``x @ M`` with M pre-split column-stacked
    ``[hi | lo]`` (m2: (in, 2·out)): both the hi AND lo parts of x hit
    both halves — all FOUR cross products. The usual 3-term form drops
    lo·lo (~2⁻¹⁶ relative), which is harmless in the self-correcting
    prox-gradient kernels but gets amplified by Krylov recurrences
    (measured: 3-term CGNR drifted to 3e-2 at cond≈1e2 over 20
    iterations where the composed f32 path held 2e-5; 4-term matches).
    Both operands of every MXU matmul are exactly bf16-representable, so
    the result is the same on bf16-rounding MXUs and f32-native
    backends."""
    xh, xl = split_bf16(x)
    hi = jnp.dot(xh, m2, preferred_element_type=jnp.float32)
    lo = jnp.dot(xl, m2, preferred_element_type=jnp.float32)
    return (
        hi[:, :out_cols]
        + hi[:, out_cols:]
        + lo[:, :out_cols]
        + lo[:, out_cols:]
    )


def chunked_batch_run(run, p_max: int, *arrays):
    """Run `run(*chunks)` over row-chunks of `arrays` (≤ p_max rows per
    call) and concatenate the results along axis 0. `run` may return one
    array or a tuple of arrays; single-call when everything fits."""
    P = arrays[0].shape[0]
    if P <= p_max:
        return run(*arrays)
    parts = [
        run(*(a[i : i + p_max] for a in arrays))
        for i in range(0, P, p_max)
    ]
    if isinstance(parts[0], tuple):
        return tuple(
            jnp.concatenate([pr[k] for pr in parts], axis=0)
            for k in range(len(parts[0]))
        )
    return jnp.concatenate(parts, axis=0)


def _kernel(
    lam_ref,  # VMEM (P, 1) per-problem effective λ
    b_ref,  # VMEM (P, m)
    mf2_ref,  # VMEM (n, 2m) [Aᵀ_hi | Aᵀ_lo] — forward factor
    ma2_ref,  # VMEM (m, 2n) [A_hi | A_lo] — adjoint factor
    x_out,  # VMEM (P, n)
    *,
    steps: int,
    m: int,
    n: int,
    prox: str,
):
    lam = lam_ref[...]
    mf2 = mf2_ref[...]
    ma2 = ma2_ref[...]

    # r₀ = Aᴴ b (x₀ = 0); p₀ = r₀ — derived from loaded data (Mosaic will
    # not relayout a splatted constant into a loop carry)
    r0 = _mm_comp(b_ref[...], ma2, n)
    x0 = r0 * 0.0

    def body(_, carry):
        x, r, p = carry
        q = _mm_comp(p, mf2, m)  # A p
        v = _mm_comp(q, ma2, n)  # Aᴴ A p
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
    if jnp.issubdtype(solver.A.mat.dtype, jnp.complexfloating):
        m, n = 2 * m, 2 * n  # split-real embedding doubles both dims
    # both pre-split [hi | lo] factors (4mn floats) + per-problem-plane
    # headroom must fit the scoped-VMEM budget
    if 4 * m * n * 4 + 2 * 1024 * 1024 > _VMEM_BUDGET_BYTES:
        raise ValueError(
            f"fused CGNR factors for a {m}x{n} matrix (~{4*m*n*4/2**20:.0f}"
            " MiB) exceed VMEM; use the scan path"
        )
    if any(isinstance(r, PositiveRegularization) for r in solver.constr):
        return "positive"
    return "none"  # Real projection is the identity on real systems


def solve_cgnr_fused(
    solver, B_mat, interpret: bool | None = None, batch_chunk: int | None = None
):
    """Drop-in fast path for ``solve_batched_unrolled(solver, B)`` on a
    dense CGNR solver: the whole batch of K-iteration CG solves runs as
    ONE Pallas call (columns of ``B_mat`` are problems; returns n × K).

    Complex systems (complex A and/or complex b) ride the exact
    split-real embedding M = [[Re A, −Im A], [Im A, Re A]], x̃ = [Re x;
    Im x]: complex CGNR's recurrences coincide step-for-step with real
    CG on the embedded normal equations (ζ, α, β are the same real
    scalars — AᴴA is Hermitian so every inner product is real), and the
    final Real/Positive projections (applied once at convergence,
    reference CGNR.jl:144-148) are applied to the reassembled complex
    iterate outside the kernel.
    """
    prox = check_cgnr_fused(solver)
    from ..models.regularization import normalization_factor

    mat0 = jnp.asarray(solver.A.mat)
    B_mat = jnp.asarray(B_mat)
    if B_mat.shape[0] != mat0.shape[0]:
        raise ValueError(
            f"B has {B_mat.shape[0]} rows, operator expects {mat0.shape[0]}"
        )
    is_cplx = jnp.issubdtype(mat0.dtype, jnp.complexfloating) or jnp.issubdtype(
        B_mat.dtype, jnp.complexfloating
    )
    # λ scale comes from the ORIGINAL operator/b (not the embedding)
    lam0 = jnp.real(jnp.asarray(solver.l2.get_lam(), jnp.float32))
    scale = jax.vmap(
        lambda col: normalization_factor(solver.normalize_reg, solver.A, col)
    )(B_mat.T)
    if is_cplx:
        n_c = mat0.shape[1]
        ar = jnp.real(mat0).astype(jnp.float32)
        ai = (
            jnp.imag(mat0).astype(jnp.float32)
            if jnp.issubdtype(mat0.dtype, jnp.complexfloating)
            else jnp.zeros_like(ar)
        )
        mat = jnp.block([[ar, -ai], [ai, ar]])  # (2m, 2n)
        # the check only sees the solver; a real A + complex b reaches
        # the embedding anyway, so re-gate the 4x-larger factors here
        # (graceful ValueError instead of a Mosaic VMEM OOM)
        if 4 * (2 * ar.shape[0]) * (2 * ar.shape[1]) * 4 + 2 * 1024 * 1024 > (
            _VMEM_BUDGET_BYTES
        ):
            raise ValueError(
                "fused CGNR split-real embedding factors for a "
                f"{ar.shape[0]}x{ar.shape[1]} system with complex data "
                "exceed VMEM; use the scan path"
            )
        bt = jnp.concatenate(
            [jnp.real(B_mat).T, jnp.imag(B_mat).T], axis=1
        ).astype(jnp.float32)  # (P, 2m)
        prox = "none"  # projections act on the complex iterate, post-kernel
    else:
        mat = mat0.astype(jnp.float32)
        bt = B_mat.astype(jnp.float32).T  # (P, m)
    m, n = mat.shape
    P = bt.shape[0]
    lam = (lam0 * jnp.real(jnp.asarray(scale)).astype(jnp.float32)).reshape(
        P, 1
    )

    at_hi, at_lo = split_bf16(mat.T)
    a_hi, a_lo = split_bf16(mat)
    mf2 = jnp.concatenate([at_hi, at_lo], axis=1)  # (n, 2m)
    ma2 = jnp.concatenate([a_hi, a_lo], axis=1)  # (m, 2n)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # batch chunking: x/r/p/q live planes + b + out per problem must fit
    # beside the factors; oversized batches run as several kernel calls
    per_problem = (4 * n + 2 * m) * 4
    p_max = (
        batch_chunk
        if batch_chunk is not None
        else max(
            1, (_VMEM_BUDGET_BYTES - 4 * m * n * 4) // max(per_problem, 1)
        )
    )

    def run(lam_c, bt_c):
        return pl.pallas_call(
            functools.partial(
                _kernel, steps=solver.total_steps, m=m, n=n, prox=prox
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bt_c.shape[0], n), jnp.float32),
            interpret=interpret,
        )(lam_c, bt_c, mf2, ma2)

    x = chunked_batch_run(run, p_max, lam, bt)
    if is_cplx:
        dt_c = (
            mat0.dtype
            if jnp.issubdtype(mat0.dtype, jnp.complexfloating)
            else B_mat.dtype
        )
        xc = (x[:, :n_c] + 1j * x[:, n_c:]).astype(dt_c)
        for rg in solver.constr:  # finalize projections, reference order
            xc = jax.vmap(rg.prox)(xc)
        return xc.T
    return x.T
