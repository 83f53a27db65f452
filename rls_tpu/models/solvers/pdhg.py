"""PDHG — Chambolle–Pock-style primal-dual solver.

Behavioral port of /root/reference/src/PrimalDualSolver.jl (disabled in the
reference's include list, RegularizedLeastSquares.jl:204, but part of its
API surface). Solves ½‖Ax − u‖² + λ R(Φx) with

  * dual data update  y₁ ← (y₁ + σ(Ax − u)) / (1 + σ)  (prox of ½‖·‖²∗)
  * dual reg update   y₂ ← prox_{σR∗}(y₂ + σ Φ x)
  * primal update     x ← x − τ(Aᴴy₁ + Φᴴy₂), then constraints

Conjugate proxes: L1 → elementwise clip to [−λ, λ] (reference ProxL1Conj);
TV → the reference's weighted 8-direction ProxTVConj, ported exactly
(`prox_tv_conj_8dir`, default `tv_scheme="8dir"` with the `Grad8Operator`
transform), with a cheaper standard anisotropic dual-ball projection over
the 2-plane directional gradient as the `tv_scheme="isotropic"` fallback
(auto-selected for non-2-D shapes and complex dtypes, which the
reference's real-only 2-D scheme cannot represent).

Convergence metric: primal-dual gap estimate as in the reference.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp

from ..._pytree import pytree_dataclass, replace, static_field
from ...ops.base import IdentityOperator, LinearOperator, as_operator
from ...ops.grad import Grad8Operator, GradientOperator
from ..prox import L1Regularization, TVRegularization
from ..regularization import NoNormalization, normalization_factor, sink
from .base import LinearSolver, split_projection_terms

__all__ = ["PDHG", "prox_tv_conj_8dir"]

# per-direction weights of the reference's ProxTVConj
# (PrimalDualSolver.jl:208-302): axial, diagonal, knight-move
_W8 = (
    5.0**0.5 - 2.0,  # p1, p2
    5.0**0.5 - 3.0 * 2.0**0.5 / 2.0,  # p3, p4
    (1.0 + 2.0**0.5 - 5.0**0.5) / 2.0,  # p5..p8
)


def prox_tv_conj_8dir(p, alpha, shape):
    """Exact port of the reference's weighted 8-direction TV conjugate prox
    (ProxTVConj, PrimalDualSolver.jl:208-302): directions are thresholded
    SEQUENTIALLY — direction k's pointwise group norm uses the already-
    thresholded p₁..p_{k−1} — with pₖ ← wₖ·sign(pₖ)·min(‖(p₁..p₈)‖₂, α).
    The reference's per-direction boundary re-clamps are provable no-ops
    (all wₖ ∈ (0, 1) make |pₖ| ≤ wₖ·α < α) and are therefore omitted.
    Real input only, like the reference solver."""
    m, n = shape
    planes = list(p.reshape(8, m, n))
    weights = (_W8[0], _W8[0], _W8[1], _W8[1], _W8[2], _W8[2], _W8[2], _W8[2])
    for k in range(8):
        gnorm = jnp.sqrt(sum(pl_ * pl_ for pl_ in planes))
        planes[k] = (
            weights[k] * jnp.sign(planes[k]) * jnp.minimum(gnorm, alpha)
        )
    return jnp.concatenate([pl_.reshape(-1) for pl_ in planes])


@pytree_dataclass
class PDHGState:
    u: Any
    x: Any
    y1: Any
    y2: Any
    gap: Any
    lam_scale: Any
    iteration: Any


@pytree_dataclass
class PDHG(LinearSolver):
    A: LinearOperator
    reg: Any
    trafo: LinearOperator
    proj: Tuple = ()
    sigma: Any = 1.0
    tau: Any = 1.0
    eps: Any = 1e-10
    normalize_reg: Any = NoNormalization()
    reg_kind: str = static_field(default="l1")  # "l1" | "tv"
    # "8dir": the reference's weighted 8-direction gradient + ProxTVConj
    # (exact parity); "isotropic": standard directional-gradient dual-ball
    # projection (cheaper, 2 planes instead of 8)
    tv_scheme: str = static_field(default="8dir")
    shape: tuple = static_field(default=None)
    iterations: int = static_field(default=10)

    @classmethod
    def create(
        cls,
        A,
        reg=None,
        normalize_reg=NoNormalization(),
        shape=None,
        iterations: int = 10,
        sigma=1.0,
        tau=None,
        eps=1e-10,
        enforce_real: bool = False,
        enforce_positive: bool = False,
        tv_scheme: str = "8dir",
        **_,
    ):
        from ..prox import PositiveRegularization, RealRegularization

        A_op = as_operator(A)
        n = A_op.in_size
        if reg is None:
            reg = L1Regularization(1e-4)
        params, proj = split_projection_terms(reg)
        if len(params) != 1:
            raise ValueError("PDHG expects exactly one parameterized reg term")
        term = params[0]
        core = sink(term)
        if isinstance(core, TVRegularization):
            reg_kind = "tv"
            shape = tuple(shape) if shape is not None else tuple(core.shape)
            # the reference's 8-direction scheme is strictly 2-D and real
            # (PrimalDualSolver.jl is real-matrix-only); fall back to the
            # isotropic projection for shapes/dtypes it cannot represent
            if tv_scheme == "8dir" and (
                len(shape) != 2
                or jnp.issubdtype(A_op.dtype, jnp.complexfloating)
            ):
                tv_scheme = "isotropic"
            if tv_scheme == "8dir":
                trafo = Grad8Operator(im_shape=shape, _dtype=A_op.dtype)
            else:
                trafo = GradientOperator(im_shape=shape, _dtype=A_op.dtype)
        elif isinstance(core, L1Regularization):
            reg_kind = "l1"
            shape = (n, 1)
            trafo = IdentityOperator(n, A_op.dtype)
        else:
            raise ValueError("PDHG supports L1 or TV regularization")
        extra = list(proj)
        if enforce_positive and enforce_real:
            extra.append(PositiveRegularization())
        elif enforce_real:
            extra.append(RealRegularization())
        if tau is None:
            # τσ·L² ≤ 1 with L = ‖[A; Φ]‖ estimated crudely by power iteration
            from ...utils.power_iterations import power_iterations

            L2 = power_iterations(
                lambda v: A_op.rmv(A_op.mv(v)) + trafo.rmv(trafo.mv(v)),
                n=n,
                dtype=A_op.dtype,
            )
            tau = 0.9 / (float(sigma) * float(L2))
        return cls(
            A=A_op,
            reg=term,
            trafo=trafo,
            proj=tuple(extra),
            sigma=sigma,
            tau=tau,
            eps=eps,
            normalize_reg=normalize_reg,
            reg_kind=reg_kind,
            tv_scheme=tv_scheme,
            shape=shape,
            iterations=iterations,
        )

    def init(self, b, x0=None) -> PDHGState:
        b = jnp.asarray(b)
        n = self.A.in_size
        x = (
            jnp.broadcast_to(jnp.asarray(x0, b.dtype), (n,))
            if x0 is not None
            else jnp.zeros((n,), b.dtype)
        )
        rdt = jnp.zeros((), b.dtype).real.dtype
        scale = normalization_factor(self.normalize_reg, self.A, b).astype(rdt)
        return PDHGState(
            u=b,
            x=x,
            y1=jnp.zeros((self.A.out_size,), b.dtype),
            y2=jnp.zeros((self.trafo.out_size,), b.dtype),
            gap=0.5 * jnp.linalg.norm(b) ** 2,
            lam_scale=scale,
            iteration=jnp.asarray(0, jnp.int32),
        )

    def _conj_prox(self, p, lam):
        if self.reg_kind == "tv" and self.tv_scheme == "8dir":
            # exact reference ProxTVConj (weighted 8-direction scheme)
            return prox_tv_conj_8dir(p, lam, self.shape)
        # elementwise projection onto the λ-ball — reference ProxL1Conj for
        # the l1 dual; for tv_scheme="isotropic" the same ANISOTROPIC
        # per-element clamp of the directional gradient stack (consistent
        # with the FGP prox's clamp; see docs/API_PARITY.md)
        mag = jnp.abs(p)
        return jnp.where(mag > lam, p / jnp.maximum(mag, 1e-30) * lam, p)

    def step(self, state: PDHGState) -> PDHGState:
        rdt = state.gap.dtype
        sigma = jnp.asarray(self.sigma, rdt)
        tau = jnp.asarray(self.tau, rdt)
        lam = (self.reg.get_lam() * state.lam_scale).astype(rdt)

        # dual updates
        y1 = (state.y1 + sigma.astype(state.y1.dtype) * (self.A.mv(state.x) - state.u)) / (
            1.0 + sigma
        ).astype(state.y1.dtype)
        y2 = self._conj_prox(
            state.y2 + sigma.astype(state.y2.dtype) * self.trafo.mv(state.x), lam
        )

        # primal update + constraints
        x = state.x - tau.astype(state.x.dtype) * (
            self.A.rmv(y1) + self.trafo.rmv(y2)
        )
        for p in self.proj:
            x = p.prox(x)

        # primal-dual gap exactly as the reference computes it
        # (PrimalDualSolver.jl:109): the reg term is λ·‖x‖₁ — the PRIMAL
        # variable's l1 norm, not the transformed one — for both reg kinds
        gap = jnp.abs(
            0.5 * jnp.linalg.norm(self.A.mv(x) - state.u) ** 2
            + lam * jnp.sum(jnp.abs(x))
            + 0.5 * jnp.linalg.norm(y1) ** 2
            + jnp.real(jnp.vdot(y1, state.u))
        ).astype(rdt)

        return replace(
            state, x=x, y1=y1, y2=y2, gap=gap, iteration=state.iteration + 1
        )

    def done(self, state: PDHGState):
        converged = state.gap < jnp.asarray(self.eps, state.gap.dtype)
        return jnp.logical_or(converged, state.iteration >= self.iterations)

    def convergence(self, state: PDHGState) -> dict:
        return {"primal_dual_gap": state.gap}
