"""CGNR — conjugate gradient on the normal equations (AᴴA + λI)x = Aᴴb.

Behavioral port of /root/reference/src/CGNR.jl (structure re-designed as a
pure JAX step; every iteration is one normal-op matvec + three reductions,
which XLA fuses and psum-shards under a mesh).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp

from ..._pytree import pytree_dataclass, replace, static_field
from ...ops.base import LinearOperator
from ..prox import L2Regularization, PositiveRegularization, RealRegularization
from ..regularization import (
    NoNormalization,
    find_sink,
    find_sinks,
    normalization_factor,
    sink,
)
from .base import LinearSolver, split_projection_terms, prepare_operators

__all__ = ["CGNR"]


@pytree_dataclass
class CGNRState:
    x: Any
    r: Any  # current Aᴴ-residual (reference's x₀ vector)
    p: Any
    z0: Any
    lam: Any  # effective λ (base λ × normalization factor)
    rel_tol: Any
    iteration: Any


@pytree_dataclass
class CGNR(LinearSolver):
    A: Optional[LinearOperator]
    AHA: LinearOperator
    l2: L2Regularization
    constr: Tuple = ()
    normalize_reg: Any = NoNormalization()
    rel_tol: Any = None
    iterations: int = static_field(default=10)

    @classmethod
    def create(
        cls,
        A=None,
        AHA=None,
        reg=None,
        normalize_reg=NoNormalization(),
        iterations: int = 10,
        rel_tol=None,
        **_,
    ):
        """Reference ctor semantics (CGNR.jl:48-89): only an L2 term plus
        optional Real/Positive projections are allowed."""
        A_op, AHA_op = prepare_operators(A, AHA)
        regs = (
            list(reg)
            if isinstance(reg, (list, tuple))
            else ([reg] if reg is not None else [L2Regularization(0.0)])
        )
        idx = find_sink(L2Regularization, regs)
        if idx is None:
            l2 = L2Regularization(0.0)
        else:
            l2 = regs.pop(idx)
        keep = find_sinks(RealRegularization, regs) + find_sinks(
            PositiveRegularization, regs
        )
        constr = tuple(regs[i] for i in sorted(set(keep)))
        rest = [r for i, r in enumerate(regs) if i not in set(keep)]
        if rest:
            raise ValueError(
                f"CGNR does not allow additional regularization terms, found {len(rest)}"
            )
        return cls(
            A=A_op,
            AHA=AHA_op,
            l2=l2,
            constr=constr,
            normalize_reg=normalize_reg,
            rel_tol=rel_tol,
            iterations=iterations,
        )

    # -- protocol --------------------------------------------------------
    def init(self, b, x0=None) -> CGNRState:
        b = jnp.asarray(b)
        n = self.AHA.in_size
        if x0 is not None:
            if self.A is None:
                raise ValueError("providing x0 requires A to be defined")
            x = jnp.broadcast_to(jnp.asarray(x0, b.dtype), (n,))
            b = b - self.A.mv(x)
        else:
            x = jnp.zeros((n,), b.dtype)
        r = self.A.rmv(b) if self.A is not None else b
        z0 = jnp.linalg.norm(r)
        scale = normalization_factor(self.normalize_reg, self.A, b)
        lam = jnp.real(jnp.asarray(self.l2.get_lam())) * scale
        rdt = z0.dtype
        rel_tol = (
            jnp.asarray(self.rel_tol, rdt)
            if self.rel_tol is not None
            else jnp.asarray(jnp.finfo(rdt).eps, rdt)
        )
        return CGNRState(
            x=x,
            r=r,
            p=r,
            z0=z0,
            lam=lam.astype(rdt),
            rel_tol=rel_tol,
            iteration=jnp.asarray(0, jnp.int32),
        )

    def step(self, state: CGNRState) -> CGNRState:
        v = self.AHA.mv(state.p)
        zeta = jnp.linalg.norm(state.r) ** 2
        pv = jnp.vdot(state.p, v)
        lam = state.lam
        denom = pv + lam * jnp.linalg.norm(state.p) ** 2
        alpha = zeta / denom
        x = state.x + alpha * state.p
        r = state.r - alpha * v - (lam * alpha) * state.p
        beta = jnp.linalg.norm(r) ** 2 / zeta
        p = r + beta * state.p
        return replace(state, x=x, r=r, p=p, iteration=state.iteration + 1)

    def done(self, state: CGNRState):
        converged = jnp.linalg.norm(state.r) / state.z0 <= state.rel_tol
        maxit = min(self.iterations, self.AHA.in_size)
        return jnp.logical_or(converged, state.iteration >= maxit)

    def finalize(self, state: CGNRState) -> CGNRState:
        # projections applied once at convergence (reference CGNR.jl:144-148)
        x = state.x
        for r in self.constr:
            x = r.prox(x)
        return replace(state, x=x)

    def solution(self, state: CGNRState):
        return state.x

    def convergence(self, state: CGNRState) -> dict:
        return {"residual": jnp.linalg.norm(state.r)}
