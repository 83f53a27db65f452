"""Direct solvers: regularized normal-equation solve and SVD pseudoinverse.

Behavioral port of /root/reference/src/Direct.jl:
  * DirectSolver — solves (AᴴA + λI)x = Aᴴb by dense factorization
    (reference uses `lu`; here `jnp.linalg.solve`, which lowers to batched
    LU on TPU).
  * PseudoInverse — Tikhonov-filtered SVD pinv: x = V · diag(S/(S²+λ)) · Uᴴ b
    with the SVD precomputed at construction (Direct.jl:135-139,152-169).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp

from ..._pytree import pytree_dataclass, replace, static_field
from ...ops.base import LinearOperator, as_operator
from ..prox import L2Regularization
from ..regularization import NoNormalization, find_sink, normalization_factor
from .base import LinearSolver, split_projection_terms

__all__ = ["DirectSolver", "PseudoInverse"]


def _split_l2(reg):
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
    params, proj = split_projection_terms(regs)
    if params:
        raise ValueError(
            "direct solvers do not allow for more than one L2 regularization "
            f"term, found {len(params)} additional terms"
        )
    return l2, proj


@pytree_dataclass
class DirectState:
    x: Any
    b: Any
    lam: Any
    iteration: Any


@pytree_dataclass
class DirectSolver(LinearSolver):
    A: LinearOperator
    l2: Any
    proj: Tuple = ()
    normalize_reg: Any = NoNormalization()
    iterations: int = static_field(default=1)

    @classmethod
    def create(cls, A, reg=None, normalize_reg=NoNormalization(), **_):
        l2, proj = _split_l2(reg)
        return cls(A=as_operator(A), l2=l2, proj=proj, normalize_reg=normalize_reg)

    def init(self, b, x0=None) -> DirectState:
        b = jnp.asarray(b)
        scale = normalization_factor(self.normalize_reg, self.A, b)
        lam = jnp.real(jnp.asarray(self.l2.get_lam())) * scale
        n = self.A.in_size
        x = (
            jnp.broadcast_to(jnp.asarray(x0, b.dtype), (n,))
            if x0 is not None
            else jnp.zeros((n,), b.dtype)
        )
        return DirectState(x=x, b=b, lam=lam, iteration=jnp.asarray(0, jnp.int32))

    def step(self, state: DirectState) -> DirectState:
        Ad = self.A.to_dense()
        n = Ad.shape[1]
        gram = Ad.conj().T @ Ad + state.lam.astype(Ad.dtype) * jnp.eye(n, dtype=Ad.dtype)
        x = jnp.linalg.solve(gram, Ad.conj().T @ state.b)
        for p in self.proj:
            x = p.prox(x)
        return replace(state, x=x, iteration=state.iteration + 1)

    def done(self, state: DirectState):
        return state.iteration >= 1

    def convergence(self, state: DirectState) -> dict:
        return {}


@pytree_dataclass
class PseudoInverse(LinearSolver):
    U: Any
    S: Any
    Vh: Any
    l2: Any
    proj: Tuple = ()
    normalize_reg: Any = NoNormalization()
    iterations: int = static_field(default=1)

    @classmethod
    def create(cls, A, reg=None, normalize_reg=NoNormalization(), **_):
        l2, proj = _split_l2(reg)
        Ad = as_operator(A).to_dense()
        U, S, Vh = jnp.linalg.svd(Ad, full_matrices=False)
        return cls(U=U, S=S, Vh=Vh, l2=l2, proj=proj, normalize_reg=normalize_reg)

    def init(self, b, x0=None) -> DirectState:
        b = jnp.asarray(b)
        scale = normalization_factor(self.normalize_reg, None, b)
        lam = jnp.real(jnp.asarray(self.l2.get_lam())) * scale
        n = self.Vh.shape[1]
        x = jnp.zeros((n,), b.dtype)
        return DirectState(x=x, b=b, lam=lam, iteration=jnp.asarray(0, jnp.int32))

    def step(self, state: DirectState) -> DirectState:
        # Tikhonov-filtered singular values D = S/(S²+λ) (Direct.jl:158)
        D = self.S / (self.S**2 + state.lam)
        tmp = self.U.conj().T @ state.b
        x = self.Vh.conj().T @ (D.astype(tmp.dtype) * tmp)
        for p in self.proj:
            x = p.prox(x)
        return replace(state, x=x, iteration=state.iteration + 1)

    def done(self, state: DirectState):
        return state.iteration >= 1

    def convergence(self, state: DirectState) -> dict:
        return {}
