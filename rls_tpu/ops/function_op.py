"""Function-defined matrix-free operators with automatic adjoints.

Reference analog: LinearOperators.jl's function-based constructor (users
supply `prod!` / `tprod!` / `ctprod!`). JAX-native twist: the adjoint is
derived automatically with `jax.linear_transpose`, so any linear JAX
function becomes a full operator — no hand-written transpose kernels.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .._pytree import pytree_dataclass, static_field
from .base import LinearOperator

__all__ = ["FunctionOperator"]


@pytree_dataclass
class FunctionOperator(LinearOperator):
    """Wraps a linear function ``mv_fn: (n,) -> (m,)``.

    The adjoint defaults to `jax.linear_transpose` of ``mv_fn`` (with
    complex conjugation handled for complex dtypes); pass ``rmv_fn`` to
    override with a hand-optimized adjoint.
    """

    mv_fn: Callable = static_field(default=None)
    rmv_fn: Optional[Callable] = static_field(default=None)
    n: int = static_field(default=0)
    m: int = static_field(default=0)
    _dtype: Any = static_field(default=jnp.float32)

    @property
    def in_size(self) -> int:
        return self.n

    @property
    def out_size(self) -> int:
        return self.m

    @property
    def dtype(self):
        return self._dtype

    def mv(self, x):
        return self.mv_fn(x)

    def rmv(self, y):
        if self.rmv_fn is not None:
            return self.rmv_fn(y)
        # Aᴴy = conj(Aᵀ conj(y)); linear_transpose gives Aᵀ
        primal = jax.ShapeDtypeStruct((self.n,), self._dtype)
        transpose = jax.linear_transpose(self.mv_fn, primal)
        if jnp.issubdtype(self._dtype, jnp.complexfloating):
            (out,) = transpose(jnp.conj(y))
            return jnp.conj(out)
        (out,) = transpose(y)
        return out
