"""Sparse operator backed by jax.experimental.sparse BCOO.

Reference analog: SparseMatrixCSC system matrices with specialized
``rownorm²`` / ``dot_with_matrix_row`` / ``kaczmarz_update!``
(/root/reference/src/Utils.jl:26-31,96-105, /root/reference/src/Kaczmarz.jl:532-539).
On TPU, scalar sparse row access is hostile; row-action solvers gather dense
rows via ``row(i)`` (densified gather), and matvecs use BCOO matmul.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from jax.experimental import sparse as jsparse

from .._pytree import pytree_dataclass
from .base import LinearOperator

__all__ = ["SparseOperator"]


@pytree_dataclass
class SparseOperator(LinearOperator):
    mat: Any  # BCOO

    @classmethod
    def from_dense(cls, dense):
        return cls(jsparse.BCOO.fromdense(jnp.asarray(dense)))

    @property
    def in_size(self) -> int:
        return self.mat.shape[1]

    @property
    def out_size(self) -> int:
        return self.mat.shape[0]

    @property
    def dtype(self):
        return self.mat.dtype

    def mv(self, x):
        return self.mat @ x

    def rmv(self, y):
        # BCOO transpose matvec: (Aᴴ y) = conj(Aᵀ conj(y))
        return jnp.conj(self.mat.T @ jnp.conj(y))

    def row(self, i):
        # densified row gather: sum of nonzeros whose row index == i
        data, indices = self.mat.data, self.mat.indices
        rowmask = (indices[:, 0] == i).astype(self.mat.dtype)
        out = jnp.zeros((self.in_size,), dtype=self.mat.dtype)
        return out.at[indices[:, 1]].add(data * rowmask)

    def row_norms_sq(self):
        data, indices = self.mat.data, self.mat.indices
        out = jnp.zeros((self.out_size,), dtype=jnp.float32)
        return out.at[indices[:, 0]].add(jnp.abs(data) ** 2)

    def to_dense(self):
        return self.mat.todense()
