"""Finite-difference gradient operator (regTrafo for TV-via-ADMM).

TPU-native analog of LinearOperatorCollection's ``GradientOp`` used by the
reference for TV (/root/reference/src/proximalMaps/ProxTV.jl:41-46 builds
``∇ = GradientOp(Tc; shape, dims)``; /root/reference/src/ADMM.jl:74 documents
``regTrafo=GradientOp`` for TV penalties).

Forward differences along each requested axis are concatenated:
``y = vcat_d (x[..., 1:, ...] - x[..., :-1, ...])`` — each directional block
has ``(shape[d]-1) * prod(shape[других])`` entries. The adjoint is the
negative divergence (scatter-add of differences). Everything is expressed
with static slicing/padding, so XLA fuses it into surrounding elementwise
work — no Pallas needed for this op.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from .._pytree import pytree_dataclass, static_field
from .base import LinearOperator

__all__ = ["GradientOperator"]


def _axis_block_size(shape: tuple[int, ...], d: int) -> int:
    n = 1
    for i, s in enumerate(shape):
        n *= (s - 1) if i == d else s
    return n


@pytree_dataclass
class GradientOperator(LinearOperator):
    """Directional forward-difference operator on a flattened image."""

    im_shape: tuple = static_field()
    dims: tuple = static_field(default=None)
    _dtype: Any = static_field(default=jnp.complex64)

    def __post_init__(self):
        if self.dims is None:
            object.__setattr__(self, "dims", tuple(range(len(self.im_shape))))
        elif isinstance(self.dims, int):
            object.__setattr__(self, "dims", (self.dims,))
        else:
            object.__setattr__(self, "dims", tuple(self.dims))

    @property
    def in_size(self) -> int:
        n = 1
        for s in self.im_shape:
            n *= s
        return n

    @property
    def out_size(self) -> int:
        return sum(_axis_block_size(self.im_shape, d) for d in self.dims)

    @property
    def dtype(self):
        return self._dtype

    def mv(self, x):
        im = x.reshape(self.im_shape)
        blocks = []
        for d in self.dims:
            diff = jnp.diff(im, axis=d)
            blocks.append(diff.reshape(-1))
        return jnp.concatenate(blocks)

    def rmv(self, y):
        out = jnp.zeros(self.im_shape, dtype=y.dtype)
        offset = 0
        for d in self.dims:
            bsize = _axis_block_size(self.im_shape, d)
            dshape = tuple(
                (s - 1) if i == d else s for i, s in enumerate(self.im_shape)
            )
            diff = y[offset : offset + bsize].reshape(dshape)
            # adjoint of forward diff: out[..., :-1] -= diff; out[..., 1:] += diff
            pad_lo = [(0, 0)] * len(self.im_shape)
            pad_hi = [(0, 0)] * len(self.im_shape)
            pad_lo[d] = (0, 1)
            pad_hi[d] = (1, 0)
            out = out - jnp.pad(diff, pad_lo) + jnp.pad(diff, pad_hi)
            offset += bsize
        return out.reshape(-1)
