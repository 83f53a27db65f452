"""Parallel-beam Radon transform operator (sparse-view CT).

Reference analog: ``RadonOp`` from RadonKA.jl via LinearOperatorCollection,
used in the reference's computed-tomography example
(docs/src/literate/examples/computed_tomography.jl). Implementation:
bilinear interpolation along rays (`jax.scipy.ndimage.map_coordinates`),
adjoint (backprojection) derived exactly via `jax.linear_transpose` — the
pair is guaranteed adjoint-consistent by construction.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates

from .._pytree import pytree_dataclass, static_field
from .base import LinearOperator

__all__ = ["RadonOperator"]


@pytree_dataclass
class RadonOperator(LinearOperator):
    """Line-integral projections of an (N, N) image at `angles` (radians).

    Output layout: (num_angles * num_detectors,), detector index fastest.
    """

    angles: Any  # (num_angles,) float32
    im_shape: tuple = static_field()
    num_det: int = static_field(default=0)

    def __post_init__(self):
        object.__setattr__(self, "im_shape", tuple(self.im_shape))
        if self.num_det == 0:
            object.__setattr__(self, "num_det", self.im_shape[0])

    @property
    def in_size(self) -> int:
        return self.im_shape[0] * self.im_shape[1]

    @property
    def out_size(self) -> int:
        return self.angles.shape[0] * self.num_det

    @property
    def dtype(self):
        return jnp.float32

    def _project(self, img):
        n = self.im_shape[0]
        c = (n - 1) / 2.0
        det = jnp.arange(self.num_det, dtype=jnp.float32) - (self.num_det - 1) / 2.0
        t = jnp.arange(n, dtype=jnp.float32) - c  # sample positions along ray

        def one_angle(theta):
            ct, st = jnp.cos(theta), jnp.sin(theta)
            # ray for detector s: points p(u) = center + s·(cosθ,sinθ)⊥ + u·(cosθ,sinθ)
            rows = c + det[:, None] * ct + t[None, :] * (-st)
            cols = c + det[:, None] * st + t[None, :] * ct
            vals = map_coordinates(img, [rows, cols], order=1, mode="constant")
            return jnp.sum(vals, axis=1)

        return jax.vmap(one_angle)(self.angles).reshape(-1)

    def mv(self, x):
        return self._project(x.reshape(self.im_shape).astype(jnp.float32))

    def rmv(self, y):
        primal = jax.ShapeDtypeStruct(self.im_shape, jnp.float32)
        transpose = jax.linear_transpose(self._project, primal)
        (img,) = transpose(y.astype(jnp.float32))
        return img.reshape(-1)
