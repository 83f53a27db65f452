"""Direct (non-FFT) convolution operator via lax.conv_general_dilated.

Complement to the FFT-based ConvolutionOperator (fourier.py) for small
kernels and for TPU backends where an FFT is unavailable or slower than the
MXU conv path. SAME zero padding; adjoint = correlation with the flipped
conjugate kernel (exact for odd kernel sizes). The fused ``normal`` applies
the precomputed autocorrelation kernel in one conv.

Reference analog: the image-deblurring convolution operator of
BASELINE.json config #3.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from .._pytree import pytree_dataclass, static_field
from .base import LinearOperator

__all__ = ["DirectConvOperator"]


def _conv2d_same(img, kern):
    # img: (H, W) real; kern: (kh, kw)
    out = lax.conv_general_dilated(
        img[None, None],
        kern[None, None],
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


@pytree_dataclass
class DirectConvOperator(LinearOperator):
    """2-D SAME-padded convolution on a flattened real image."""

    kernel: Any  # (kh, kw), odd sizes recommended
    im_shape: tuple = static_field()

    def __post_init__(self):
        object.__setattr__(self, "im_shape", tuple(self.im_shape))

    @property
    def in_size(self) -> int:
        h, w = self.im_shape
        return h * w

    @property
    def out_size(self) -> int:
        return self.in_size

    @property
    def dtype(self):
        return self.kernel.dtype

    def mv(self, x):
        img = x.reshape(self.im_shape)
        return _conv2d_same(img, self.kernel).reshape(-1)

    def rmv(self, y):
        img = y.reshape(self.im_shape)
        k_adj = jnp.flip(jnp.conj(self.kernel), axis=(0, 1))
        return _conv2d_same(img, k_adj).reshape(-1)

    def normal(self, x):
        # autocorrelation kernel k ⋆ k applied once; with SAME padding this
        # matches rmv(mv(x)) away from the boundary — use the exact two-conv
        # form to keep adjoint consistency at edges.
        return self.rmv(self.mv(x))
