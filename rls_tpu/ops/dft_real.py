"""Subsampled 2-D DFT as REAL split re/im MXU matmuls.

TPU runtimes without FFT/complex support (e.g. tunneled single-chip
sessions — see docs/tpu.md) cannot run `SubsampledFFTOperator`, which
blocks the compressed-sensing / MRI configurations (BASELINE.json configs
#2/#4) on hardware. This operator poses the same `A = S∘F` measurement
model entirely in f32:

  * the image x is REAL (real-constrained reconstruction);
  * the unitary 2-D DFT `F x Fᵀ` is evaluated with the real and imaginary
    parts of the 1-D DFT matrix as four banded... dense (N,N) matmul
    sandwiches on the MXU — `C = (Fr+iFi) X (Fr+iFi)ᵀ` expands to
    `Cr = Fr X Frᵀ − Fi X Fiᵀ`, `Ci = Fr X Fiᵀ + Fi X Frᵀ`;
  * sampling is a static binary mask in the frequency plane (no
    gather/scatter, shapes stay static);
  * measurements are returned stacked `[vec(M∘Cr); vec(M∘Ci)]` — the
    standard real form of a complex least-squares system, so every solver
    in the suite runs unchanged in f32;
  * ``normal`` is fused: `Re(Fᴴ (M∘(F X Fᵀ)) F̄)` — mask between the two
    sandwiches, 8+8 real matmuls total, no stacking round-trip.

Reference counterpart: the sampled-DFT products used by the CS examples
(/root/reference/docs/src/literate/examples/compressed_sensing.jl); the
split-real evaluation itself is TPU-native design with no Julia analog.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .._pytree import pytree_dataclass, static_field
from .base import LinearOperator

__all__ = ["SubsampledDFT2RealOperator"]


def _dft_factors(n: int):
    import numpy as np

    k = np.arange(n)
    w = np.exp(-2j * np.pi * np.outer(k, k) / n) / np.sqrt(n)  # unitary
    return w.real.astype(np.float32), w.imag.astype(np.float32)


@pytree_dataclass
class SubsampledDFT2RealOperator(LinearOperator):
    """Real-valued subsampled unitary 2-D DFT on an (H, W) image.

    in: flat real image (H*W,) — out: stacked real/imag samples (2*H*W,)
    with zeros at unsampled frequencies (mask form keeps shapes static).
    """

    fr_h: Any  # (H, H) Re(F_H)
    fi_h: Any  # (H, H) Im(F_H)
    fr_w: Any
    fi_w: Any
    mask: Any  # (H, W) f32 binary sampling mask
    im_shape: tuple = static_field()

    def __post_init__(self):
        object.__setattr__(self, "im_shape", tuple(self.im_shape))

    @classmethod
    def from_mask(cls, mask, im_shape):
        h, w = im_shape
        fr_h, fi_h = _dft_factors(h)
        fr_w, fi_w = _dft_factors(w)
        return cls(
            fr_h=jnp.asarray(fr_h),
            fi_h=jnp.asarray(fi_h),
            fr_w=jnp.asarray(fr_w),
            fi_w=jnp.asarray(fi_w),
            mask=jnp.asarray(mask, jnp.float32).reshape(h, w),
            im_shape=(h, w),
        )

    @classmethod
    def from_sample_idx(cls, sample_idx, im_shape):
        """Same sampling convention as SubsampledFFTOperator: int indices
        into the flattened (row-major) frequency plane."""
        h, w = im_shape
        m = jnp.zeros((h * w,), jnp.float32).at[jnp.asarray(sample_idx)].set(1.0)
        return cls.from_mask(m.reshape(h, w), im_shape)

    @property
    def in_size(self) -> int:
        h, w = self.im_shape
        return h * w

    @property
    def out_size(self) -> int:
        return 2 * self.in_size

    @property
    def dtype(self):
        return jnp.float32

    # -- complex 2-D DFT of a real image, as real sandwiches -------------
    def _fwd(self, x_img):
        a = self.fr_h @ x_img  # (H, W)
        b = self.fi_h @ x_img
        cr = a @ self.fr_w.T - b @ self.fi_w.T
        ci = a @ self.fi_w.T + b @ self.fr_w.T
        return cr, ci

    def _adj(self, cr, ci):
        """Re(Fᴴ C F̄) for C = cr + i·ci (adjoint of _fwd onto real images).

        Fᴴ = Frᵀ − i Fiᵀ; result = Frᵀ(cr)Fr... expanded and keeping only
        the real part (the adjoint of R^n → C^(HW) composed with Re-stack).
        """
        # left multiply by Fᴴ: (Frᵀ - i Fiᵀ)(cr + i ci)
        lr = self.fr_h.T @ cr + self.fi_h.T @ ci
        li = self.fr_h.T @ ci - self.fi_h.T @ cr
        # right multiply by conj(F)ᵀ = (Fr - i Fi)... C F̄: columns transform
        # with conj factors: real part of (lr + i li)(Fr - i Fi)... using
        # (M F̄)ᵀ convention consistent with _fwd's `@ fr_w.T`
        return lr @ self.fr_w + li @ self.fi_w

    def mv(self, x):
        h, w = self.im_shape
        cr, ci = self._fwd(x.reshape(h, w))
        cr = cr * self.mask
        ci = ci * self.mask
        return jnp.concatenate([cr.reshape(-1), ci.reshape(-1)])

    def rmv(self, y):
        h, w = self.im_shape
        n = h * w
        cr = (y[:n].reshape(h, w)) * self.mask
        ci = (y[n:].reshape(h, w)) * self.mask
        return self._adj(cr, ci).reshape(-1)

    def normal(self, x):
        h, w = self.im_shape
        cr, ci = self._fwd(x.reshape(h, w))
        return self._adj(cr * self.mask, ci * self.mask).reshape(-1)