"""Shared numeric utilities.

Reference analogs: ``enfReal!``/``enfPos!`` (/root/reference/src/Utils.jl:114-158),
``im2colDistinct``/``col2imDistinct`` (:166-226), ``nrmsd`` (:230-242).
All are pure elementwise/reshape ops that XLA fuses into surrounding kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["enf_real", "enf_pos", "nrmsd", "im2col_distinct", "col2im_distinct"]


def enf_real(x):
    """Project onto real numbers (keeps dtype: complex with zero imag)."""
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return jnp.real(x).astype(x.dtype)
    return x


def enf_pos(x):
    """Zero out negative real parts (imaginary part untouched, as in the
    reference's enfPos!)."""
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        re = jnp.maximum(jnp.real(x), 0)
        return (re + 1j * jnp.imag(x)).astype(x.dtype)
    return jnp.maximum(x, 0)


def nrmsd(ref, reco):
    """Scale-calibrated normalized RMS deviation (reference Utils.jl:230)."""
    ref = jnp.asarray(ref).reshape(-1)
    reco = jnp.asarray(reco).reshape(-1)
    n = ref.shape[0]
    denom = 2.0 * jnp.vdot(reco, reco).real
    alpha = jnp.where(
        jnp.linalg.norm(reco) > 0,
        (jnp.vdot(ref, reco) + jnp.vdot(reco, ref)).real / denom,
        1.0,
    )
    i2 = reco * alpha
    rms = jnp.linalg.norm(ref - i2) / jnp.sqrt(n)
    spread = jnp.max(jnp.abs(ref)) - jnp.min(jnp.abs(ref))
    return rms / spread


def im2col_distinct(a, blocksize):
    """Rearrange distinct (non-overlapping) blocks of a 2-D array into
    columns; zero-pads to a multiple of the block size."""
    br, bc = blocksize
    r, c = a.shape
    pr = (-r) % br
    pc = (-c) % bc
    ap = jnp.pad(a, ((0, pr), (0, pc)))
    R, C = ap.shape
    t = ap.reshape(R // br, br, C // bc, bc)  # [i, r, j, c]
    # column k = block (i, j) with i fastest; within a column the block is
    # flattened column-major (r fastest) — matches the reference layout.
    return t.transpose(3, 1, 2, 0).reshape(br * bc, -1)


def col2im_distinct(cols, blocksize, matsize):
    """Inverse of im2col_distinct for exact multiples."""
    br, bc = blocksize
    r, c = matsize
    if r % br or c % bc:
        raise ValueError("matsize must be divisible by blocksize")
    t = cols.reshape(bc, br, c // bc, r // br)  # [c, r, j, i]
    return t.transpose(3, 1, 2, 0).reshape(r, c)
