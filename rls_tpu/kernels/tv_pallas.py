"""Fused Pallas TPU kernel for the 2-D TV proximal map (FGP dual loop).

This is the framework's hottest op (the TV prox inside every FISTA-TV
iteration — BASELINE.json north-star). The XLA version (prox.py
`prox_tv_fgp`) materializes dual/temporary arrays in HBM between FGP
iterations; this kernel keeps the image and both dual fields resident in
VMEM for the entire loop — one HBM read of x, one HBM write of the result,
zero intermediate traffic. Grid = batch: one program per problem.

Semantics match the reference FGP
(/root/reference/src/proximalMaps/ProxTV.jl:89-125): anisotropic elementwise
dual clamp |p|≤1, t-momentum, 1/(8λ) dual step. Real dtype only (complex
falls back to the XLA path; TPU Pallas has no complex support).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["prox_tv2d_fgp_pallas"]


def _kernel(lam_ref, x_ref, out_ref, *, iterations: int):
    x = x_ref[0]
    lam = lam_ref[0]
    H, W = x.shape
    lam_safe = jnp.where(lam > 0, lam, 1.0)
    inv8 = 1.0 / (8.0 * lam_safe)

    def gv(u):  # forward diff along rows, zero-padded to (H, W)
        return jnp.pad(u[1:, :] - u[:-1, :], ((0, 1), (0, 0)))

    def gh(u):  # forward diff along cols
        return jnp.pad(u[:, 1:] - u[:, :-1], ((0, 0), (0, 1)))

    def gt(pv, ph):  # adjoint (negative divergence); pv/ph zero in last row/col
        tv = jnp.pad(pv, ((1, 0), (0, 0)))[:-1, :] - pv
        th = jnp.pad(ph, ((0, 0), (1, 0)))[:, :-1] - ph
        return tv + th

    zeros = jnp.zeros_like(x)

    def body(_, carry):
        pv, ph, rv, rh, t = carry
        xtmp = x - lam * gt(rv, rh)
        qv = rv + gv(xtmp) * inv8
        qh = rh + gh(xtmp) * inv8
        qv = qv / jnp.maximum(1.0, jnp.abs(qv))
        qh = qh / jnp.maximum(1.0, jnp.abs(qh))
        t_new = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) / 2.0
        t2 = (t - 1.0) / t_new
        rv_new = (1.0 + t2) * qv - t2 * pv
        rh_new = (1.0 + t2) * qh - t2 * ph
        return (qv, qh, rv_new, rh_new, t_new)

    pv, ph, _, _, _ = jax.lax.fori_loop(
        0, iterations, body, (zeros, zeros, zeros, zeros, jnp.asarray(1.0, x.dtype))
    )
    out_ref[0] = x - lam * gt(pv, ph)


def prox_tv2d_fgp_pallas(x, lam, im_shape, iterations: int, interpret: bool = False):
    """Batched fused 2-D TV prox.

    x: (..., H*W) real array (leading axes = batch), lam: scalar.
    Returns the same shape. Set interpret=True to run on CPU (tests).
    """
    H, W = im_shape
    orig_shape = x.shape
    xb = x.reshape(-1, H, W)
    B = xb.shape[0]
    lam_arr = jnp.full((1,), lam, xb.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, iterations=iterations),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W), xb.dtype),
        interpret=interpret,
    )(lam_arr, xb)
    return out.reshape(orig_shape)
