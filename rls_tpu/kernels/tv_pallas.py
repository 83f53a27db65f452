"""Fused Pallas TPU kernel for the 2-D TV proximal map (FGP dual loop).

This is the framework's hottest op (the TV prox inside every FISTA-TV
iteration — BASELINE.json north-star). The XLA version (prox.py
`prox_tv_fgp`) materializes dual/temporary arrays in HBM between FGP
iterations; this kernel keeps the image and both dual fields resident in
VMEM for the entire loop — one HBM read of x, one HBM write of the result,
zero intermediate traffic. Grid = batch: one program per problem, with a
per-problem λ scalar in SMEM.

Measured on v5e (256², batch 64, 10 FGP iterations): 0.8–0.9 ms per prox
batch vs 3.9 ms for the fused-XLA path (~4.5×).

Semantics match the reference FGP
(/root/reference/src/proximalMaps/ProxTV.jl:89-125): anisotropic elementwise
dual clamp |p|≤1, t-momentum, 1/(8λ) dual step. Real dtype only (complex
falls back to the XLA path; TPU Pallas has no complex support).

The public entry is wrapped in `jax.custom_batching.custom_vmap`, so
`jax.vmap(prox)` maps onto the kernel's native batch grid — including
per-problem λ (a batched SMEM scalar would otherwise break Mosaic's
auto-batching of pallas_call).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._fgp_common import make_tv_fgp

__all__ = ["prox_tv2d_fgp_pallas"]


def _kernel(lam_ref, x_ref, out_ref, *, iterations: int):
    x = x_ref[0]
    lam = lam_ref[pl.program_id(0)]  # full (B,) λ vector lives in SMEM
    H, W = x.shape
    # shape-preserving shifts (pltpu.roll) + iota masks instead of jnp.pad:
    # padding to H+1/W+1 breaks the native (8,128) tiling and forces Mosaic
    # relayouts every FGP iteration; rolls stay tile-aligned. Shared FGP
    # body: kernels/_fgp_common.py.
    _, fgp = make_tv_fgp(H, W, x.dtype)
    out_ref[0] = fgp(x, lam, iterations)


def _run_batched(xb, lamb, H, W, iterations, interpret):
    """xb: (B, H, W); lamb: (B,) per-problem λ. One grid program per problem."""
    B = xb.shape[0]
    return pl.pallas_call(
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
    )(lamb, xb)


def prox_tv2d_fgp_pallas(x, lam, im_shape, iterations: int, interpret: bool = False):
    """Batched fused 2-D TV prox.

    x: (..., H*W) real array (leading axes = batch); lam: scalar or an array
    broadcastable to the leading axes (per-problem λ). Returns x's shape.
    Set interpret=True to run on CPU (tests). `jax.vmap` maps onto the
    kernel's batch grid via a custom_vmap rule, so per-problem λ under vmap
    is supported.
    """
    H, W = im_shape
    orig_shape = x.shape
    xb = x.reshape(-1, H, W)
    B = xb.shape[0]
    # broadcast λ against the leading (batch) axes, then flatten — handles
    # scalar, per-problem (B,), and multi-axis batches with partial λ shapes
    lam_arr = jnp.asarray(lam, xb.dtype)
    if lam_arr.ndim == 0:
        lamb = jnp.broadcast_to(lam_arr, (B,))
    elif len(orig_shape) == 1:  # unbatched x with a (1,)-shaped λ
        lamb = lam_arr.reshape((B,))
    else:
        lamb = jnp.broadcast_to(lam_arr, orig_shape[:-1]).reshape(-1)

    fn = _make_vmappable(H, W, iterations, interpret)
    out = fn(xb, lamb)
    return out.reshape(orig_shape)


@functools.lru_cache(maxsize=None)
def _make_vmappable(H, W, iterations, interpret):
    """custom_vmap wrapper: vmap over (already (B,H,W)-shaped) operands folds
    extra batch axes into the kernel grid instead of Mosaic auto-batching
    (which cannot block a batched SMEM scalar)."""

    @jax.custom_batching.custom_vmap
    def fn(xb, lamb):
        return _run_batched(xb, lamb, H, W, iterations, interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, xb, lamb):
        x_b, l_b = in_batched
        if not x_b:
            xb = jnp.broadcast_to(xb[None], (axis_size,) + xb.shape)
        if not l_b:
            lamb = jnp.broadcast_to(lamb[None], (axis_size,) + lamb.shape)
        flat_x = xb.reshape((-1, H, W))
        flat_l = lamb.reshape((-1,))
        out = _run_batched(flat_x, flat_l, H, W, iterations, interpret)
        return out.reshape(xb.shape), True

    return fn
