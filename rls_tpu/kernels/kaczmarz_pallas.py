"""Fused Pallas TPU kernel for a full Kaczmarz row sweep.

The row recurrence (reference Kaczmarz.jl:303-317, SIMD kernel :461-517) is
inherently sequential — the `lax.scan` version dispatches one tiny XLA op
sequence per row with x bouncing through HBM (and `lax.scan` is unavailable
on restricted TPU runtimes altogether). This kernel runs the ENTIRE sweep
inside one Pallas program: A, the iterate x and the dual vl are
VMEM-resident, and each row update (unconjugated row·x dot, scaled
residual, axpy) is pure VPU work with no HBM traffic.

Applicability: dense real A that fits in VMEM (~12 MB budget — the
MPI-style system matrices the reference's Kaczmarz targets). Larger or
complex systems stay on the XLA scan path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["kaczmarz_sweep_pallas", "fits_vmem"]

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fits_vmem(m: int, n: int, itemsize: int = 4) -> bool:
    # A + x + vl + u + denom + headroom
    return (m * n + 2 * m + 2 * n) * itemsize < _VMEM_BUDGET_BYTES


def _kernel(idx_ref, scal_ref, A_ref, x_ref, vl_ref, u_ref, denom_ref,
            x_out, vl_out):
    K = idx_ref.shape[0]
    eps_w = scal_ref[0]
    x_out[...] = x_ref[...]
    vl_out[...] = vl_ref[...]

    def body(j, _):
        i = idx_ref[j]
        row = A_ref[pl.ds(i, 1), :][0]
        tau = jnp.sum(row * x_out[0, :])
        u_i = u_ref[pl.ds(i, 1), 0][0]
        d_i = denom_ref[pl.ds(i, 1), 0][0]
        vl_i = vl_out[pl.ds(i, 1), 0][0]
        alpha = d_i * (u_i - tau - eps_w * vl_i)
        x_out[0, :] = x_out[0, :] + alpha * row
        vl_out[pl.ds(i, 1), 0] = (vl_i + alpha * eps_w)[None]
        return 0

    lax.fori_loop(0, K, body, 0)


def kaczmarz_sweep_pallas(A, x, vl, u, denom, eps_w, idx, interpret=False):
    """One full Kaczmarz sweep over `idx` rows of the dense real matrix A.

    A: (m, n); x: (n,); vl, u, denom: (m,); eps_w: scalar; idx: (K,) int32.
    Returns (x_new, vl_new).
    """
    m, n = A.shape
    dt = x.dtype

    x_new, vl_new = pl.pallas_call(
        _kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # idx
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eps_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # A
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vl
            pl.BlockSpec(memory_space=pltpu.VMEM),  # u
            pl.BlockSpec(memory_space=pltpu.VMEM),  # denom
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), dt),
            jax.ShapeDtypeStruct((m, 1), dt),
        ),
        interpret=interpret,
    )(
        idx.astype(jnp.int32),
        jnp.asarray(eps_w, dt).reshape(1),
        A.astype(dt),
        x.reshape(1, n),
        vl.reshape(m, 1),
        u.reshape(m, 1).astype(dt),
        denom.reshape(m, 1).astype(dt),
    )
    return x_new.reshape(n), vl_new.reshape(m)
