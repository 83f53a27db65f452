"""Fused Pallas TPU kernel for a full Kaczmarz row sweep.

The row recurrence (reference Kaczmarz.jl:303-317, SIMD kernel :461-517) is
inherently sequential — the `lax.scan` version dispatches one tiny XLA op
sequence per row with x bouncing through HBM. This kernel runs the ENTIRE
sweep inside one Pallas program: the iterate x and the dual vl stay
VMEM-resident, each row is DMA'd from HBM on demand, and the per-row update
(unconjugated row·x dot, scaled residual, axpy) is pure VPU work. Real
dtypes only (TPU Pallas has no complex; the complex path stays on XLA).

Double-buffered row DMA overlaps the next row fetch with the current
update.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["kaczmarz_sweep_pallas"]


def _kernel(idx_ref, scal_ref, A_ref, x_ref, vl_ref, u_ref, denom_ref,
            x_out, vl_out, row_buf, sem):
    K = idx_ref.shape[0]
    eps_w = scal_ref[0]

    x_out[...] = x_ref[...]
    vl_out[...] = vl_ref[...]

    def get_dma(slot, j):
        i = idx_ref[j]
        return pltpu.make_async_copy(
            A_ref.at[pl.ds(i, 1), :], row_buf.at[slot], sem.at[slot]
        )

    get_dma(0, 0).start()

    def body(j, _):
        slot = j % 2
        nxt = (j + 1) % 2

        @pl.when(j + 1 < K)
        def _():
            get_dma(nxt, j + 1).start()

        get_dma(slot, j).wait()
        i = idx_ref[j]
        row = row_buf[slot, 0, :]
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
    x2 = x.reshape(1, n)
    vl2 = vl.reshape(m, 1)
    u2 = u.reshape(m, 1).astype(dt)
    denom2 = denom.reshape(m, 1).astype(dt)
    scal = jnp.asarray(eps_w, dt).reshape(1)

    x_new, vl_new = pl.pallas_call(
        _kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # idx
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eps_w
            pl.BlockSpec(memory_space=pltpu.ANY),  # A stays in HBM
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
        scratch_shapes=[
            pltpu.VMEM((2, 1, n), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(idx.astype(jnp.int32), scal, A.astype(dt), x2, vl2, u2, denom2)
    return x_new.reshape(n), vl_new.reshape(m)
