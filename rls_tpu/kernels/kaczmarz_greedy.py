"""Fused greedy-randomized Kaczmarz sweep as a Pallas TPU kernel.

The reference's greedy mode (Kaczmarz.jl:283-317, 393-426) is its most
algorithmically involved row selection: per step the residual is scored
(|r|²; the e_k threshold mixes the max row score with the Frobenius
floor), rows below the threshold are zeroed, and the next row is sampled
from the surviving distribution. The composed path
(`Kaczmarz._greedy_sweep`) runs this as a `lax.scan` dispatching one tiny
XLA op sequence per row; this kernel runs the WHOLE S-step sweep — the
inherently sequential part — VMEM-resident:

  * **selection**: Gumbel-max on the VPU — `argmax(log w + G)` over the
    thresholded weights draws from EXACTLY the categorical distribution
    the reference samples per step (different random stream:
    `pltpu.prng_*` vs jax.random), as tiled (m/128, 128) reductions;
  * **updates**: x += α·a_row (dynamic-sublane row gather), r −= r[row]·
    Gt[row] where Gt[i] = denom[i]·B[i,:] — B = AAᴴ + λI is symmetric,
    so Gt's ROWS are the reference's greedy_B columns and the gather
    rides the sublane dim (dynamic LANE indexing does not lower on
    Mosaic); Gt ships pre-tiled (m_pad, m/128, 128).

`solve_kaczmarz_greedy` drives T sweeps, applying the between-sweep
Positive/Real projection and the residual refresh
r = u − εw·vl − A x (reference Kaczmarz.jl:294-297) with the operator's
COMPENSATED matvec between kernel calls — a raw bf16 refresh would reset
r with ~4e-3 relative error every sweep.

Real f32 systems only (complex greedy uses the scan path). A
``forced_rows`` debug input replaces sampling with a host-given row
sequence, making the update pipeline exactly testable against the
composed math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "kaczmarz_greedy_sweep_pallas",
    "solve_kaczmarz_greedy",
    "check_kaczmarz_greedy",
]

_NEG_INF = -3.0e38


def _kernel(
    seed_ref,  # SMEM (4,): [seed, sweep, use_forced, use_theta] int32
    scal_ref,  # SMEM (P, 3): [eps_w, fnorm, theta]
    forced_ref,  # SMEM (S,) int32 forced rows (-1 entries when sampling)
    A_ref,  # VMEM (m_pad, n) dense rows (zero-padded)
    gt_ref,  # VMEM (m_pad, m128, 128): tiled Gt = diag(denom)·B
    den_ref,  # VMEM (1, m128, 128)
    x_ref,  # VMEM (1, 1, n) carry in
    vl_ref,  # VMEM (1, m128, 128)
    r_ref,  # VMEM (1, m128, 128)
    x_out,  # VMEM (1, 1, n)
    vl_out,  # VMEM (1, m128, 128)
    r_out,  # VMEM (1, m128, 128)
    *,
    m: int,
    n: int,
    S: int,
    host_rng: bool = False,
):
    p = pl.program_id(0)
    m128 = r_out.shape[1]
    eps_w = scal_ref[p, 0]
    fnorm = scal_ref[p, 1]
    theta = scal_ref[p, 2]
    use_forced = seed_ref[2]
    use_theta = seed_ref[3]
    if host_rng:
        # interpret mode: pltpu.prng_* has no CPU lowering — draw the
        # identical-distribution uniforms with jax.random instead
        base_key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(0), seed_ref[0]),
            seed_ref[1] * 131071 + p,
        )
    else:
        # single folded scalar: the multi-operand prng_seed form does not
        # lower on this Mosaic toolchain
        pltpu.prng_seed(seed_ref[0] * 1000003 + seed_ref[1] * 8191 + p)

    sub_iota = lax.broadcasted_iota(jnp.int32, (m128, 128), 0)
    lane_iota = lax.broadcasted_iota(jnp.int32, (m128, 128), 1)
    flat_idx = sub_iota * 128 + lane_iota
    valid = (flat_idx < m).astype(jnp.float32)

    x_out[...] = x_ref[...]
    vl_out[...] = vl_ref[...]
    r_out[...] = r_ref[...]
    denom = den_ref[0]
    # norms = rownorm² + λ = denom⁻¹ on populated rows (denom is
    # 1/(rownorm²+λ); zero rows have denom 0 and never win selection)
    norms = jnp.where(denom > 0, 1.0 / jnp.where(denom > 0, denom, 1.0), 0.0)

    def read_at(ref, i):
        sub = i // 128
        lmask = (lane_iota[0:1, :] == i % 128).astype(jnp.float32)
        return jnp.sum(ref[0, pl.ds(sub, 1), :] * lmask)

    def body(j, _):
        r = r_out[0]
        r2 = r * r * valid
        diff_numb = jnp.sum(r2)
        safe_dn = jnp.where(diff_numb > 0, diff_numb, 1.0)
        mx = jnp.max(r2 * denom)
        # e_k threshold (reference Kaczmarz.jl:398-404)
        ek_half = 0.5 * (mx / safe_dn + fnorm)
        ek_theta = theta * (mx / safe_dn) + (1.0 - theta) * fnorm
        e_k = jnp.where(use_theta == 1, ek_theta, ek_half)
        lower = e_k * safe_dn
        w = jnp.where(r2 >= lower * norms, r2, 0.0) * valid
        # Gumbel-max categorical draw over the unnormalized weights
        if host_rng:
            uni = jax.random.uniform(
                jax.random.fold_in(base_key, j), (m128, 128), jnp.float32
            )
        else:
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((m128, 128)), jnp.int32
            )
            uni = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
        uni = jnp.clip(uni, 1e-7, 1.0 - 1e-7)
        gumbel = -jnp.log(-jnp.log(uni))
        score = jnp.where(
            w > 0, jnp.log(jnp.where(w > 0, w, 1.0)) + gumbel, _NEG_INF
        )
        smax = jnp.max(score)
        hit = (score >= smax).astype(jnp.int32)
        row_sampled = jnp.min(
            jnp.where(hit == 1, flat_idx, jnp.int32(2**30))
        )
        fj = forced_ref[j]
        row = jnp.where(
            jnp.logical_and(use_forced == 1, fj >= 0), fj, row_sampled
        )

        r_row = read_at(r_out, row)
        alpha = read_at(den_ref, row) * r_row
        arow = A_ref[pl.ds(row, 1), :][0]
        x_out[0, 0, :] = x_out[0, 0, :] + alpha * arow
        sub = row // 128
        lmask = (lane_iota == row % 128).astype(jnp.float32)
        vl_out[0, pl.ds(sub, 1), :] = (
            vl_out[0, pl.ds(sub, 1), :]
            + (alpha * eps_w) * lmask[0:1, :]
        )
        # r ← r − r[row]·Gt[row] (Gt row == reference greedy_B column)
        g_tile = gt_ref[pl.ds(row, 1)][0]  # (m128, 128)
        r_out[0] = r_out[0] - r_row * g_tile
        return 0

    lax.fori_loop(0, S, body, 0)


def kaczmarz_greedy_sweep_pallas(
    A_pad,  # (m_pad, n)
    gt_tiled,  # (m_pad, m128, 128)
    denom,  # (m,)
    x,  # (P, n)
    vl,  # (P, m)
    r,  # (P, m)
    eps_w,  # (P,)
    fnorm: float,
    theta: float | None,
    S: int,
    seed: int,
    sweep: int,
    forced_rows=None,  # (S,) int32 or None
    interpret: bool = False,
):
    """One S-step greedy sweep for P problems; returns (x, vl, r)."""
    P, n = x.shape
    m = vl.shape[1]
    m_pad = A_pad.shape[0]
    m128 = m_pad // 128
    dt = jnp.float32

    def tile(v):
        pad = m_pad - v.shape[-1]
        if pad:
            v = jnp.concatenate(
                [v, jnp.zeros(v.shape[:-1] + (pad,), v.dtype)], axis=-1
            )
        return v.reshape(v.shape[0], m128, 128)

    scal = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(eps_w, dt).reshape(-1), (P,)),
            jnp.full((P,), fnorm, dt),
            jnp.full((P,), 0.0 if theta is None else float(theta), dt),
        ],
        axis=1,
    )
    seeds = jnp.asarray(
        [
            seed,
            sweep,
            0 if forced_rows is None else 1,
            0 if theta is None else 1,
        ],
        jnp.int32,
    )
    if forced_rows is None:
        forced_rows = jnp.full((S,), -1, jnp.int32)

    vspec = pl.BlockSpec(
        (1, m128, 128), lambda p_: (p_, 0, 0), memory_space=pltpu.VMEM
    )
    xspec = pl.BlockSpec(
        (1, 1, n), lambda p_: (p_, 0, 0), memory_space=pltpu.VMEM
    )
    x_new, vl_new, r_new = pl.pallas_call(
        functools.partial(_kernel, m=m, n=n, S=S, host_rng=interpret),
        grid=(P,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (m_pad, n), lambda p_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (m_pad, m128, 128), lambda p_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, m128, 128), lambda p_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            xspec,
            vspec,
            vspec,
        ],
        out_specs=(xspec, vspec, vspec),
        out_shape=(
            jax.ShapeDtypeStruct((P, 1, n), dt),
            jax.ShapeDtypeStruct((P, m128, 128), dt),
            jax.ShapeDtypeStruct((P, m128, 128), dt),
        ),
        interpret=interpret,
    )(
        seeds,
        scal,
        jnp.asarray(forced_rows, jnp.int32),
        A_pad.astype(dt),
        gt_tiled.astype(dt),
        tile(denom.astype(dt)[None, :]),
        x.astype(dt)[:, None, :],
        tile(vl.astype(dt)),
        tile(r.astype(dt)),
    )
    return (
        x_new[:, 0, :],
        vl_new.reshape(P, m128 * 128)[:, :m],
        r_new.reshape(P, m128 * 128)[:, :m],
    )


def check_kaczmarz_greedy(solver):
    """Validate `solver` for the fused greedy kernel (raises ValueError)."""
    from ..models.prox import PositiveRegularization, RealRegularization
    from ..models.solvers.kaczmarz import Kaczmarz

    if not isinstance(solver, Kaczmarz):
        raise ValueError("greedy kernel requires a Kaczmarz solver")
    if not solver.greedy:
        raise ValueError("greedy kernel requires greedy_randomized=True")
    if not hasattr(solver.A, "mat"):
        raise ValueError("greedy kernel requires a dense operator")
    mat = solver.A.mat
    if jnp.issubdtype(mat.dtype, jnp.complexfloating):
        raise ValueError("greedy kernel is real-only; use the scan path")
    if solver.tikhonov_inv_sqrt is not None:
        raise ValueError("greedy kernel does not support vector-λ Tikhonov")
    for r in solver.reg:
        if not isinstance(r, (PositiveRegularization, RealRegularization)):
            raise ValueError(
                "greedy kernel supports only Positive/Real projections, "
                f"got {type(r).__name__}"
            )
    m, n = mat.shape
    m_pad = -(-m // 128) * 128
    vmem = (m_pad * n + m_pad * m_pad + 8 * m_pad + 2 * n) * 4
    if vmem > 12 * 1024 * 1024:
        raise ValueError(
            f"greedy kernel working set ~{vmem/2**20:.0f} MiB exceeds VMEM "
            "(dense A + the m×m greedy table); use the scan path"
        )
    if any(isinstance(r, PositiveRegularization) for r in solver.reg):
        return "positive"
    return "none"


def solve_kaczmarz_greedy(
    solver, B_mat, interpret: bool | None = None, forced_rows=None
):
    """Drop-in fast path for batched greedy-randomized Kaczmarz: each
    S-step sweep runs as ONE Pallas call (the sequential hot loop); the
    between-sweep projection and compensated residual refresh ride XLA.
    Returns the n×K solution matrix. The sampling stream differs from the
    scan path's jax.random (same per-step categorical distribution); pass
    ``forced_rows`` (T, S) to pin the row sequence (testing)."""
    import numpy as np

    prox = check_kaczmarz_greedy(solver)
    mat = solver.A.mat
    m, n = mat.shape
    m_pad = -(-m // 128) * 128
    m128 = m_pad // 128

    B_mat = jnp.asarray(B_mat)
    bt = B_mat.T.real.astype(jnp.float32)
    P = bt.shape[0]

    # all tables derive from the CONCRETE solver (b may be a tracer; the
    # greedy ctor already rejects measurement-based normalization, so
    # λ_eff is b-independent — identical tables to Kaczmarz.init's)
    a_np = np.asarray(mat, np.float32)
    A_pad = np.zeros((m_pad, n), np.float32)
    A_pad[:m] = a_np
    # pure-numpy row norms: calling the operator's jnp method inside a
    # jit trace would produce tracers even on the concrete closure matrix
    rn2 = (np.abs(a_np) ** 2).sum(axis=1).astype(np.float32)
    norms_np = np.asarray(solver.greedy_norms, np.float32)
    lam_s = float(norms_np[0] - rn2[0])
    denom_np = np.where(rn2 > 0, 1.0 / (rn2 + lam_s), 0.0).astype(np.float32)
    eps_w = np.full((P,), np.sqrt(max(lam_s, 0.0)), np.float32)
    # Gt[i] = denom[i]·B[i,:] with B = A Aᵀ + λ_s I (symmetric) — rows of
    # Gt are the reference greedy_B's columns (Kaczmarz.jl greedy tables)
    b_full = a_np @ a_np.T + lam_s * np.eye(m, dtype=np.float32)
    gt = np.zeros((m_pad, m_pad), np.float32)
    gt[:m, :m] = denom_np[:, None] * b_full
    gt_tiled = gt.reshape(m_pad, m128, 128)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    x = jnp.zeros((P, n), jnp.float32)
    vl = jnp.zeros((P, m), jnp.float32)
    r = bt  # x₀ = 0 ⇒ r = b
    A_j = jnp.asarray(A_pad)
    gt_j = jnp.asarray(gt_tiled)
    den_j = jnp.asarray(denom_np)
    positive = prox == "positive"
    for t in range(solver.iterations):
        fr = None if forced_rows is None else forced_rows[t]
        x, vl, r = kaczmarz_greedy_sweep_pallas(
            A_j, gt_j, den_j, x, vl, r,
            jnp.asarray(eps_w), float(solver.greedy_fnorm), solver.theta,
            S=solver.sub_matrix_size, seed=solver.seed, sweep=t,
            forced_rows=fr, interpret=interpret,
        )
        if positive:
            x = jnp.maximum(x, 0.0)
        # residual refresh with the operator's (compensated) matvec
        # (reference Kaczmarz.jl:294-297)
        r = bt - eps_w[:, None] * vl - jax.vmap(solver.A.mv)(x)
    return x.T
