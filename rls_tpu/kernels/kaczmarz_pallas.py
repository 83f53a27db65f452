"""Fused Pallas TPU kernels for Kaczmarz row sweeps.

The row recurrence (reference Kaczmarz.jl:303-317, SIMD kernel :461-517) is
inherently sequential — the `lax.scan` version dispatches one tiny XLA op
sequence per row with x bouncing through HBM. Two kernels:

* `kaczmarz_sweep_pallas` — ONE sweep with the whole dense real A
  VMEM-resident (~12 MB budget); the original small-system fast path.
* `kaczmarz_solve_pallas` — the WHOLE multi-sweep solve with A streamed
  from HBM in row blocks (Pallas pipelines the block DMA against the
  row updates), lifting the VMEM size limit entirely. Handles complex
  systems in split-real form (rows interleaved [re; im]), randomized
  orders via a host-precomputed index table, a batch of problems on the
  leading grid axis, and the elementwise Positive/Real projections
  in-kernel between sweeps. Every row update (unconjugated row·x dot,
  scaled residual, axpy, implicit-dual bump) is pure VPU f32 work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "kaczmarz_sweep_pallas",
    "kaczmarz_solve_pallas",
    "solve_kaczmarz_streamed",
    "check_kaczmarz_streamed",
    "pick_block_rows",
    "fits_vmem",
]

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024
# randomized-mode row gathers are CHUNKED over sweeps so the transient
# HBM copy stays under this budget regardless of the sweep count
_GATHER_CHUNK_BUDGET_BYTES = 256 * 1024 * 1024
_SMEM_TABLE_BUDGET_BYTES = 1024 * 1024


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


# --------------------------------------------------------------------------
# streamed whole-solve kernel
# --------------------------------------------------------------------------


def _stream_kernel(
    idx_ref,  # SMEM (T, NB*bm) int32 physical row ids, -1 = padding
    eps_ref,  # SMEM (P,) per-problem eps_w
    A_ref,  # VMEM (bm*ncomp, n) row block, re/im interleaved when ncomp=2
    x0_ref,  # VMEM (1, ncomp, n)
    vl0_ref,  # VMEM (1, ncomp, m128, 128)
    u_ref,  # VMEM (1, ncomp, m128, 128)
    den_ref,  # VMEM (1, 1, m128, 128) per-problem 1/(‖a_i‖² + λ_eff)
    x_out,  # VMEM (1, ncomp, n) — revisited across (t, b): the carry
    vl_out,  # VMEM (1, ncomp, m128, 128)
    *,
    bm: int,
    nb: int,
    ncomp: int,
    prox: str,
):
    # Scalar reads/writes of the per-row vectors (u, denom, vl) use a
    # (m/128, 128) tiled layout: the dynamic index rides the SUBLANE dim
    # (arbitrary dynamic sublane slices lower fine; dynamic LANE indices
    # don't — Mosaic requires lane offsets provably ≡ 0 mod 128) and the
    # lane is selected with an iota mask + 128-wide reduction.
    p = pl.program_id(0)
    t = pl.program_id(1)
    b = pl.program_id(2)
    eps_w = eps_ref[p]
    # reuse mode ships ONE sweep's index row (SMEM is small; a cyclic
    # 64k-row × 20-sweep table would not fit)
    t_idx = t * 0 if idx_ref.shape[0] == 1 else t
    lane_iota = lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    @pl.when(jnp.logical_and(t == 0, b == 0))
    def _init():
        x_out[...] = x0_ref[...]
        vl_out[...] = vl0_ref[...]

    def body(j, _):
        i = idx_ref[t_idx, b * bm + j]
        valid = (i >= 0).astype(jnp.float32)
        i_s = jnp.maximum(i, 0)
        sub = i_s // 128
        lmask = (lane_iota == i_s % 128).astype(jnp.float32)

        def read(ref, c):
            return jnp.sum(ref[0, c, pl.ds(sub, 1), :] * lmask)

        d = read(den_ref, 0) * valid
        if ncomp == 1:
            row = A_ref[pl.ds(j, 1), :][0]
            xr = x_out[0, 0, :]
            tau = jnp.sum(row * xr)
            alpha = d * (read(u_ref, 0) - tau - eps_w * read(vl_out, 0))
            x_out[0, 0, :] = xr + alpha * row
            vl_out[0, 0, pl.ds(sub, 1), :] = (
                vl_out[0, 0, pl.ds(sub, 1), :] + (alpha * eps_w) * lmask
            )
        else:
            ar = A_ref[pl.ds(2 * j, 1), :][0]
            ai = A_ref[pl.ds(2 * j + 1, 1), :][0]
            xr = x_out[0, 0, :]
            xi = x_out[0, 1, :]
            # τ = a·x unconjugated (BLAS dotu semantics)
            taur = jnp.sum(ar * xr) - jnp.sum(ai * xi)
            taui = jnp.sum(ar * xi) + jnp.sum(ai * xr)
            alr = d * (read(u_ref, 0) - taur - eps_w * read(vl_out, 0))
            ali = d * (read(u_ref, 1) - taui - eps_w * read(vl_out, 1))
            # x += α·conj(a):  re += αr·ar + αi·ai,  im += αi·ar − αr·ai
            x_out[0, 0, :] = xr + alr * ar + ali * ai
            x_out[0, 1, :] = xi + ali * ar - alr * ai
            vl_out[0, 0, pl.ds(sub, 1), :] = (
                vl_out[0, 0, pl.ds(sub, 1), :] + (alr * eps_w) * lmask
            )
            vl_out[0, 1, pl.ds(sub, 1), :] = (
                vl_out[0, 1, pl.ds(sub, 1), :] + (ali * eps_w) * lmask
            )
        return 0

    lax.fori_loop(0, bm, body, 0)

    if prox == "positive" or (prox == "real" and ncomp == 2):

        @pl.when(b == nb - 1)
        def _prox():
            if prox == "positive":
                x_out[0, 0, :] = jnp.maximum(x_out[0, 0, :], 0.0)
            if ncomp == 2:  # Positive/Real both zero the imaginary plane
                x_out[0, 1, :] = x_out[0, 1, :] * 0.0


def kaczmarz_solve_pallas(
    A_rows,  # (R*ncomp, n) gathered rows in visit order (interleaved re/im)
    idx,  # (T, S_pad) int32 physical row ids, -1 = skip
    x0,  # (P, ncomp, n)
    vl0,  # (P, ncomp, m) — tiled to (m/128, 128) internally
    u,  # (P, ncomp, m)
    denom,  # (P, 1, m)
    eps_w,  # (P,)
    sweeps: int,  # T — number of sweeps (outer grid extent)
    reuse_rows: bool,  # True: same A_rows every sweep (cyclic/shuffled)
    prox: str = "none",  # "none" | "positive" | "real"
    block_rows: int | None = None,
    interpret: bool = False,
):
    """Whole multi-sweep Kaczmarz solve with HBM-streamed row blocks.

    Returns (x, vl) of shapes (P, ncomp, n) / (P, ncomp, m). `A_rows`
    holds the visited rows contiguously in visit order — one sweep's worth
    when `reuse_rows` (idx is (1, S); the block pipeline re-fetches the
    same blocks each sweep) or all T·S rows otherwise (randomized
    per-sweep sets, idx is (T, S)). S must be a block multiple; pad idx
    with -1 and the gather with clamped indices (solve_kaczmarz_streamed
    does both).
    """
    P, ncomp, n = x0.shape
    m = u.shape[-1]
    T_idx, S_pad = idx.shape
    dt = x0.dtype
    m128 = -(-m // 128)

    def tile128(v):  # (P, c, m) → (P, c, m/128, 128) zero-padded
        pad = m128 * 128 - m
        if pad:
            v = jnp.concatenate(
                [v, jnp.zeros(v.shape[:-1] + (pad,), v.dtype)], axis=-1
            )
        return v.reshape(v.shape[0], v.shape[1], m128, 128)

    vl0 = tile128(vl0)
    u = tile128(u)
    denom = tile128(denom)

    if block_rows is None:
        block_rows = pick_block_rows(S_pad, n, ncomp)
    bm = min(block_rows, S_pad)
    if S_pad % bm != 0:
        raise ValueError(
            f"sweep length {S_pad} must be a multiple of block_rows {bm} — "
            "pad the index table (-1 entries) and row gather to a block "
            "multiple before calling (see solve_kaczmarz_streamed)"
        )
    nb = S_pad // bm
    if reuse_rows and T_idx != 1:
        raise ValueError("reuse_rows expects a single-sweep (1, S) idx table")
    if not reuse_rows and T_idx != sweeps:
        raise ValueError(f"idx has {T_idx} sweeps, expected {sweeps}")
    rows_needed = (S_pad if reuse_rows else sweeps * S_pad) * ncomp
    if A_rows.shape[0] != rows_needed:
        raise ValueError(
            f"A_rows has {A_rows.shape[0]} rows, expected {rows_needed}"
        )

    if reuse_rows:
        a_map = lambda p_, t_, b_: (b_, 0)
    else:
        a_map = lambda p_, t_, b_: (t_ * nb + b_, 0)

    x_new, vl_new = pl.pallas_call(
        functools.partial(
            _stream_kernel, bm=bm, nb=nb, ncomp=ncomp, prox=prox
        ),
        grid=(P, sweeps, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # idx
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eps_w
            pl.BlockSpec((bm * ncomp, n), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, ncomp, n), lambda p_, t_, b_: (p_, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ncomp, m128, 128), lambda p_, t_, b_: (p_, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ncomp, m128, 128), lambda p_, t_, b_: (p_, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, m128, 128), lambda p_, t_, b_: (p_, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, ncomp, n), lambda p_, t_, b_: (p_, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ncomp, m128, 128), lambda p_, t_, b_: (p_, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P, ncomp, n), dt),
            jax.ShapeDtypeStruct((P, ncomp, m128, 128), dt),
        ),
        interpret=interpret,
    )(
        idx.astype(jnp.int32),
        jnp.asarray(eps_w, dt).reshape(P),
        A_rows.astype(dt),
        x0,
        vl0,
        u,
        denom.astype(dt),
    )
    return x_new, vl_new.reshape(P, ncomp, m128 * 128)[..., :m]


def pick_block_rows(S: int, n: int, ncomp: int) -> int:
    """~2 MiB row blocks (double-buffered by the pipeline), multiple of 8."""
    br = max(8, min(S, (2 * 1024 * 1024) // max(ncomp * n * 4, 1)))
    br -= br % 8
    return max(8, br)


def check_kaczmarz_streamed(solver):
    """Validate `solver` for the streamed whole-solve Kaczmarz kernel
    (raises ValueError naming the unsupported piece)."""
    from ..models.prox import PositiveRegularization, RealRegularization
    from ..models.solvers.kaczmarz import Kaczmarz

    if not isinstance(solver, Kaczmarz):
        raise ValueError("streamed path requires a Kaczmarz solver")
    if solver.greedy:
        raise ValueError(
            "greedy row selection is residual-driven and cannot be "
            "precomputed; use the scan path"
        )
    from ..ops.sparse import PaddedCSROperator

    if not (hasattr(solver.A, "mat") or isinstance(solver.A, PaddedCSROperator)):
        raise ValueError(
            "streamed path requires a dense or padded-CSR operator"
        )
    if solver.randomized and solver.precomputed_order is None:
        raise ValueError(
            "randomized mode needs a host-precomputed order — construct "
            "with Kaczmarz.create(..., precompute_order=True)"
        )
    for r in solver.reg:
        if not isinstance(r, (PositiveRegularization, RealRegularization)):
            raise ValueError(
                "streamed path supports only Positive/Real projections as "
                f"extra terms, got {type(r).__name__}"
            )
    # VMEM feasibility: per-problem u/vl/denom live as (m/128, 128) VMEM
    # tiles plus x planes and the streamed row block — gate so the auto
    # dispatcher falls back to the composed path instead of a Mosaic OOM
    m, n = solver.A.out_size, solver.A.in_size
    ncomp = 2 if jnp.issubdtype(solver.A.dtype, jnp.complexfloating) else 1
    vmem_bytes = (
        (2 * ncomp + 1) * (-(-m // 128) * 128)  # u, vl, denom tiles
        + 2 * ncomp * n  # x in/out planes
    ) * 4 + 2 * 2 * 1024 * 1024  # double-buffered row block
    if vmem_bytes > 12 * 1024 * 1024:
        raise ValueError(
            f"streamed Kaczmarz working set ~{vmem_bytes/2**20:.0f} MiB "
            "exceeds VMEM; use the scan path"
        )
    # SMEM index-table gate: randomized mode CHUNKS the solve over sweeps
    # (solve_kaczmarz_streamed), so each kernel call ships only a
    # (chunk, S_pad) slice of the visit-order table to SMEM and gathers
    # only that chunk's rows into HBM — the chunk size is chosen to fit
    # both budgets, so the only hard limits are per-SWEEP: a single
    # sweep's table row must fit SMEM (1 MiB) and its row gather the
    # chunk budget. Cyclic/shuffled mode reuses one (1, m) table/gather.
    ncomp_b = ncomp
    if solver.randomized and solver.precomputed_order is not None:
        T_i, S_i = solver.precomputed_order.shape
    else:
        T_i, S_i = 1, m
    bm_i = pick_block_rows(S_i, n, ncomp_b)
    s_pad = S_i + ((-S_i) % min(bm_i, S_i))
    table_bytes = s_pad * 4  # one sweep's SMEM table row
    if table_bytes > _SMEM_TABLE_BUDGET_BYTES:
        raise ValueError(
            f"streamed Kaczmarz per-sweep index row of {s_pad} int32 "
            f"(~{table_bytes/2**10:.0f} KiB) exceeds the 1 MiB SMEM "
            "budget; reduce the sub-matrix size or use the scan path"
        )
    # HBM gather gate: one sweep's gathered rows must fit the chunk
    # budget (the sweep-chunked driver never materializes more than one
    # chunk at a time, so the old T× amplification cannot occur).
    rows_bytes = s_pad * ncomp_b * n * 4
    if rows_bytes > _GATHER_CHUNK_BUDGET_BYTES:
        raise ValueError(
            f"streamed Kaczmarz single-sweep row gather ~"
            f"{rows_bytes/2**20:.0f} MiB exceeds the "
            f"{_GATHER_CHUNK_BUDGET_BYTES/2**20:.0f} MiB HBM chunk "
            "budget; reduce the sub-matrix size or use the scan path"
        )
    if any(isinstance(r, PositiveRegularization) for r in solver.reg):
        return "positive"
    if any(isinstance(r, RealRegularization) for r in solver.reg):
        return "real"
    return "none"


def _split_planes(v, ncomp):
    """(P, k) real/complex → (P, ncomp, k) f32 split planes."""
    if ncomp == 1:
        return v[:, None, :].real.astype(jnp.float32)
    return jnp.stack([v.real, v.imag], axis=1).astype(jnp.float32)


def solve_kaczmarz_streamed(
    solver,
    B_mat,
    interpret: bool | None = None,
    block_rows: int | None = None,
    chunk_sweeps: int | None = None,
):
    """Drop-in fast path for `solve_batched_unrolled(solver, B)` on a
    Kaczmarz solver: the multi-sweep solve runs as one Pallas call (or a
    short `lax.scan` of chunked calls, see below) with A streamed from
    HBM in row blocks — no VMEM size limit, complex systems in split-real
    form, randomized orders from the precomputed table, batch of problems
    on the leading grid axis. Returns the n×K solution matrix (complex
    when the system is complex).

    Randomized mode gathers each sweep's visited rows contiguously. To
    bound the transient HBM copy (formerly a T× amplification of A) and
    the per-call SMEM table, the solve is CHUNKED over sweeps: at most
    `chunk_sweeps` sweeps (default: fitted to the 256 MiB gather / 1 MiB
    SMEM budgets) are gathered and solved per kernel call, with (x, vl)
    carried between calls under a `lax.scan` — only one chunk's gather
    is ever live.

    Semantics mirror Kaczmarz.step (kaczmarz.py; reference
    Kaczmarz.jl:264-317) with the same per-sweep Positive/Real projection.
    """
    prox = check_kaczmarz_streamed(solver)
    is_csr = not hasattr(solver.A, "mat")
    if is_csr:  # PaddedCSROperator (check validated the type)
        csr_vals = jnp.asarray(solver.A.vals)
        csr_cols = jnp.asarray(solver.A.cols)
        a_dtype = csr_vals.dtype
    else:
        mat = jnp.asarray(solver.A.mat)
        a_dtype = mat.dtype
    is_complex = jnp.issubdtype(a_dtype, jnp.complexfloating)
    ncomp = 2 if is_complex else 1
    m, n = solver.A.out_size, solver.A.in_size
    T = solver.iterations

    B_mat = jnp.asarray(B_mat)
    if not is_complex and jnp.issubdtype(B_mat.dtype, jnp.complexfloating):
        # real A, complex b: the row recurrence decouples exactly into two
        # real problems (τ, α, and every update split componentwise), so
        # solve [Re B, Im B] as 2K stacked problems and recombine
        if prox != "none":
            raise ValueError(
                "streamed path: Positive/Real projections act on the "
                "COMPLEX iterate and do not decouple for a real A with "
                "complex b; use the scan path"
            )
        re = solve_kaczmarz_streamed(
            solver,
            jnp.concatenate([B_mat.real, B_mat.imag], axis=1),
            interpret=interpret,
            block_rows=block_rows,
            chunk_sweeps=chunk_sweeps,
        )
        K = B_mat.shape[1]
        return (re[:, :K] + 1j * re[:, K:]).astype(B_mat.dtype)
    bt = B_mat.T  # (P, m)
    states = jax.vmap(solver.init)(bt)
    P = bt.shape[0]

    if solver.randomized:
        order = solver.precomputed_order  # (T, K)
        reuse = False
    else:
        order = solver.perm[None, :]  # (1, m) cyclic or shuffled
        reuse = True
    S = order.shape[1]
    bm = block_rows if block_rows is not None else pick_block_rows(S, n, ncomp)
    bm = min(bm, S)
    pad = (-S) % bm
    if pad:
        order = jnp.concatenate(
            [order, jnp.full((order.shape[0], pad), -1, jnp.int32)], axis=1
        )
    S_pad = order.shape[1]

    def gather_rows(idx_tab):
        visit = jnp.maximum(idx_tab.reshape(-1), 0)  # clamp the -1 pads
        if is_csr:
            # densify ONLY the visited rows (scatter-add: padding entries
            # are val 0 at col 0, so they contribute nothing, and the add
            # keeps genuine col-0 values intact); storage stays O(nnz),
            # the transient dense chunk is bounded by the chunk budget
            v = csr_vals[visit]  # (R, k_max)
            c = csr_cols[visit]
            g = jnp.zeros((visit.shape[0], n), a_dtype)
            g = g.at[
                jnp.arange(visit.shape[0])[:, None], c
            ].add(v)
        else:
            g = mat[visit]  # rows in visit order
        if ncomp == 2:
            return jnp.stack([g.real, g.imag], axis=1).reshape(-1, n)
        return g

    x0 = _split_planes(states.x, ncomp)
    vl0 = _split_planes(states.vl, ncomp)
    u = _split_planes(states.u, ncomp)
    denom = states.denom.real.astype(jnp.float32)[:, None, :]
    eps_w = states.eps_w.real.astype(jnp.float32)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if chunk_sweeps is None:
        # randomized mode gathers each sweep's rows contiguously; bound
        # the transient HBM copy AND the per-call SMEM table by running
        # the solve in sweep chunks with (x, vl) carried between calls
        chunk_sweeps = max(
            1,
            min(
                _GATHER_CHUNK_BUDGET_BYTES // max(S_pad * ncomp * n * 4, 1),
                _SMEM_TABLE_BUDGET_BYTES // max(S_pad * 4, 1),
            ),
        )
    if not reuse and T > chunk_sweeps:
        C = chunk_sweeps
        n_chunks = -(-T // C)
        pad_t = n_chunks * C - T
        if pad_t:
            # padded sweeps are all -1 rows: every update is masked out
            # and the between-sweep Positive/Real projections are
            # idempotent, so extra sweeps are exact no-ops
            order = jnp.concatenate(
                [order, jnp.full((pad_t, S_pad), -1, jnp.int32)], axis=0
            )
        chunks = order.astype(jnp.int32).reshape(n_chunks, C, S_pad)

        def body(carry, idx_c):
            x_c, vl_c = carry
            x_n, vl_n = kaczmarz_solve_pallas(
                gather_rows(idx_c),
                idx_c,
                x_c,
                vl_c,
                u,
                denom,
                eps_w,
                sweeps=C,
                reuse_rows=False,
                prox=prox,
                block_rows=bm,
                interpret=interpret,
            )
            return (x_n, vl_n), None

        (x, _), _ = lax.scan(body, (x0, vl0), chunks)
    else:
        x, _ = kaczmarz_solve_pallas(
            gather_rows(order),
            order.astype(jnp.int32),
            x0,
            vl0,
            u,
            denom,
            eps_w,
            sweeps=T,
            reuse_rows=reuse,
            prox=prox,
            block_rows=bm,
            interpret=interpret,
        )
    if ncomp == 2:
        sol = (x[:, 0, :] + 1j * x[:, 1, :]).astype(a_dtype)
    else:
        sol = x[:, 0, :]
    if solver.tikhonov_inv_sqrt is not None:
        # undo the standard-form transform (reference Kaczmarz.jl:257-259)
        sol = sol * solver.tikhonov_inv_sqrt.astype(sol.dtype)[None, :]
    return sol.T
