"""Automatic fast-path dispatch for batched fixed-iteration solves.

`solve_batched_fast(solver, B)` runs each fused whole-solve Pallas kernel's
*applicability check* in turn — the checks validate solver/operator/reg
requirements and raise ValueError naming the unsupported piece — and runs
the first kernel whose check passes. Execution errors are NOT swallowed:
once a check passes, any error from the kernel itself propagates. When no
fused kernel applies, a warning lists every rejection reason and the call
falls back to the composed `solve_batched_unrolled` driver (docs/tpu.md).

Numerics note: the fused proximal-gradient kernels use an f64
host-precomputed momentum table, so results can differ from the composed
path at the ~1e-3 level over ~50 iterations (the table is the more
accurate of the two).
"""

from __future__ import annotations

import warnings

from .admm_tv_fused import check_admm_tv_fused, solve_admm_tv_fused
from .cgnr_fused import check_cgnr_fused, solve_cgnr_fused
from .admm_tv_tiled import check_admm_tv_tiled, solve_admm_tv_tiled
from .fista_l1_dft_fused import (
    check_fista_l1_dft_fused,
    solve_fista_l1_dft_fused,
)
from .kaczmarz_greedy import check_kaczmarz_greedy, solve_kaczmarz_greedy
from .pdhg_fused import check_pdhg_fused, solve_pdhg_fused
from .pgm_dense_fused import check_pgm_dense_fused, solve_pgm_dense_fused
from .kaczmarz_pallas import check_kaczmarz_streamed, solve_kaczmarz_streamed
from .sense_fused import check_fista_l21_sense_fused, solve_fista_l21_sense_fused
from .fista_tv_fused import check_pgm_tv_fused, solve_pgm_tv_fused
from .fista_tv_tiled import check_fista_tv_tiled, solve_fista_tv_tiled
from .splitbregman_fused import (
    check_splitbregman_l1_tv_fused,
    solve_splitbregman_l1_tv_fused,
)

__all__ = ["solve_batched_fast"]

_FUSED_WRAPPERS = (
    ("cgnr_dense", check_cgnr_fused, solve_cgnr_fused),
    ("pgm_tv", check_pgm_tv_fused, solve_pgm_tv_fused),
    ("pgm_dense", check_pgm_dense_fused, solve_pgm_dense_fused),
    # beyond the monolithic kernel's VMEM ceiling: row-tiled streaming
    ("fista_tv_tiled", check_fista_tv_tiled, solve_fista_tv_tiled),
    ("admm_tv", check_admm_tv_fused, solve_admm_tv_fused),
    # beyond the monolithic ADMM kernel's VMEM ceiling: tiled z-update
    ("admm_tv_tiled", check_admm_tv_tiled, solve_admm_tv_tiled),
    ("splitbregman_l1_tv", check_splitbregman_l1_tv_fused,
     solve_splitbregman_l1_tv_fused),
    ("fista_l1_dft", check_fista_l1_dft_fused, solve_fista_l1_dft_fused),
    ("fista_l21_sense", check_fista_l21_sense_fused, solve_fista_l21_sense_fused),
    ("pdhg", check_pdhg_fused, solve_pdhg_fused),
    ("kaczmarz_greedy", check_kaczmarz_greedy, solve_kaczmarz_greedy),
    ("kaczmarz_streamed", check_kaczmarz_streamed, solve_kaczmarz_streamed),
)


def solve_batched_fast(solver, B, interpret=None, warn=True):
    """Batched fixed-iteration solve via the fastest applicable path.

    Tries each fused kernel's check; runs the first that applies. Falls
    back to `solve_batched_unrolled` with a `UserWarning` naming why every
    fused path was rejected (pass ``warn=False`` to silence).

    A `SplitRealSolver` (the auto twin of a complex problem on
    complex-free runtimes, models/split_real.py) embeds B host-side,
    dispatches its REAL twin through the same fast-path table, and
    returns numpy complex64.
    """
    from ..models.split_real import SplitRealSolver

    if isinstance(solver, SplitRealSolver):
        xs = solve_batched_fast(
            solver.inner, solver.embed_b(B), interpret=interpret, warn=warn
        )
        return solver.assemble(xs)
    reasons = []
    for name, check, run in _FUSED_WRAPPERS:
        try:
            check(solver)
        except ValueError as e:
            reasons.append(f"{name}: {e}")
            continue
        return run(solver, B, interpret=interpret)
    if warn:
        warnings.warn(
            "solve_batched_fast: no fused kernel applies; falling back to "
            "the composed solve_batched_unrolled path. Rejections: "
            + "; ".join(reasons),
            UserWarning,
            stacklevel=2,
        )
    from ..models.solvers.base import solve_batched_unrolled

    return solve_batched_unrolled(solver, B)
