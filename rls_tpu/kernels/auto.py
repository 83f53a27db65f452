"""Automatic fast-path dispatch for batched fixed-iteration solves.

`solve_batched_fast(solver, B)` tries each fused whole-solve Pallas kernel
wrapper in turn — the wrappers validate their own requirements and raise
ValueError naming the unsupported piece — and falls back to the composed
`solve_batched_unrolled` driver when none applies. This gives reference
users a single call with the performance of the fused kernels where the
problem shape allows (docs/tpu.md).

Numerics note: the fused proximal-gradient kernels use an f64
host-precomputed momentum table, so results can differ from the composed
path at the ~1e-3 level over ~50 iterations (the table is the more
accurate of the two).
"""

from __future__ import annotations

from .admm_tv_fused import solve_admm_tv_fused
from .fista_l1_dft_fused import solve_fista_l1_dft_fused
from .sense_fused import solve_fista_l21_sense_fused
from .fista_tv_fused import solve_pgm_tv_fused

__all__ = ["solve_batched_fast"]

_FUSED_WRAPPERS = (
    solve_pgm_tv_fused,
    solve_admm_tv_fused,
    solve_fista_l1_dft_fused,
    solve_fista_l21_sense_fused,
)


def solve_batched_fast(solver, B, interpret=None):
    """Batched fixed-iteration solve via the fastest applicable path."""
    for wrapper in _FUSED_WRAPPERS:
        try:
            return wrapper(solver, B, interpret=interpret)
        except ValueError:
            continue
    from ..models.solvers.base import solve_batched_unrolled

    return solve_batched_unrolled(solver, B)
