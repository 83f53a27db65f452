from .base import (
    LinearSolver,
    pcg,
    solve,
    solve_batched,
    solve_trace,
    solve_with_callbacks,
)
from .cgnr import CGNR
from .fista import FISTA

__all__ = [
    "LinearSolver",
    "solve",
    "solve_trace",
    "solve_with_callbacks",
    "solve_batched",
    "pcg",
    "CGNR",
    "FISTA",
]
