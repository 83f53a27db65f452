"""Per-iteration callbacks for the host-loop driver.

Behavioral port of /root/reference/src/Callbacks.jl. Callbacks receive
``(run, iteration)`` where ``run`` is a `SolverRun` exposing `.solution`,
`.convergence` and `.state` — the analog of the reference's
``callback(solver, iteration)``. For jit-compatible tracing without host
callbacks use `solve_trace` instead.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .utils.misc import nrmsd

__all__ = [
    "CompareSolutionCallback",
    "StoreSolutionCallback",
    "StoreConvergenceCallback",
]


class CompareSolutionCallback:
    """cmp(ref, solution) per iteration, stored in `results`
    (reference Callbacks.jl:2-18)."""

    def __init__(self, ref, cmp: Callable = nrmsd):
        self.ref = ref
        self.cmp = cmp
        self.results: list[float] = []

    def __call__(self, run, iteration):
        self.results.append(float(self.cmp(self.ref, run.solution)))


class StoreSolutionCallback:
    """Accumulates the solution per iteration (reference Callbacks.jl:20-33)."""

    def __init__(self):
        self.solutions = []

    def __call__(self, run, iteration):
        self.solutions.append(np.asarray(run.solution).copy())


class StoreConvergenceCallback:
    """Accumulates convergence metrics per iteration
    (reference Callbacks.jl:35-52)."""

    def __init__(self):
        self.conv_meas: dict[str, list] = {}

    def __call__(self, run, iteration):
        meas = run.convergence
        for key, val in meas.items():
            self.conv_meas.setdefault(key, []).append(np.asarray(val))
