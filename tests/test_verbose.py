"""Verbose smoke test (reference testSolvers.jl:220-237): solvers run with
verbose output without erroring."""

import jax.numpy as jnp
import numpy as np

import rls_tpu as rt
from rls_tpu import solve_with_callbacks


def test_verbose_smoke(rng, capsys):
    A = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    b = A @ jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    s = rt.FISTA.create(A, reg=rt.L1Regularization(1e-5), iterations=5, verbose=True)
    solve_with_callbacks(s, b)
    out = capsys.readouterr().out
    assert "Iteration" in out and "residual" in out
