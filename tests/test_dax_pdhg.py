"""Dax row-relaxation solvers and the PDHG primal-dual solver (both
disabled upstream — DAXKaczmarz.jl / DAXConstrained.jl /
PrimalDualSolver.jl — but part of the reference API surface)."""

import jax.numpy as jnp
import numpy as np
import pytest

import rls_tpu as rt
from rls_tpu import solve


def _overdetermined(rng, m=16, n=6):
    A = rng.normal(size=(m, n)).astype(np.float32)
    x = rng.normal(size=(n,)).astype(np.float32)
    return jnp.asarray(A), jnp.asarray(x), jnp.asarray(A @ x)


def test_dax_kaczmarz(rng):
    A, xt, b = _overdetermined(rng)
    s = rt.DaxKaczmarz.create(A, lam=1e-6, iterations=10, iterations_inner=4)
    x = solve(s, b)
    err = float(jnp.linalg.norm(x - xt) / jnp.linalg.norm(xt))
    assert err < 0.1


def test_dax_kaczmarz_positive(rng):
    A, xt, b = _overdetermined(rng)
    xt_pos = jnp.abs(xt)
    b = A @ xt_pos
    s = rt.DaxKaczmarz.create(
        A, lam=1e-6, iterations=10, iterations_inner=4, enforce_positive=True,
        enforce_real=True,
    )
    x = solve(s, b)
    assert float(jnp.min(x)) >= 0


def test_dax_constrained(rng):
    A, xt, b = _overdetermined(rng)
    xt_pos = jnp.abs(xt)
    b = A @ xt_pos
    s = rt.DaxConstrained.create(A, lam=1e-6, iterations=10, iterations_inner=3)
    x = solve(s, b)
    assert float(jnp.min(x)) >= -1e-4  # Bx >= 0 with B = I
    err = float(jnp.linalg.norm(x - xt_pos) / jnp.linalg.norm(xt_pos))
    assert err < 0.1


def test_pdhg_l1(rng):
    A, xt, b = _overdetermined(rng, m=20, n=8)
    s = rt.PDHG.create(A, reg=rt.L1Regularization(1e-4), iterations=400)
    x = solve(s, b)
    err = float(jnp.linalg.norm(x - xt) / jnp.linalg.norm(xt))
    assert err < 0.1


def test_pdhg_tv(rng):
    n = 8
    img = np.zeros((n, n), np.float32)
    img[2:6, 3:7] = 1.0
    xt = jnp.asarray(img.reshape(-1))
    A = jnp.asarray(rng.normal(size=(2 * n * n, n * n)).astype(np.float32)) / n
    b = A @ xt
    s = rt.PDHG.create(
        A, reg=rt.TVRegularization(1e-4, shape=(n, n)), shape=(n, n),
        iterations=500,
    )
    x = solve(s, b)
    err = float(jnp.linalg.norm(x - xt) / jnp.linalg.norm(xt))
    assert err < 0.1


def test_dax_by_name(rng):
    A, xt, b = _overdetermined(rng)
    s = rt.create_linear_solver("DaxKaczmarz", A, lam=1e-6, iterations=8,
                                iterations_inner=4)
    x = solve(s, b)
    assert float(jnp.linalg.norm(x - xt) / jnp.linalg.norm(xt)) < 0.1
