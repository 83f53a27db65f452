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


def test_pdhg_tv_isotropic_scheme(rng):
    """The pre-parity isotropic dual projection stays available."""
    n = 8
    img = np.zeros((n, n), np.float32)
    img[2:6, 3:7] = 1.0
    xt = jnp.asarray(img.reshape(-1))
    A = jnp.asarray(rng.normal(size=(2 * n * n, n * n)).astype(np.float32)) / n
    b = A @ xt
    s = rt.PDHG.create(
        A, reg=rt.TVRegularization(1e-4, shape=(n, n)), shape=(n, n),
        iterations=500, tv_scheme="isotropic",
    )
    x = solve(s, b)
    err = float(jnp.linalg.norm(x - xt) / jnp.linalg.norm(xt))
    assert err < 0.1


def test_grad8_adjoint_and_stencil(rng):
    """Grad8Operator matches the reference BB stencil and its rmv is the
    exact adjoint (<y, Gx> == <Gᵀy, x>)."""
    from rls_tpu.ops.grad import Grad8Operator

    m, n = 6, 7
    op = Grad8Operator(im_shape=(m, n), _dtype=jnp.float32)
    u = rng.normal(size=(m, n)).astype(np.float32)
    p = np.asarray(op.mv(jnp.asarray(u.reshape(-1)))).reshape(8, m, n)
    # direct transcription of BB (PrimalDualSolver.jl:149-156)
    want = np.zeros((8, m, n), np.float32)
    want[0, : m - 1, :] = u[: m - 1, :] - u[1:, :]
    want[1, :, : n - 1] = u[:, : n - 1] - u[:, 1:]
    want[2, : m - 1, : n - 1] = u[: m - 1, : n - 1] - u[1:, 1:]
    want[3, : m - 1, 1:] = u[: m - 1, 1:] - u[1:, : n - 1]
    want[4, : m - 2, : n - 1] = u[: m - 2, : n - 1] - u[2:, 1:]
    want[5, : m - 2, 1:] = u[: m - 2, 1:] - u[2:, : n - 1]
    want[6, : m - 1, : n - 2] = u[: m - 1, : n - 2] - u[1:, 2:]
    want[7, : m - 1, 2:] = u[: m - 1, 2:] - u[1:, : n - 2]
    np.testing.assert_allclose(p, want, atol=1e-6)

    y = jnp.asarray(rng.normal(size=(8 * m * n,)), jnp.float32)
    x = jnp.asarray(u.reshape(-1))
    lhs = float(jnp.vdot(y, op.mv(x)))
    rhs = float(jnp.vdot(op.rmv(y), x))
    assert abs(lhs - rhs) < 1e-4 * (abs(lhs) + 1)


def test_prox_tv_conj_8dir_semantics(rng):
    """Sequential weighted thresholding: a numpy transcription of the
    reference's in-place loops (ProxTVConj, PrimalDualSolver.jl:208-302)
    must match exactly."""
    from rls_tpu.models.solvers.pdhg import prox_tv_conj_8dir

    m, n = 5, 6
    alpha = 0.4
    p = rng.normal(size=(8, m, n)).astype(np.float32)
    got = np.asarray(
        prox_tv_conj_8dir(jnp.asarray(p.reshape(-1)), alpha, (m, n))
    ).reshape(8, m, n)

    s5, s2 = np.sqrt(5.0), np.sqrt(2.0)
    w = [s5 - 2, s5 - 2, s5 - 1.5 * s2, s5 - 1.5 * s2] + [
        (1 + s2 - s5) / 2
    ] * 4
    ref = p.astype(np.float64).copy()
    for k in range(8):
        gn = np.sqrt((ref**2).sum(axis=0))
        ref[k] = w[k] * np.sign(ref[k]) * np.minimum(gn, alpha)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_pdhg_8dir_falls_back_for_3d_and_complex(rng):
    """The 8-direction scheme is strictly 2-D/real; create() must fall
    back to the isotropic projection instead of crashing or silently
    computing a wrong complex dual prox."""
    n = 6
    # 3-D TV shape
    A = jnp.asarray(rng.normal(size=(2 * n * n * 2, 2 * n * n)), jnp.float32)
    s = rt.PDHG.create(
        A, reg=rt.TVRegularization(1e-4, shape=(2, n, n)), shape=(2, n, n),
        iterations=2,
    )
    assert s.tv_scheme == "isotropic"
    # complex operator
    Ac = jnp.asarray(
        rng.normal(size=(2 * n * n, n * n))
        + 1j * rng.normal(size=(2 * n * n, n * n)),
        jnp.complex64,
    )
    s = rt.PDHG.create(
        Ac, reg=rt.TVRegularization(1e-4, shape=(n, n)), shape=(n, n),
        iterations=2,
    )
    assert s.tv_scheme == "isotropic"
