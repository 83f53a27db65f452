"""FunctionOperator (auto-adjoint) and RadonOperator tests."""

import jax
import jax.numpy as jnp
import numpy as np

import rls_tpu as rt
from rls_tpu import solve


def test_function_operator_adjoint(rng):
    mat = jnp.asarray(
        (rng.normal(size=(10, 6)) + 1j * rng.normal(size=(10, 6))).astype(
            np.complex64
        )
    )
    op = rt.FunctionOperator(mv_fn=lambda x: mat @ x, n=6, m=10, _dtype=jnp.complex64)
    x = jnp.asarray(
        (rng.normal(size=(6,)) + 1j * rng.normal(size=(6,))).astype(np.complex64)
    )
    y = jnp.asarray(
        (rng.normal(size=(10,)) + 1j * rng.normal(size=(10,))).astype(np.complex64)
    )
    lhs = jnp.vdot(y, op.mv(x))
    rhs = jnp.vdot(op.rmv(y), x)
    assert abs(complex(lhs - rhs)) < 1e-4
    np.testing.assert_allclose(
        np.asarray(op.rmv(y)), np.asarray(mat.conj().T @ y), atol=1e-5
    )


def test_function_operator_in_solver(rng):
    mat = jnp.asarray(rng.normal(size=(12, 8)).astype(np.float32))
    op = rt.FunctionOperator(mv_fn=lambda x: mat @ x, n=8, m=12, _dtype=jnp.float32)
    xt = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    b = op.mv(xt)
    s = rt.CGNR.create(op, reg=rt.L2Regularization(1e-6), iterations=30)
    x = solve(s, b)
    assert float(jnp.linalg.norm(x - xt) / jnp.linalg.norm(xt)) < 0.02


def test_radon_adjoint(rng):
    R = rt.RadonOperator(
        angles=jnp.linspace(0, np.pi, 10, endpoint=False), im_shape=(12, 12)
    )
    x = jnp.asarray(rng.normal(size=(R.in_size,)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(R.out_size,)), jnp.float32)
    lhs = float(jnp.vdot(y, R.mv(x)))
    rhs = float(jnp.vdot(R.rmv(y), x))
    assert abs(lhs - rhs) < 1e-3 * (abs(lhs) + 1)


def test_radon_recon(rng):
    N = 24
    yy, xx = np.mgrid[0:N, 0:N]
    c = (N - 1) / 2
    img = ((((yy - c) / (0.35 * N)) ** 2 + ((xx - c) / (0.3 * N)) ** 2) <= 1).astype(
        np.float32
    )
    xt = jnp.asarray(img.reshape(-1))
    R = rt.RadonOperator(
        angles=jnp.linspace(0, np.pi, 36, endpoint=False), im_shape=(N, N)
    )
    b = R.mv(xt)
    s = rt.CGNR.create(R, reg=rt.L2Regularization(0.1), iterations=30)
    x = solve(s, b)
    err = float(jnp.linalg.norm(x - xt) / jnp.linalg.norm(xt))
    assert err < 0.2  # sparse-view CT at modest accuracy
