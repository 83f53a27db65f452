"""Callback protocol, mirroring /root/reference/test/testCallbacks.jl:
iteration counts (n+1 including iteration 0), stored solutions match the
final one, multiple callbacks, plus the jit-friendly solve_trace analog."""

import jax.numpy as jnp
import numpy as np

import rls_tpu as rt
from rls_tpu import solve, solve_trace, solve_with_callbacks


def _problem(rng):
    A = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    return A, x, A @ x


def test_store_solution_callback(rng):
    A, xt, b = _problem(rng)
    iters = 15
    s = rt.FISTA.create(A, reg=rt.L1Regularization(1e-5), iterations=iters)
    cb = rt.StoreSolutionCallback()
    x = solve_with_callbacks(s, b, callbacks=cb)
    # n+1 invocations including iteration 0
    assert len(cb.solutions) == iters + 1
    np.testing.assert_allclose(cb.solutions[-1], np.asarray(x), atol=1e-6)
    assert np.linalg.norm(cb.solutions[0]) == 0.0  # x starts at zero


def test_multiple_callbacks_and_convergence(rng):
    A, xt, b = _problem(rng)
    s = rt.FISTA.create(A, reg=rt.L1Regularization(1e-5), iterations=10)
    conv = rt.StoreConvergenceCallback()
    cmp = rt.CompareSolutionCallback(np.asarray(xt))
    counts = []
    x = solve_with_callbacks(
        s, b, callbacks=[conv, cmp, lambda run, it: counts.append(it)]
    )
    assert counts == list(range(11))
    assert len(conv.conv_meas["residual"]) == 11
    assert len(cmp.results) == 11
    # the comparison metric must shrink
    assert cmp.results[-1] < cmp.results[1]


def test_solve_trace(rng):
    A, xt, b = _problem(rng)
    s = rt.FISTA.create(A, reg=rt.L1Regularization(1e-5), iterations=12)
    x, (xs, metrics, active) = solve_trace(s, b)
    assert xs.shape == (12, 4)
    assert metrics["residual"].shape == (12,)
    np.testing.assert_allclose(np.asarray(xs[-1]), np.asarray(x), atol=1e-6)
    # trace final equals plain solve
    np.testing.assert_allclose(np.asarray(solve(s, b)), np.asarray(x), atol=1e-6)
