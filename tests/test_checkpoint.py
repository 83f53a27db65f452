"""Checkpoint/resume (SURVEY.md §5.4) and SamplingOperator."""

import jax.numpy as jnp
import numpy as np

import rls_tpu as rt
from rls_tpu import solve
from rls_tpu.utils.checkpoint import load_state, resume, save_state


def test_checkpoint_resume(rng, tmp_path):
    A = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    xt = jnp.asarray(rng.normal(size=(5,)).astype(np.float32))
    b = A @ xt
    s = rt.FISTA.create(A, reg=rt.L1Regularization(1e-5), iterations=40)

    # run 15 steps, checkpoint, reload, resume — must equal the full solve
    state = s.init(b)
    for _ in range(15):
        state = s.step(state)
    path = str(tmp_path / "ckpt.npz")
    save_state(path, state)

    template = s.init(b)
    restored = load_state(path, template)
    x_resumed, _ = resume(s, restored)
    x_full = solve(s, b)
    np.testing.assert_allclose(np.asarray(x_resumed), np.asarray(x_full), atol=1e-6)


def test_sampling_operator(rng):
    idx = jnp.asarray([1, 4, 7], jnp.int32)
    op = rt.SamplingOperator(idx=idx, n=10)
    x = jnp.asarray(rng.normal(size=(10,)), jnp.float32)
    np.testing.assert_allclose(np.asarray(op.mv(x)), np.asarray(x)[[1, 4, 7]])
    y = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    lhs = jnp.vdot(y, op.mv(x))
    rhs = jnp.vdot(op.rmv(y), x)
    assert abs(float(lhs - rhs)) < 1e-5
    np.testing.assert_allclose(
        np.asarray(op.normal(x)), np.asarray(op.rmv(op.mv(x))), atol=1e-6
    )


def test_time_solver(rng):
    import jax

    A = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    b = A @ jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    s = rt.CGNR.create(A, reg=rt.L2Regularization(1e-4), iterations=5)
    stats = rt.time_solver(jax.jit(solve), s, b, reps=2)
    assert stats["mean_s"] > 0 and stats["compile_s"] > 0
