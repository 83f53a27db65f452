"""Multi-device sharding tests on the virtual 8-device CPU mesh:
batch-sharded multi-RHS solve matches unsharded results, and a row-sharded
operator produces correct (psum-reduced) normal products. This is the
multi-chip seam described in SURVEY.md §2.6 / §5.8."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rls_tpu as rt
from rls_tpu import solve_batched
from rls_tpu.parallel import (
    make_mesh,
    row_sharded_operator,
    shard_batch,
    solve_batched_sharded,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh"
)


def test_batch_sharded_solve_matches(rng):
    mesh = make_mesh(axis_names=("batch",))
    K = len(jax.devices()) * 2
    A = jnp.asarray(rng.normal(size=(12, 8)).astype(np.float32))
    X = jnp.asarray(rng.normal(size=(8, K)).astype(np.float32))
    B = A @ X
    s = rt.FISTA.create(A, reg=rt.L1Regularization(1e-4), iterations=25)
    X_plain = solve_batched(s, B)
    X_shard = solve_batched_sharded(s, B, mesh)
    np.testing.assert_allclose(np.asarray(X_shard), np.asarray(X_plain), atol=1e-4)


def test_row_sharded_normal_op(rng):
    mesh = make_mesh(axis_names=("rows",))
    m = len(jax.devices()) * 16
    mat = rng.normal(size=(m, 24)).astype(np.float32)
    op = row_sharded_operator(mat, mesh, axis="rows")
    x = jnp.asarray(rng.normal(size=(24,)).astype(np.float32))
    out = jax.jit(op.normal)(x)
    expected = mat.T @ (mat @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4)


def test_row_sharded_cgnr(rng):
    mesh = make_mesh(axis_names=("rows",))
    m = len(jax.devices()) * 8
    mat = rng.normal(size=(m, 16)).astype(np.float32)
    xt = rng.normal(size=(16,)).astype(np.float32)
    b = jnp.asarray(mat @ xt)
    op = row_sharded_operator(mat, mesh, axis="rows")
    s = rt.CGNR.create(op, reg=rt.L2Regularization(1e-6), iterations=40)
    x = jax.jit(rt.solve)(s, b)
    err = float(np.linalg.norm(np.asarray(x) - xt) / np.linalg.norm(xt))
    assert err < 0.02


def test_fused_fista_tv_sharded(rng):
    """Fused Pallas FISTA-TV under shard_map over the batch axis must match
    the unsharded fused solve (interpret mode on the virtual CPU mesh)."""
    import jax

    from rls_tpu.kernels import solve_fista_tv_fused
    from rls_tpu.parallel import make_mesh, solve_fista_tv_fused_sharded

    n, ndev = 16, len(jax.devices())
    batch = 2 * ndev
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=3, unroll=True)
    solver = rt.FISTA.create(
        op, reg=reg, iterations=4, rho=0.9, rel_tol=0.0, track_residual=False
    )
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    mesh = make_mesh(axis_names=("batch",))
    got = np.asarray(
        solve_fista_tv_fused_sharded(solver, B, mesh, interpret=True)
    )
    want = np.asarray(solve_fista_tv_fused(solver, B, interpret=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_fused_admm_tv_sharded(rng):
    """Sharded fused ADMM-TV must match the unsharded fused solve."""
    import jax

    from rls_tpu.kernels import solve_admm_tv_fused
    from rls_tpu.parallel import make_mesh, solve_admm_tv_fused_sharded

    n, ndev = 16, len(jax.devices())
    batch = 2 * ndev
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=3, unroll=True)
    solver = rt.ADMM.create(
        op, reg=reg, iterations=3, iterations_cg=3, unroll_cg=True, rho=0.1
    )
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    mesh = make_mesh(axis_names=("batch",))
    got = np.asarray(
        solve_admm_tv_fused_sharded(solver, B, mesh, interpret=True)
    )
    want = np.asarray(solve_admm_tv_fused(solver, B, interpret=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


def test_batch_sharded_hlo_has_no_allgather(rng):
    """Collective audit (VERDICT r2 item 7): the batch-sharded solve is
    embarrassingly parallel over problems — the compiled SPMD program must
    contain NO all-gather (only the loop-condition all-reduce over the
    per-problem active flags). An all-gather would mean GSPMD decided to
    replicate per-problem state."""
    mesh = make_mesh(axis_names=("batch",))
    K = len(jax.devices()) * 2
    A = jnp.asarray(rng.normal(size=(12, 8)).astype(np.float32))
    B = A @ jnp.asarray(rng.normal(size=(8, K)).astype(np.float32))
    s = rt.FISTA.create(A, reg=rt.L1Regularization(1e-4), iterations=10)
    Bs = shard_batch(B, mesh, "batch")
    compiled = jax.jit(solve_batched).lower(s, Bs).compile()
    hlo = compiled.as_text()
    assert "all-gather" not in hlo, "batch-sharded solve emitted all-gather"
    assert "all-reduce" in hlo  # the any(active) loop condition


def test_row_sharded_hlo_psum_no_allgather(rng):
    """Row-sharded CGNR: the normal-op contraction must reduce with
    all-reduce/reduce-scatter (psum of partial AᴴAx), never all-gather
    the row-sharded operand."""
    mesh = make_mesh(axis_names=("rows",))
    m = len(jax.devices()) * 8
    mat = rng.normal(size=(m, 16)).astype(np.float32)
    b = jnp.asarray(mat @ rng.normal(size=(16,)).astype(np.float32))
    op = row_sharded_operator(mat, mesh, axis="rows")
    s = rt.CGNR.create(op, reg=rt.L2Regularization(1e-6), iterations=20)
    b_sh = jax.device_put(
        b, jax.NamedSharding(mesh, jax.sharding.PartitionSpec("rows"))
    )
    hlo = jax.jit(rt.solve).lower(s, b_sh).compile().as_text()
    assert "all-reduce" in hlo
    assert "all-gather" not in hlo, "row-sharded solve gathered A or y"


def test_2d_mesh_batch_rows_cgnr(rng):
    """2-D (batch × rows) mesh (VERDICT r3 item 5): K problems share a
    tall row-sharded dense A; problems shard over "batch". The batched
    CGNR solve must (a) keep its psum on the rows axis with NO
    all-gather, and (b) match the unsharded solve."""
    ndev = len(jax.devices())
    if ndev < 4 or ndev % 2:
        pytest.skip("needs a multi-device mesh")
    rows_nd = ndev // 2
    mesh = make_mesh(
        shape=(2, rows_nd), axis_names=("batch", "rows"),
        devices=jax.devices(),
    )
    m, n, K = 16 * rows_nd, 16, 4
    mat = rng.normal(size=(m, n)).astype(np.float32)
    Bnp = mat @ rng.normal(size=(n, K)).astype(np.float32)
    op = rt.DenseOperator(
        jax.device_put(
            jnp.asarray(mat),
            jax.NamedSharding(mesh, jax.sharding.PartitionSpec("rows", None)),
        )
    )
    s = rt.CGNR.create(op, reg=rt.L2Regularization(1e-6), iterations=30)
    Bs = jax.device_put(
        jnp.asarray(Bnp),
        jax.NamedSharding(mesh, jax.sharding.PartitionSpec("rows", "batch")),
    )
    compiled = jax.jit(solve_batched).lower(s, Bs).compile()
    hlo = compiled.as_text()
    assert "all-gather" not in hlo, "2-D mesh solve emitted all-gather"
    assert "all-reduce" in hlo or "reduce-scatter" in hlo
    got = np.asarray(jax.jit(solve_batched)(s, Bs))
    s_plain = rt.CGNR.create(
        rt.DenseOperator(jnp.asarray(mat)), reg=rt.L2Regularization(1e-6),
        iterations=30,
    )
    want = np.asarray(solve_batched(s_plain, jnp.asarray(Bnp)))
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-5)


def test_fused_cgnr_sharded(rng):
    """Sharded fused whole-solve CGNR must match the unsharded kernel."""
    import jax

    from rls_tpu.kernels import solve_cgnr_fused
    from rls_tpu.parallel import make_mesh, solve_cgnr_fused_sharded

    ndev = len(jax.devices())
    m, n, batch = 24, 16, 2 * ndev
    A = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(n), jnp.float32)
    solver = rt.CGNR.create(
        rt.DenseOperator(A), reg=rt.L2Regularization(1e-3), iterations=10
    )
    X = jnp.asarray(rng.normal(size=(n, batch)), jnp.float32)
    B = A @ X
    mesh = make_mesh(axis_names=("batch",))
    got = np.asarray(solve_cgnr_fused_sharded(solver, B, mesh, interpret=True))
    want = np.asarray(solve_cgnr_fused(solver, B, interpret=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_fused_pdhg_sharded(rng):
    """Sharded fused PDHG must match the unsharded kernel."""
    import jax

    from rls_tpu.kernels import solve_pdhg_fused
    from rls_tpu.parallel import make_mesh, solve_pdhg_fused_sharded

    n, ndev = 16, len(jax.devices())
    batch = 2 * ndev
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    g /= g.sum()
    op = rt.SeparableConvOperator.from_taps(g, g, im_shape=(n, n))
    solver = rt.PDHG.create(
        op, reg=rt.TVRegularization(1e-3, shape=(n, n)), iterations=5
    )
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    mesh = make_mesh(axis_names=("batch",))
    got = np.asarray(solve_pdhg_fused_sharded(solver, B, mesh, interpret=True))
    want = np.asarray(solve_pdhg_fused(solver, B, interpret=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_fused_pgm_dense_sharded(rng):
    """Sharded fused dense FISTA must match the unsharded kernel."""
    import jax

    from rls_tpu.kernels import solve_pgm_dense_fused
    from rls_tpu.parallel import make_mesh, solve_pgm_dense_fused_sharded

    ndev = len(jax.devices())
    m, n, batch = 24, 48, 2 * ndev
    A = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(m), jnp.float32)
    solver = rt.FISTA.create(
        rt.DenseOperator(A), reg=rt.L1Regularization(1e-3), iterations=8,
        rho=0.1, track_residual=False,
    )
    B = jnp.asarray(rng.normal(size=(m, batch)), jnp.float32)
    mesh = make_mesh(axis_names=("batch",))
    got = np.asarray(
        solve_pgm_dense_fused_sharded(solver, B, mesh, interpret=True)
    )
    want = np.asarray(solve_pgm_dense_fused(solver, B, interpret=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
