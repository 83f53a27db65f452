"""Pallas kernel correctness vs the XLA reference implementations
(interpret mode on CPU; the same kernels run compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rls_tpu as rt
from rls_tpu.kernels.tv_pallas import prox_tv2d_fgp_pallas
from rls_tpu.models.prox import prox_tv_fgp


def test_tv_pallas_matches_xla_fgp(rng):
    n = 24
    x = jnp.asarray(rng.normal(size=(n * n,)), jnp.float32)
    lam = 0.15
    iters = 20
    grad = rt.GradientOperator(im_shape=(n, n), _dtype=jnp.float32)
    ref = prox_tv_fgp(x, lam, grad, iters)
    out = prox_tv2d_fgp_pallas(x, lam, (n, n), iters, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_tv_pallas_batched(rng):
    n, B = 16, 3
    X = jnp.asarray(rng.normal(size=(B, n * n)), jnp.float32)
    lam = 0.1
    out = prox_tv2d_fgp_pallas(X, lam, (n, n), 10, interpret=True)
    grad = rt.GradientOperator(im_shape=(n, n), _dtype=jnp.float32)
    for b in range(B):
        ref = prox_tv_fgp(X[b], lam, grad, 10)
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(ref), atol=1e-5)


def test_tv_regularization_pallas_backend(rng):
    n = 16
    reg_p = rt.TVRegularization(0.1, shape=(n, n), iterations_tv=15, backend="pallas")
    reg_x = rt.TVRegularization(0.1, shape=(n, n), iterations_tv=15)
    x = jnp.asarray(rng.normal(size=(n * n,)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(reg_p.prox(x)), np.asarray(reg_x.prox(x)), atol=1e-5
    )


def test_kaczmarz_pallas_matches_scan(rng):
    import rls_tpu as rt
    from rls_tpu import solve

    A = jnp.asarray(rng.normal(size=(20, 8)).astype(np.float32))
    xt = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    b = A @ xt
    sx = rt.Kaczmarz.create(A, reg=rt.L2Regularization(1e-4), iterations=25)
    sp = rt.Kaczmarz.create(
        A, reg=rt.L2Regularization(1e-4), iterations=25, backend="pallas"
    )
    x1 = solve(sx, b)
    x2 = solve(sp, b)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-6)


def test_tv_pallas_per_problem_lam_under_vmap(rng):
    """vmap over problems with per-problem λ must hit the kernel's native
    batch grid (a batched SMEM scalar breaks Mosaic auto-batching)."""
    import jax

    n = 16
    reg = rt.TVRegularization(
        1e-2, shape=(n, n), iterations_tv=4, unroll=True, backend="pallas"
    )
    reg_xla = rt.TVRegularization(1e-2, shape=(n, n), iterations_tv=4, unroll=True)
    X = jnp.asarray(rng.normal(size=(5, n * n)), jnp.float32)
    lams = jnp.asarray([1e-3, 5e-3, 1e-2, 2e-2, 5e-2], jnp.float32)
    got = jax.jit(jax.vmap(reg.prox))(X, lams)
    want = jax.jit(jax.vmap(reg_xla.prox))(X, lams)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fista_tv_fused_matches_composed(rng):
    """The fully-fused FISTA-TV mega-kernel must reproduce the composed
    solve_batched_unrolled path (FISTA.step + TV prox) to f32 tolerance."""
    import jax

    from rls_tpu.kernels import solve_fista_tv_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    n, batch = 24, 3
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=5, unroll=True)
    solver = rt.FISTA.create(
        op, reg=reg, iterations=8, rho=0.9, rel_tol=0.0, track_residual=False
    )
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    want = np.asarray(jax.jit(solve_batched_unrolled)(solver, B))
    got = np.asarray(solve_fista_tv_fused(solver, B))
    # composed CPU path uses plain f32 matmuls, the kernel always uses the
    # compensated stacked form -> ~1 ulp-of-bf16-residual divergence
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_fista_tv_fused_rejects_unsupported(rng):
    from rls_tpu.kernels import solve_fista_tv_fused

    n = 8
    A = rt.DenseOperator(jnp.asarray(rng.normal(size=(n, n)), jnp.float32))
    s = rt.FISTA.create(A, reg=rt.L1Regularization(1e-3), iterations=3, rho=0.1)
    with pytest.raises(ValueError):
        solve_fista_tv_fused(s, jnp.zeros((n, 2), jnp.float32))


@pytest.mark.parametrize("name", ["OptISTA", "POGM"])
def test_pgm_tv_fused_matches_composed(rng, name):
    """The generalized fused kernel must reproduce OptISTA/POGM composed
    solves (table-driven momentum schedules)."""
    import jax

    from rls_tpu.kernels import solve_pgm_tv_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    n, batch = 24, 3
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=4, unroll=True)
    solver = rt.create_linear_solver(
        name, op, reg=reg, iterations=7, rho=0.9, rel_tol=0.0,
        track_residual=False, kwarg_warning=False,
    )
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    want = np.asarray(jax.jit(solve_batched_unrolled)(solver, B))
    got = np.asarray(solve_pgm_tv_fused(solver, B))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_fused_guards(rng):
    """Wrapper guards: ValueError (not silent wrongness / TypeError) for
    theta≠1, traced theta, AHA-passed-directly, and 1-D TV dims."""
    import jax

    from rls_tpu.kernels import solve_pgm_tv_fused

    n = 16
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=3, unroll=True)
    B = jnp.zeros((n * n, 2), jnp.float32)

    s_theta = rt.FISTA.create(op, reg=reg, iterations=3, rho=0.9, theta=3.0)
    with pytest.raises(ValueError, match="theta"):
        solve_pgm_tv_fused(s_theta, B)

    s_ok = rt.FISTA.create(op, reg=reg, iterations=3, rho=0.9)
    with pytest.raises(ValueError, match="concrete solver.theta"):
        # solver as a traced jit argument -> theta is a tracer
        jax.jit(lambda s, b: solve_pgm_tv_fused(s, b))(s_ok, B)

    s_aha = rt.FISTA.create(A=op, AHA=op, reg=reg, iterations=3, rho=0.9)
    with pytest.raises(ValueError, match="NormalOperator"):
        solve_pgm_tv_fused(s_aha, B)

    reg1d = rt.TVRegularization(1e-3, shape=(n, n), dims=0, iterations_tv=3,
                                unroll=True)
    s_1d = rt.FISTA.create(op, reg=reg1d, iterations=3, rho=0.9)
    with pytest.raises(ValueError, match="both axes"):
        solve_pgm_tv_fused(s_1d, B)


def test_admm_tv_fused_matches_composed(rng):
    """The fused ADMM-TV kernel must reproduce the composed unrolled ADMM
    (masked inner CG + TV prox + dual update) to f32 tolerance."""
    import jax

    from rls_tpu.kernels import solve_admm_tv_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    n, batch = 24, 3
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=4, unroll=True)
    solver = rt.ADMM.create(
        op, reg=reg, iterations=6, iterations_cg=5, unroll_cg=True, rho=0.1
    )
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    want = np.asarray(jax.jit(solve_batched_unrolled)(solver, B))
    got = np.asarray(solve_admm_tv_fused(solver, B))
    # composed CPU path uses plain f32 matmuls, the kernel compensated ones
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-4)


def test_admm_splitbregman_fused_fgp_unroll_matches(rng):
    """The chip default for the fused ADMM/SplitBregman TV prox is the
    unrolled fold FGP (valid: both paths pin a constant prox scale —
    vary_rho='none' / λ₂/ρ₂). It must match the fori dual loop to f32
    tolerance (identical math up to rounding, like the PGM paths)."""
    import jax

    from rls_tpu.kernels import (
        solve_admm_tv_fused,
        solve_splitbregman_l1_tv_fused,
    )

    n, batch = 24, 3
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=4, unroll=True)
    solver = rt.ADMM.create(
        op, reg=reg, iterations=6, iterations_cg=5, unroll_cg=True, rho=0.1
    )
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    fori = np.asarray(solve_admm_tv_fused(solver, B, fgp_unroll=False))
    unrl = np.asarray(solve_admm_tv_fused(solver, B, fgp_unroll=True))
    np.testing.assert_allclose(unrl, fori, rtol=0, atol=1e-5)

    h = w = 16
    n2 = h * w
    C = 3
    maps = (rng.normal(size=(C, h, w))
            + 1j * rng.normal(size=(C, h, w))).astype(np.complex64)
    maps /= np.sqrt((np.abs(maps) ** 2).sum(0))
    mask = (rng.uniform(size=(h, w)) < 0.6).astype(np.float32)
    op2 = rt.SenseDFT2RealOperator.from_maps(maps, mask, (h, w))
    solver2 = rt.SplitBregman.create(
        op2,
        reg=[
            rt.L21Regularization(1e-3, slices=2),
            rt.TVRegularization(1e-3, shape=(2, h, w), dims=(1, 2),
                                iterations_tv=4, unroll=True),
        ],
        reg_trafo=[rt.IdentityOperator(2 * n2, jnp.float32),
                   rt.IdentityOperator(2 * n2, jnp.float32)],
        iterations=2, iterations_inner=3, iterations_cg=5, unroll_cg=True,
        rho=[0.01, 0.02],
    )
    X2 = jnp.asarray(rng.normal(size=(2, 2 * n2)), jnp.float32)
    B2 = jax.vmap(op2.mv)(X2).T
    fori2 = np.asarray(
        solve_splitbregman_l1_tv_fused(solver2, B2, fgp_unroll=False))
    unrl2 = np.asarray(
        solve_splitbregman_l1_tv_fused(solver2, B2, fgp_unroll=True))
    np.testing.assert_allclose(unrl2, fori2, rtol=0, atol=1e-5)


@pytest.mark.parametrize("method", ["fista", "optista", "pogm"])
def test_pgm_tv_fused_interleave_matches_fold(rng, method):
    """interleave=G runs G independent per-problem chains inside one
    grid step with IDENTICAL per-problem math to the fold-FGP default —
    only program order changes (see _kernel_interleaved), so the result
    must match the interleave=1 fold path exactly in interpret mode.
    All three _pgm_loop_multi branches are exercised."""
    import jax

    from rls_tpu.kernels.fista_tv_fused import solve_pgm_tv_fused

    n = 64  # noconcat gram needs H, W % 64 == 0
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=2,
                              unroll=True)
    cls = {"fista": rt.FISTA, "optista": rt.OptISTA, "pogm": rt.POGM}[method]
    solver = cls.create(op, reg=reg, iterations=2, rho=0.9)
    X = jnp.asarray(rng.normal(size=(2, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    base = np.asarray(
        solve_pgm_tv_fused(solver, B, interpret=True, fgp_unroll=True,
                           fgp_opt="fold"))
    ilv = np.asarray(
        solve_pgm_tv_fused(solver, B, interpret=True, fgp_unroll=True,
                           fgp_opt="fold", interleave=2))
    np.testing.assert_array_equal(ilv, base)


def test_admm_tv_fused_rejects_unsupported(rng):
    from rls_tpu.kernels import solve_admm_tv_fused

    n = 8
    A = rt.DenseOperator(jnp.asarray(rng.normal(size=(n, n)), jnp.float32))
    s = rt.ADMM.create(A, reg=rt.L1Regularization(1e-3), iterations=3)
    with pytest.raises(ValueError):
        solve_admm_tv_fused(s, jnp.zeros((n, 2), jnp.float32))


def test_admm_tv_tiled_matches_composed(rng):
    """The row-tiled ADMM-TV kernel (untiled in-kernel CG + tiled FGP
    z-update) must reproduce the composed unrolled ADMM exactly like the
    monolithic kernel does — the tiling is exact (full-image scratch,
    halo ≥ the FGP cone). tile_rows forces 3 tiles so clamped
    top/middle/bottom windows all execute."""
    import jax

    from rls_tpu.kernels import solve_admm_tv_tiled
    from rls_tpu.models.solvers import solve_batched_unrolled

    n, batch = 24, 3
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=4, unroll=True)
    solver = rt.ADMM.create(
        op, reg=reg, iterations=6, iterations_cg=5, unroll_cg=True, rho=0.1
    )
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    want = np.asarray(jax.jit(solve_batched_unrolled)(solver, B))
    got = np.asarray(
        solve_admm_tv_tiled(solver, B, tile_rows=8, interpret=True)
    )
    # composed CPU path uses plain f32 matmuls, the kernel the VPU
    # stencil gram — same tolerance as the monolithic-kernel test
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-4)


def test_admm_tv_tiled_rejects_unsupported(rng):
    from rls_tpu.kernels import solve_admm_tv_tiled

    n = 8
    A = rt.DenseOperator(jnp.asarray(rng.normal(size=(n, n)), jnp.float32))
    s = rt.ADMM.create(A, reg=rt.L1Regularization(1e-3), iterations=3)
    with pytest.raises(ValueError):
        solve_admm_tv_tiled(s, jnp.zeros((n, 2), jnp.float32))


def test_admm_512_dispatch_monolithic_rejects_tiled_accepts():
    """At 512² the monolithic fused ADMM kernel must reject on VMEM and
    the tiled kernel must accept — so `solve_batched_fast`'s ordered
    dispatch lands on the tiled path past the ceiling (check-level; the
    512² kernel itself is exercised on chip by tools/tiled_ab.py)."""
    from rls_tpu.kernels.admm_tv_fused import check_admm_tv_fused
    from rls_tpu.kernels.admm_tv_tiled import check_admm_tv_tiled

    n = 512
    g = np.exp(-((np.arange(9) - 4) ** 2) / 8.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(5e-4, shape=(n, n), iterations_tv=10,
                              unroll=True)
    s = rt.ADMM.create(op, reg=reg, iterations=10, iterations_cg=5,
                       unroll_cg=True, rho=0.1)
    with pytest.raises(ValueError, match="VMEM"):
        check_admm_tv_fused(s)
    check_admm_tv_tiled(s)  # must not raise


def test_fista_l1_dft_fused_matches_composed(rng):
    """The fused FISTA-L1 split-real-DFT kernel must reproduce the composed
    unrolled path (BASELINE config #2's shape)."""
    import jax

    from rls_tpu.kernels import solve_fista_l1_dft_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    n, batch = 16, 3
    N2 = n * n
    idx = jnp.asarray(
        sorted(rng.choice(N2, size=N2 // 3, replace=False)), jnp.int32
    )
    op = rt.SubsampledDFT2RealOperator.from_sample_idx(idx, (n, n))
    solver = rt.FISTA.create(
        op, reg=rt.L1Regularization(1e-3), iterations=8, rho=0.95,
        rel_tol=0.0, track_residual=False,
    )
    X = jnp.asarray(rng.normal(size=(batch, N2)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    want = np.asarray(jax.jit(solve_batched_unrolled)(solver, B))
    # interpret on every platform: 16 wide fails the chip's 128-lane
    # alignment gate by design; the compiled path runs in bench/parity
    # suites at 256^2
    got = np.asarray(solve_fista_l1_dft_fused(solver, B, interpret=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_fista_l1_dft_fused_rejects_unsupported(rng):
    from rls_tpu.kernels import solve_fista_l1_dft_fused

    n = 8
    A = rt.DenseOperator(jnp.asarray(rng.normal(size=(n, n)), jnp.float32))
    s = rt.FISTA.create(A, reg=rt.L1Regularization(1e-3), iterations=3, rho=0.1)
    with pytest.raises(ValueError):
        solve_fista_l1_dft_fused(s, jnp.zeros((n, 2), jnp.float32))


def test_solve_batched_fast_dispatch(rng):
    """Auto-dispatch picks a fused kernel when applicable and falls back to
    the composed driver otherwise, matching reference results."""
    import jax

    from rls_tpu import solve_batched_fast
    from rls_tpu.models.solvers import solve_batched_unrolled

    n, batch = 24, 2
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    sep = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=4, unroll=True)
    s_fused = rt.FISTA.create(
        sep, reg=reg, iterations=6, rho=0.9, rel_tol=0.0, track_residual=False
    )
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(sep.mv)(X).T
    got = np.asarray(solve_batched_fast(s_fused, B))
    want = np.asarray(solve_batched_unrolled(s_fused, B))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)

    # dense FISTA-L1 now rides the fused dense PGM kernel (rounding-level
    # differences vs the composed path)
    A = rt.DenseOperator(
        jnp.asarray(rng.normal(size=(24, 24)), jnp.float32),
        compensated=_ref_comp(),
    )
    s_plain = rt.FISTA.create(A, reg=rt.L1Regularization(1e-3), iterations=6,
                              rho=0.05, track_residual=False)
    Bp = jnp.asarray(rng.normal(size=(24, batch)), jnp.float32)
    got = np.asarray(solve_batched_fast(s_plain, Bp))
    want = np.asarray(solve_batched_unrolled(s_plain, Bp))
    # 5e-4: mid-trajectory FISTA iterates; fused and composed are both
    # 4-term compensated but reduce in different orders on chip
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)

    # a config with NO fused path (wavelet-transformed reg): composed
    # fallback, identical
    s_fb = rt.FISTA.create(
        A,
        reg=rt.TransformedRegularization(
            rt.L1Regularization(1e-3), rt.WaveletOperator((24,), wavelet="db2")
        ),
        iterations=6, rho=0.05, track_residual=False,
    )
    import warnings as _warnings

    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        got = np.asarray(solve_batched_fast(s_fb, Bp))
    want = np.asarray(solve_batched_unrolled(s_fb, Bp))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_fista_l21_sense_fused_matches_composed(rng):
    """The fused SENSE FISTA-L21 kernel must reproduce the composed
    unrolled path (complex-L1 multi-coil MRI on the split-real operator)."""
    import jax

    from rls_tpu.kernels import solve_fista_l21_sense_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    h = w = 16
    C, batch = 3, 2
    maps = (rng.normal(size=(C, h, w)) + 1j * rng.normal(size=(C, h, w))).astype(
        np.complex64
    )
    maps /= np.sqrt((np.abs(maps) ** 2).sum(0))
    mask = (rng.uniform(size=(h, w)) < 0.5).astype(np.float32)
    op = rt.SenseDFT2RealOperator.from_maps(maps, mask, (h, w))
    solver = rt.FISTA.create(
        op, reg=rt.L21Regularization(1e-3, slices=2), iterations=8, rho=0.95,
        rel_tol=0.0, track_residual=False,
    )
    X = jnp.asarray(rng.normal(size=(batch, 2 * h * w)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    want = np.asarray(jax.jit(solve_batched_unrolled)(solver, B))
    got = np.asarray(solve_fista_l21_sense_fused(solver, B))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)

def test_splitbregman_l1_tv_fused_matches_composed(rng):
    """The fused SplitBregman kernel (inner ADMM + outer Bregman, L21 + TV
    on the split-real SENSE operator) must reproduce the composed unrolled
    path (BASELINE config #4's shape)."""
    import jax

    from rls_tpu.kernels import solve_splitbregman_l1_tv_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    h = w = 16
    n = h * w
    C, batch = 3, 2
    maps = (rng.normal(size=(C, h, w)) + 1j * rng.normal(size=(C, h, w))).astype(
        np.complex64
    )
    maps /= np.sqrt((np.abs(maps) ** 2).sum(0))
    mask = (rng.uniform(size=(h, w)) < 0.6).astype(np.float32)
    op = rt.SenseDFT2RealOperator.from_maps(maps, mask, (h, w))
    solver = rt.SplitBregman.create(
        op,
        reg=[
            rt.L21Regularization(1e-3, slices=2),
            rt.TVRegularization(1e-3, shape=(2, h, w), dims=(1, 2),
                                iterations_tv=4, unroll=True),
        ],
        reg_trafo=[rt.IdentityOperator(2 * n, jnp.float32),
                   rt.IdentityOperator(2 * n, jnp.float32)],
        iterations=2, iterations_inner=3, iterations_cg=5, unroll_cg=True,
        rho=[0.01, 0.02],
    )
    X = jnp.asarray(rng.normal(size=(batch, 2 * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    want = np.asarray(jax.jit(solve_batched_unrolled)(solver, B))
    got = np.asarray(solve_splitbregman_l1_tv_fused(solver, B))
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-4)


def test_splitbregman_fused_rejects_unsupported(rng):
    from rls_tpu.kernels.splitbregman_fused import check_splitbregman_l1_tv_fused

    A = rt.DenseOperator(jnp.asarray(rng.normal(size=(16, 16)), jnp.float32))
    s = rt.SplitBregman.create(A, reg=rt.L1Regularization(1e-3))
    with pytest.raises(ValueError):
        check_splitbregman_l1_tv_fused(s)


def test_solve_batched_fast_warns_on_fallback(rng):
    """The auto dispatcher must WARN (naming every rejection) when no fused
    kernel applies, and must not warn when one does."""
    import warnings

    import jax

    from rls_tpu import solve_batched_fast

    A = rt.DenseOperator(jnp.asarray(rng.normal(size=(12, 12)), jnp.float32))
    # wavelet-transformed reg: no fused kernel covers it
    s_plain = rt.FISTA.create(
        A,
        reg=rt.TransformedRegularization(
            rt.L1Regularization(1e-3), rt.WaveletOperator((12,), wavelet="haar")
        ),
        iterations=2, rho=0.05, track_residual=False,
    )
    Bp = jnp.asarray(rng.normal(size=(12, 2)), jnp.float32)
    with pytest.warns(UserWarning, match="no fused kernel applies"):
        solve_batched_fast(s_plain, Bp)
    # warn=False silences
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        solve_batched_fast(s_plain, Bp, warn=False)

    # applicable solver: no warning
    n = 16
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    sep = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=3, unroll=True)
    s_fused = rt.FISTA.create(
        sep, reg=reg, iterations=2, rho=0.9, rel_tol=0.0, track_residual=False
    )
    X = jnp.asarray(rng.normal(size=(2, n * n)), jnp.float32)
    B = jax.vmap(sep.mv)(X).T
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        solve_batched_fast(s_fused, B)


def test_fused_vmem_guard_rejects_512(rng):
    """Beyond the 16 MiB scoped-VMEM budget (empirically: Mosaic OOMs at
    512^2) the checks must reject so solve_batched_fast falls back to the
    composed path instead of a compile-time crash."""
    from rls_tpu.kernels.fista_tv_fused import check_pgm_tv_fused

    n = 512
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    sep = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=3, unroll=True)
    s = rt.FISTA.create(sep, reg=reg, iterations=2, rho=0.9, rel_tol=0.0,
                        track_residual=False)
    with pytest.raises(ValueError, match="VMEM"):
        check_pgm_tv_fused(s)


def test_gram_noconcat_matches_stacked(rng):
    """The concat-free compensated Gram variant must match the stacked
    form inside the fused kernel (both operand sets are exactly
    bf16-representable, so the math is backend-identical)."""
    from rls_tpu.kernels.fista_tv_fused import fista_tv_fused

    n = 32
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    lcat, rcat = op.cat["normal"]
    x0 = jnp.asarray(rng.normal(size=(2, n, n)), jnp.float32)
    a = np.asarray(
        fista_tv_fused(x0, lcat, rcat, 0.9, 1e-3, 6, 4, interpret=True)
    )
    b = np.asarray(
        fista_tv_fused(x0, lcat, rcat, 0.9, 1e-3, 6, 4, interpret=True,
                       gram="noconcat")
    )
    assert np.linalg.norm(a - b) / np.linalg.norm(a) < 1e-6


def test_rne_bf16_trick(rng):
    from rls_tpu.kernels._fgp_common import rne_bf16_f32

    v = jnp.asarray(
        rng.normal(size=(1024,)) * np.exp(rng.normal(size=1024) * 3),
        jnp.float32,
    )
    want = jnp.asarray(v, jnp.bfloat16).astype(jnp.float32)
    assert bool(jnp.all(rne_bf16_f32(v) == want))


def test_solve_batched_fast_dispatches_kaczmarz(rng):
    """A streamable Kaczmarz solver rides the streamed kernel through the
    auto dispatcher (no fallback warning)."""
    import warnings

    from rls_tpu import solve_batched_fast
    from rls_tpu.models.solvers import solve_batched_unrolled

    m, n = 24, 16
    A = rt.DenseOperator(jnp.asarray(rng.normal(size=(m, n)), jnp.float32))
    s = rt.Kaczmarz.create(A, reg=rt.L2Regularization(1e-3), iterations=3)
    B = jnp.asarray(rng.normal(size=(m, 2)), jnp.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        got = np.asarray(solve_batched_fast(s, B))
    want = np.asarray(solve_batched_unrolled(s, B))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_gram_stencil_grouped_matches(rng):
    """Stencil Gram + G-problem grouping (per-problem rho/lam planes,
    period-H boundary masks) must match the per-problem stacked kernel."""
    from rls_tpu.kernels.fista_tv_fused import fista_tv_fused

    n, B = 24, 4
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    lcat, rcat = op.cat["normal"]
    x0 = jnp.asarray(rng.normal(size=(B, n, n)), jnp.float32)
    rho = jnp.asarray([0.9, 0.8, 0.95, 0.85], jnp.float32)
    lam = jnp.asarray([1e-3, 2e-3, 5e-4, 3e-3], jnp.float32)
    a = np.asarray(fista_tv_fused(x0, lcat, rcat, rho, lam, 5, 4,
                                  interpret=True))
    for G in (2, 4):
        b = np.asarray(fista_tv_fused(
            x0, lcat, rcat, rho, lam, 5, 4, interpret=True,
            gram="stencil", taps=op.taps_hw(), group=G))
        assert np.linalg.norm(a - b) / np.linalg.norm(a) < 1e-5, G


def test_fgp_unroll_and_grouped_noconcat_match(rng):
    """The statically-unrolled λ-scaled FGP dual loop and the grouped
    noconcat-MXU Gram must match the default fori/per-problem kernel."""
    from rls_tpu.kernels.fista_tv_fused import fista_tv_fused

    n, B = 24, 4
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    lcat, rcat = op.cat["normal"]
    x0 = jnp.asarray(rng.normal(size=(B, n, n)), jnp.float32)
    rho = jnp.asarray([0.9, 0.8, 0.95, 0.85], jnp.float32)
    lam = jnp.asarray([1e-3, 2e-3, 5e-4, 3e-3], jnp.float32)
    a = np.asarray(fista_tv_fused(x0, lcat, rcat, rho, lam, 5, 4,
                                  interpret=True))
    for kw in (
        dict(fgp_unroll=True),
        dict(gram="noconcat", group=2),
        dict(gram="noconcat", group=2, fgp_unroll=True),
        dict(gram="stencil", taps=op.taps_hw(), group=2, fgp_unroll=True),
    ):
        b = np.asarray(fista_tv_fused(
            x0, lcat, rcat, rho, lam, 5, 4, interpret=True, **kw))
        assert np.linalg.norm(a - b) / np.linalg.norm(a) < 1e-5, kw


def test_fgp_opt_variants_match_unrolled(rng):
    """The issue-count-reduced unrolled FGP variants (fgp_opt='fold':
    mask folded into the clamp bounds + shared exact ×⅛ scale;
    fgp_opt='pack': sublane-stacked dual planes) only regroup exact
    power-of-two scalings and replace `clip(q,-λ,λ)·mask` with
    `clip(q,-λ·mask,λ·mask)` — identical in strict f32 semantics
    (AB_FLAGSHIP_r05 measured rel 0.0 on chip), but platform FMA
    contraction may round `r + g·⅛` once in one form and twice in the
    other, so CPU asserts a few-ulp band, not bit equality."""
    from rls_tpu.kernels.fista_tv_fused import fista_tv_fused

    n, B = 24, 4
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    lcat, rcat = op.cat["normal"]
    x0 = jnp.asarray(rng.normal(size=(B, n, n)), jnp.float32)
    rho = jnp.asarray([0.9, 0.8, 0.95, 0.85], jnp.float32)
    lam = jnp.asarray([1e-3, 2e-3, 5e-4, 3e-3], jnp.float32)
    for extra in (
        {},
        dict(gram="noconcat", group=2),
        dict(gram="stencil", taps=op.taps_hw(), group=2),
    ):
        # like-for-like reference: same gram/group, plain unrolled loop
        # (different grams round differently and would dominate the diff)
        ref = np.asarray(fista_tv_fused(
            x0, lcat, rcat, rho, lam, 5, 4, interpret=True,
            fgp_unroll=True, **extra))
        for opt in ("fold", "pack"):
            out = np.asarray(fista_tv_fused(
                x0, lcat, rcat, rho, lam, 5, 4, interpret=True,
                fgp_unroll=True, fgp_opt=opt, **extra))
            np.testing.assert_allclose(out, ref, rtol=0, atol=2e-6,
                                       err_msg=f"{opt} {extra}")


def test_fgp_window_opt_variants_match_unrolled(rng):
    """Window (tiled-kernel) twin of test_fgp_opt_variants_match_unrolled:
    fold/pack must match the unrolled window FGP to within FMA-contraction
    ulps at every window position (top window with pad rows, interior,
    bottom)."""
    from jax.experimental import pallas as pl

    from rls_tpu.kernels._fgp_common import make_tv_fgp_window

    H = W = 32

    def run(x, n_rows, lo, opt):
        def kern(x_ref, o_ref):
            _, fgp = make_tv_fgp_window(H, W, n_rows, lo, jnp.float32,
                                        unroll=True, opt=opt)
            o_ref[...] = fgp(x_ref[...], jnp.float32(0.013), 7)

        return np.asarray(pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((n_rows, W), jnp.float32),
            interpret=True)(x))

    for n_rows, lo in ((16, -4), (16, 10), (20, 12)):
        x = jnp.asarray(rng.normal(size=(n_rows, W)), jnp.float32)
        ref = run(x, n_rows, lo, None)
        for opt in ("fold", "pack"):
            np.testing.assert_allclose(
                run(x, n_rows, lo, opt), ref, rtol=0, atol=2e-6,
                err_msg=f"{n_rows} {lo} {opt}")


def test_fgp_unroll_zero_lambda_matches_fori(rng):
    """λ_tv = 0 clamps the λ-scaled duals to zero — the unrolled kernel
    must agree with the default loop (which guards 1/λ) exactly there."""
    from rls_tpu.kernels.fista_tv_fused import fista_tv_fused

    n, B = 16, 2
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    lcat, rcat = op.cat["normal"]
    x0 = jnp.asarray(rng.normal(size=(B, n, n)), jnp.float32)
    lam = jnp.zeros((B,), jnp.float32)
    a = np.asarray(fista_tv_fused(x0, lcat, rcat, 0.9, lam, 5, 4,
                                  interpret=True))
    b = np.asarray(fista_tv_fused(x0, lcat, rcat, 0.9, lam, 5, 4,
                                  interpret=True, fgp_unroll=True))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_sepconv_stencil_normal_exact(rng):
    """The VPU stencil Gram equals the banded-matmul Gram (f64 truth),
    boundaries included — asymmetric and even-length taps."""
    from jax.experimental import pallas as pl

    from rls_tpu.kernels._fgp_common import make_sepconv_normal_stencil

    H = W = 24
    taps_h = np.array([0.1, 0.5, 0.3, 0.07, 0.03])
    taps_w = np.array([0.2, 0.6, 0.15, 0.05])
    op = rt.SeparableConvOperator.from_taps(taps_h, taps_w, im_shape=(H, W))
    u = jnp.asarray(rng.normal(size=(H, W)), jnp.float32)
    truth = (np.asarray(op.bh, np.float64)
             @ np.asarray(u, np.float64)
             @ np.asarray(op.bw, np.float64).T)

    def kern(x_ref, o_ref):
        st = make_sepconv_normal_stencil(taps_h, taps_w, H, W, jnp.float32)
        o_ref[...] = st(x_ref[...])

    got = np.asarray(pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=True)(u))
    assert np.linalg.norm(got - truth) / np.linalg.norm(truth) < 1e-6


def _small_deblur(rng, n=24, batch=3, rho=0.9, g=None, **solver_kw):
    if g is None:
        g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=5, unroll=True)
    solver = rt.FISTA.create(op, reg=reg, rho=rho, **solver_kw)
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    return solver, B


def test_fista_tv_fused_gradient_restart_matches_composed(rng):
    """restart="gradient" rides the in-kernel θ recurrence + restart dot
    (reference FISTA.jl:171-176) and must reproduce the composed unrolled
    trajectory. Mild 3-tap kernel (Gram spectrum ≳ 0.4): momentum
    overshoots near convergence within ~5 iterations, so the restart
    provably FIRES (verified below)."""
    from rls_tpu.kernels import solve_pgm_tv_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    mild = np.array([0.1, 1.0, 0.1])
    solver, B = _small_deblur(
        rng, rho=0.95, g=mild, iterations=12, rel_tol=0.0,
        track_residual=False, restart="gradient",
    )
    want = np.asarray(jax.jit(solve_batched_unrolled)(solver, B))
    got = np.asarray(solve_pgm_tv_fused(solver, B))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
    # the restart must actually fire on this problem: the no-restart
    # schedule gives a visibly different answer
    base = rt.FISTA.create(
        solver.AHA.A, reg=solver.reg, iterations=12, rho=0.95, rel_tol=0.0,
        track_residual=False,
    )
    plain = np.asarray(solve_pgm_tv_fused(base, B))
    assert np.abs(plain - got).max() > 1e-5


def test_fista_tv_fused_early_exit_matches_solve_batched(rng):
    """early_exit=True freezes converged problems in-kernel — matching
    solve_batched's done-masked while loop (FISTA.jl:187-189 early exit)."""
    from rls_tpu.kernels import solve_pgm_tv_fused
    from rls_tpu.models.solvers import solve_batched

    solver, B = _small_deblur(
        rng, iterations=15, rel_tol=0.35, track_residual=True
    )
    want = np.asarray(jax.jit(solve_batched)(solver, B))
    got = np.asarray(solve_pgm_tv_fused(solver, B, early_exit=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
    # ... and without the mask the fused path runs all iterations
    full = np.asarray(solve_pgm_tv_fused(solver, B))
    assert np.abs(full - got).max() > 1e-6


def test_pogm_tv_fused_gradient_restart_matches_composed(rng):
    """POGM restart="gradient" rides the in-kernel θ/σ/γ recurrences and
    the w-plane restart criterion (reference POGM.jl:189-232) and must
    reproduce the composed unrolled trajectory — including σ decrease
    (sigma_fac < 1) between restarts."""
    from rls_tpu.kernels import solve_pgm_tv_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    n, batch = 24, 3
    mild = np.array([0.1, 1.0, 0.1])
    kern = np.outer(mild, mild)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=5, unroll=True)
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    solver = rt.create_linear_solver(
        "POGM", op, reg=reg, iterations=12, rho=0.95, restart="gradient",
        sigma_fac=0.9, kwarg_warning=False,
    )
    want = np.asarray(jax.jit(solve_batched_unrolled)(solver, B))
    got = np.asarray(solve_pgm_tv_fused(solver, B))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
    # the restart machinery must actually matter on this problem: the
    # no-restart table schedule gives a visibly different answer
    base = rt.create_linear_solver(
        "POGM", op, reg=reg, iterations=12, rho=0.95, kwarg_warning=False
    )
    plain = np.asarray(solve_pgm_tv_fused(base, B))
    assert np.abs(plain - got).max() > 1e-5


def test_pogm_tv_fused_early_exit_matches_solve_batched(rng):
    """POGM early_exit=True freezes converged problems in-kernel —
    matching solve_batched's done-masked while loop (POGM.done)."""
    from rls_tpu.kernels import solve_pgm_tv_fused
    from rls_tpu.models.solvers import solve_batched

    n, batch = 24, 3
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=5, unroll=True)
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    solver = rt.create_linear_solver(
        "POGM", op, reg=reg, iterations=15, rho=0.9, rel_tol=0.35,
        kwarg_warning=False,
    )
    want = np.asarray(jax.jit(solve_batched)(solver, B))
    got = np.asarray(solve_pgm_tv_fused(solver, B, early_exit=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
    full = np.asarray(solve_pgm_tv_fused(solver, B))
    assert np.abs(full - got).max() > 1e-6


def test_fused_restart_rejects_optista(rng):
    """OptISTA has no restart scheme (matching the reference, which only
    implements it for FISTA/POGM) — the kernel wrapper must reject the
    combination rather than silently running the table schedule."""
    from rls_tpu.kernels.fista_tv_fused import fista_tv_fused

    n = 16
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g) / np.outer(g, g).sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    lcat, rcat = op.cat["normal"]
    x0 = jnp.zeros((2, n, n), jnp.float32)
    with pytest.raises(ValueError, match="restart"):
        fista_tv_fused(x0, lcat, rcat, 0.9, 1e-3, 3, 3, interpret=True,
                       method="optista", restart=True)


def test_fista_tv_tiled_matches_composed(rng):
    """The row-tiled beyond-VMEM kernel must EXACTLY reproduce the
    composed unrolled path (tiling streams exact iterates through HBM —
    halo recompute, not approximation). Small size so interpret mode
    stays fast; tile_rows forces ≥3 tiles so clamped top/middle/bottom
    windows all execute."""
    from rls_tpu.kernels import solve_fista_tv_tiled
    from rls_tpu.models.solvers import solve_batched_unrolled

    n, batch = 48, 2
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=3, unroll=True)
    solver = rt.FISTA.create(
        op, reg=reg, iterations=6, rho=0.9, rel_tol=0.0, track_residual=False
    )
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    want = np.asarray(jax.jit(solve_batched_unrolled)(solver, B))
    # interpret=True on every platform: this test checks SEMANTICS (the
    # 48-wide image fails the chip's W%128 DMA gate by design); the
    # compiled chip path is exercised by bench_suite's 512^2 config
    got = np.asarray(
        solve_fista_tv_tiled(
            solver, B, tile_rows=16, mode="hbm", interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
    # the DMA-free VMEM-carry variant must agree too (static in-kernel
    # tile loop; same windows, same masks)
    got_v = np.asarray(
        solve_fista_tv_tiled(
            solver, B, tile_rows=16, mode="vmem", interpret=True
        )
    )
    np.testing.assert_allclose(got_v, want, rtol=0, atol=1e-4)
    # ... and the fori-looped variant (iterations in-kernel, one grid
    # step per problem) — same sweep body, so bitwise-same math
    got_f = np.asarray(
        solve_fista_tv_tiled(
            solver, B, tile_rows=16, mode="vmem", interpret=True,
            iter_loop="fori",
        )
    )
    np.testing.assert_allclose(got_f, got_v, rtol=0, atol=0)


def test_pgm_tv_tiled_optista_pogm_match_composed(rng):
    """The VMEM-carry tiled kernel's OptISTA/POGM (x, y, z) variant must
    exactly reproduce the composed unrolled path (same f64 momentum
    table, exact tiling)."""
    from rls_tpu.kernels import solve_fista_tv_tiled
    from rls_tpu.models.solvers import solve_batched_unrolled

    n, batch = 48, 2
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=3, unroll=True)
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    for name in ("OptISTA", "POGM"):
        solver = rt.create_linear_solver(
            name, op, reg=reg, iterations=6, rho=0.9, kwarg_warning=False
        )
        want = np.asarray(jax.jit(solve_batched_unrolled)(solver, B))
        got = np.asarray(
            solve_fista_tv_tiled(
                solver, B, tile_rows=16, mode="vmem", interpret=True
            )
        )
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-4, err_msg=name)


def test_fista_tv_tiled_gradient_restart_matches_composed(rng):
    """The VMEM-carry tiled kernel's dynamic schedule (SMEM θ recurrence,
    restart dot accumulated over tile interiors) must reproduce the
    composed restart trajectory — the reference's default-configurable
    FISTA (FISTA.jl:171-176) at beyond-VMEM sizes."""
    from rls_tpu.kernels import solve_fista_tv_tiled
    from rls_tpu.models.solvers import solve_batched_unrolled

    mild = np.array([0.1, 1.0, 0.1])
    solver, B = _small_deblur(
        rng, rho=0.95, g=mild, iterations=12, rel_tol=0.0,
        track_residual=False, restart="gradient",
    )
    want = np.asarray(jax.jit(solve_batched_unrolled)(solver, B))
    got = np.asarray(
        solve_fista_tv_tiled(solver, B, tile_rows=8, mode="vmem",
                             interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
    # fori variant: θ/done as scalar loop carries, same math
    got_f = np.asarray(
        solve_fista_tv_tiled(solver, B, tile_rows=8, mode="vmem",
                             interpret=True, iter_loop="fori")
    )
    np.testing.assert_allclose(got_f, got, rtol=0, atol=0)
    # the restart must actually fire: the no-restart schedule differs
    base = rt.FISTA.create(
        solver.AHA.A, reg=solver.reg, iterations=12, rho=0.95, rel_tol=0.0,
        track_residual=False,
    )
    plain = np.asarray(
        solve_fista_tv_tiled(base, B, tile_rows=8, mode="vmem",
                             interpret=True)
    )
    assert np.abs(plain - got).max() > 1e-5


def test_fista_tv_tiled_early_exit_matches_solve_batched(rng):
    """Tiled early_exit=True freezes converged problems via the SMEM done
    flag — matching solve_batched's done-masked loop (FISTA.jl:187-189)."""
    from rls_tpu.kernels import solve_fista_tv_tiled
    from rls_tpu.models.solvers import solve_batched

    solver, B = _small_deblur(
        rng, iterations=15, rel_tol=0.35, track_residual=True
    )
    want = np.asarray(jax.jit(solve_batched)(solver, B))
    got = np.asarray(
        solve_fista_tv_tiled(solver, B, tile_rows=8, mode="vmem",
                             interpret=True, early_exit=True)
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
    got_f = np.asarray(
        solve_fista_tv_tiled(solver, B, tile_rows=8, mode="vmem",
                             interpret=True, early_exit=True,
                             iter_loop="fori")
    )
    np.testing.assert_allclose(got_f, got, rtol=0, atol=0)
    # ... and without the mask the tiled path runs all iterations
    full = np.asarray(
        solve_fista_tv_tiled(solver, B, tile_rows=8, mode="vmem",
                             interpret=True)
    )
    assert np.abs(full - got).max() > 1e-6


def test_pogm_tv_tiled_gradient_restart_matches_composed(rng):
    """Tiled POGM restart: the w plane rides a 4th VMEM carry, θ/σ/γ SMEM
    scalars, and the POGM.jl:222-232 criterion's dots accumulate over
    tile interiors — must reproduce the composed restart trajectory
    (σ decrease included)."""
    from rls_tpu.kernels import solve_fista_tv_tiled
    from rls_tpu.models.solvers import solve_batched_unrolled

    n, batch = 24, 3
    mild = np.array([0.1, 1.0, 0.1])
    kern = np.outer(mild, mild)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=5, unroll=True)
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    solver = rt.create_linear_solver(
        "POGM", op, reg=reg, iterations=12, rho=0.95, restart="gradient",
        sigma_fac=0.9, kwarg_warning=False,
    )
    want = np.asarray(jax.jit(solve_batched_unrolled)(solver, B))
    got = np.asarray(
        solve_fista_tv_tiled(solver, B, tile_rows=8, mode="vmem",
                             interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
    base = rt.create_linear_solver(
        "POGM", op, reg=reg, iterations=12, rho=0.95, kwarg_warning=False
    )
    plain = np.asarray(
        solve_fista_tv_tiled(base, B, tile_rows=8, mode="vmem",
                             interpret=True)
    )
    assert np.abs(plain - got).max() > 1e-5


def test_pogm_tv_tiled_early_exit_matches_solve_batched(rng):
    from rls_tpu.kernels import solve_fista_tv_tiled
    from rls_tpu.models.solvers import solve_batched

    n, batch = 24, 3
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=5, unroll=True)
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    solver = rt.create_linear_solver(
        "POGM", op, reg=reg, iterations=15, rho=0.9, rel_tol=0.35,
        kwarg_warning=False,
    )
    want = np.asarray(jax.jit(solve_batched)(solver, B))
    got = np.asarray(
        solve_fista_tv_tiled(solver, B, tile_rows=8, mode="vmem",
                             interpret=True, early_exit=True)
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
    full = np.asarray(
        solve_fista_tv_tiled(solver, B, tile_rows=8, mode="vmem",
                             interpret=True)
    )
    assert np.abs(full - got).max() > 1e-6


def test_fista_tv_tiled_rejects_unsupported(rng):
    from rls_tpu.kernels import solve_fista_tv_tiled

    n = 48
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g) / np.outer(g, g).sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=3, unroll=True)
    # FISTA/POGM restart is supported (VMEM-carry dynamic schedule);
    # OptISTA early-exit is not (no dynamic schedule, like the monolithic)
    from rls_tpu.kernels.fista_tv_tiled import check_fista_tv_tiled

    s = rt.FISTA.create(op, reg=reg, iterations=3, rho=0.9,
                        restart="gradient")
    check_fista_tv_tiled(s)  # must not raise
    sp = rt.create_linear_solver(
        "POGM", op, reg=reg, iterations=3, rho=0.9, restart="gradient",
        kwarg_warning=False,
    )
    check_fista_tv_tiled(sp)  # must not raise
    so = rt.create_linear_solver(
        "OptISTA", op, reg=reg, iterations=3, rho=0.9, rel_tol=0.1,
        kwarg_warning=False,
    )
    with pytest.raises(ValueError, match="FISTA/POGM"):
        solve_fista_tv_tiled(so, jnp.zeros((n * n, 1), jnp.float32),
                             early_exit=True)


def _warm_tv_problem(rng, n, batch, lam, tv_iters, iterations):
    import jax

    g = np.exp(-((np.arange(7) - 3) ** 2) / 4.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(
        lam, shape=(n, n), iterations_tv=tv_iters, unroll=True
    )
    solver = rt.FISTA.create(
        op, reg=reg, iterations=iterations, rho=0.9, rel_tol=0.0,
        track_residual=False,
    )
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    return op, solver, B


def test_fista_tv_fused_warm_equals_cold_at_convergence(rng):
    """With enough inner iterations both the cold and the warm-dual FGP
    solve the prox exactly, so the outer trajectories must coincide."""
    from rls_tpu.kernels import solve_pgm_tv_fused

    _, solver, B = _warm_tv_problem(
        rng, n=24, batch=3, lam=1e-3, tv_iters=60, iterations=8
    )
    cold = np.asarray(solve_pgm_tv_fused(solver, B))
    warm = np.asarray(solve_pgm_tv_fused(solver, B, warm_tv=True))
    np.testing.assert_allclose(warm, cold, rtol=0, atol=2e-4)


def test_fista_tv_fused_warm_beats_cold_per_inner_iteration():
    """warm_tv's measured value (and its limits): in the converged
    regime of a piecewise-constant deblurring problem the carried duals
    land the trajectory ~20% closer to the exact-prox reference than a
    cold start with the SAME inner budget. (Early outer iterations see
    no gain — the subproblems still move too fast for stale duals to
    help — so warm_tv is an accuracy refinement, not an inner-iteration
    discount; measured curves in the docstring of `_fista_loop_warm`.)"""
    import jax

    from rls_tpu._pytree import replace
    from rls_tpu.kernels import solve_pgm_tv_fused

    rng = np.random.default_rng(3)
    n, batch = 32, 2
    ax = np.arange(7) - 3
    g = np.exp(-(ax**2) / (2 * 1.5**2))
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    img = np.zeros((batch, n, n), np.float32)
    for b in range(batch):
        for _ in range(5):
            i0, j0 = rng.integers(0, n - 8, size=2)
            w, h = rng.integers(4, n // 3, size=2)
            img[b, i0 : i0 + w, j0 : j0 + h] += rng.normal()
    B = jax.vmap(op.mv)(jnp.asarray(img.reshape(batch, n * n))).T
    reg = rt.TVRegularization(
        5e-4, shape=(n, n), iterations_tv=60, unroll=True
    )
    solver = rt.FISTA.create(
        op, reg=reg, iterations=40, rho=0.95, rel_tol=0.0,
        track_residual=False,
    )
    ref = np.asarray(solve_pgm_tv_fused(solver, B))  # exact-prox trajectory

    def with_tv(k):
        return replace(solver, reg=replace(solver.reg, iterations_tv=k))

    warm10 = np.asarray(solve_pgm_tv_fused(with_tv(10), B, warm_tv=True))
    cold10 = np.asarray(solve_pgm_tv_fused(with_tv(10), B))
    err_warm = np.linalg.norm(warm10 - ref) / np.linalg.norm(ref)
    err_cold = np.linalg.norm(cold10 - ref) / np.linalg.norm(ref)
    assert err_warm < 0.9 * err_cold, (err_warm, err_cold)


def test_fista_tv_fused_warm_rejects_unsupported(rng):
    from rls_tpu._pytree import replace
    from rls_tpu.kernels import solve_pgm_tv_fused

    _, solver, B = _warm_tv_problem(
        rng, n=24, batch=3, lam=1e-3, tv_iters=5, iterations=4
    )
    s_restart = replace(solver, restart="gradient")
    with pytest.raises(ValueError, match="warm_tv"):
        solve_pgm_tv_fused(s_restart, B, warm_tv=True)


def test_admm_tv_tiled_long_taps_matches_composed(rng):
    """Regression: the tiled inner-CG matvec's halo must cover BOTH
    vertical stencil passes (2·(kh//2) rows). The old kh//2+1 rounded to
    8 was silently short for kernels with ≥11 taps — exact for the ≤9-tap
    kernels the other tests use, wrong at every tile seam beyond."""
    import jax

    from rls_tpu.kernels import solve_admm_tv_tiled
    from rls_tpu.models.solvers import solve_batched_unrolled

    n, batch = 32, 2
    g = np.exp(-((np.arange(11) - 5) ** 2) / 8.0)  # 11 taps: reach 2·5 = 10
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    reg = rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=4, unroll=True)
    solver = rt.ADMM.create(
        op, reg=reg, iterations=6, iterations_cg=5, unroll_cg=True, rho=0.1
    )
    X = jnp.asarray(rng.normal(size=(batch, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    want = np.asarray(jax.jit(solve_batched_unrolled)(solver, B))
    got = np.asarray(
        solve_admm_tv_tiled(solver, B, tile_rows=8, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-4)




def _ref_comp():
    """Compensated composed references ON THE CHIP only: the bf16-MXU
    matvec is ~4e-3 off f32 there, which would dominate fused-vs-composed
    bars; on f32-native CPU the PLAIN matmul is the exact reference and
    the compensated form would itself add ~2^-16/matvec noise."""
    import jax

    return jax.default_backend() != "cpu"


# --------------------------------------------------------------------------
# fused whole-solve CGNR
# --------------------------------------------------------------------------


def _cgnr_fused_system(rng, m=96, n=40, P=5):
    A = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(n), jnp.float32)
    X = jnp.asarray(rng.normal(size=(n, P)), jnp.float32)
    B = A @ X
    return A, B


def test_cgnr_fused_matches_unrolled(rng):
    from rls_tpu.kernels import solve_cgnr_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    A, B = _cgnr_fused_system(rng)
    s = rt.CGNR.create(
        rt.DenseOperator(A, compensated=_ref_comp()),
        reg=rt.L2Regularization(1e-3), iterations=30,
    )
    ref = np.asarray(solve_batched_unrolled(s, B))
    # interpret only on CPU: forcing interpret on the chip lowers the
    # kernel to XLA bf16 matmuls, the exact failure mode it avoids
    out = np.asarray(solve_cgnr_fused(s, B))
    assert np.linalg.norm(out - ref) / np.linalg.norm(ref) < 2e-5


def test_cgnr_fused_past_convergence_with_positivity(rng):
    # iterations > n engages the guarded divisions (identity steps past
    # CG termination) and the in-kernel final Positive projection
    from rls_tpu.kernels import solve_cgnr_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    A, B = _cgnr_fused_system(rng, m=48, n=24, P=3)
    s = rt.CGNR.create(
        rt.DenseOperator(A, compensated=_ref_comp()),
        reg=[rt.L2Regularization(1e-4), rt.PositiveRegularization()],
        iterations=200,
    )
    assert s.total_steps == 24
    ref = np.asarray(solve_batched_unrolled(s, B))
    out = np.asarray(solve_cgnr_fused(s, B))
    assert np.all(out >= 0.0)
    assert np.linalg.norm(out - ref) / max(np.linalg.norm(ref), 1e-30) < 5e-5


def test_cgnr_fused_normalization_strategy(rng):
    from rls_tpu.kernels import solve_cgnr_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    A, B = _cgnr_fused_system(rng, m=40, n=32, P=4)
    s = rt.CGNR.create(
        rt.DenseOperator(A, compensated=_ref_comp()),
        reg=rt.L2Regularization(5e-2),
        normalize_reg=rt.MeasurementBasedNormalization(),
        iterations=32,
    )
    ref = np.asarray(solve_batched_unrolled(s, B))
    out = np.asarray(solve_cgnr_fused(s, B))
    assert np.linalg.norm(out - ref) / np.linalg.norm(ref) < 1e-4


def test_cgnr_fused_rejects_unsupported(rng):
    from rls_tpu.kernels import check_cgnr_fused
    from rls_tpu.ops.base import NormalOperator

    A, _ = _cgnr_fused_system(rng, m=16, n=12, P=1)
    ok = rt.CGNR.create(
        rt.DenseOperator(A), reg=rt.L2Regularization(1e-3), iterations=8
    )
    check_cgnr_fused(ok)  # baseline passes

    fista = rt.FISTA.create(
        rt.DenseOperator(A), reg=rt.L1Regularization(1e-3), iterations=8
    )
    with pytest.raises(ValueError, match="CGNR solver"):
        check_cgnr_fused(fista)

    from rls_tpu._pytree import replace as _replace

    s_w = _replace(ok, AHA=NormalOperator(A=ok.A, weights=jnp.ones((16,))))
    with pytest.raises(ValueError, match="normal"):
        check_cgnr_fused(s_w)

    s_vec = rt.CGNR.create(
        rt.DenseOperator(A),
        reg=rt.L2Regularization(jnp.full((12,), 1e-3)),
        iterations=8,
    )
    with pytest.raises(ValueError, match="scalar"):
        check_cgnr_fused(s_vec)

    big = rt.CGNR.create(
        rt.DenseOperator(jnp.zeros((1024, 1024), jnp.float32)),
        reg=rt.L2Regularization(1e-3),
        iterations=8,
    )
    with pytest.raises(ValueError, match="VMEM"):
        check_cgnr_fused(big)


def test_solve_batched_fast_dispatches_cgnr(rng):
    import warnings as _warnings

    from rls_tpu.kernels import solve_batched_fast, solve_cgnr_fused

    A, B = _cgnr_fused_system(rng, m=32, n=24, P=3)
    s = rt.CGNR.create(
        rt.DenseOperator(A), reg=rt.L2Regularization(1e-3), iterations=16
    )
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")  # dispatch must not fall back
        out = solve_batched_fast(s, B, interpret=True)
    ref = solve_cgnr_fused(s, B, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


def test_cgnr_fused_complex_matches_unrolled(rng):
    """Complex systems ride the exact split-real embedding — the fused
    kernel must reproduce the composed complex scan path, including the
    post-kernel Real projection on the reassembled iterate."""
    from rls_tpu.kernels import solve_cgnr_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    m, n, P = 40, 24, 3
    Ac = jnp.asarray(
        (rng.normal(size=(m, n)) + 1j * rng.normal(size=(m, n)))
        / np.sqrt(2 * n),
        jnp.complex64,
    )
    X = jnp.asarray(
        rng.normal(size=(n, P)) + 1j * rng.normal(size=(n, P)), jnp.complex64
    )
    B = Ac @ X
    s = rt.CGNR.create(
        rt.DenseOperator(Ac), reg=rt.L2Regularization(1e-3), iterations=20
    )
    ref = np.asarray(solve_batched_unrolled(s, B))
    out = np.asarray(solve_cgnr_fused(s, B, interpret=True))
    assert out.dtype == np.complex64
    # both paths sit at the f32 Krylov rounding floor (~1e-4 vs an f64
    # run); the fused real-α recurrence rounds differently than the
    # composed complex-α one, so compare at that floor
    assert np.linalg.norm(out - ref) / np.linalg.norm(ref) < 3e-4

    s_real = rt.CGNR.create(
        rt.DenseOperator(Ac),
        reg=[rt.L2Regularization(1e-3), rt.RealRegularization()],
        iterations=20,
    )
    ref_r = np.asarray(solve_batched_unrolled(s_real, B))
    out_r = np.asarray(solve_cgnr_fused(s_real, B, interpret=True))
    assert np.all(np.imag(out_r) == 0.0)
    assert np.linalg.norm(out_r - ref_r) / np.linalg.norm(ref_r) < 3e-4


def test_cgnr_fused_real_A_complex_b(rng):
    """Real A with complex b: α couples the real/imag planes through the
    joint ζ, so the embedding (Im A = 0) — not plane stacking — is the
    correct reduction; must match the composed complex path."""
    from rls_tpu.kernels import solve_cgnr_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    m, n, P = 32, 20, 2
    A = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(n), jnp.float32)
    B = jnp.asarray(
        rng.normal(size=(m, P)) + 1j * rng.normal(size=(m, P)), jnp.complex64
    )
    s = rt.CGNR.create(
        rt.DenseOperator(A), reg=rt.L2Regularization(1e-3), iterations=20
    )
    ref = np.asarray(solve_batched_unrolled(s, B))
    out = np.asarray(solve_cgnr_fused(s, B, interpret=True))
    assert out.dtype == np.complex64
    assert np.linalg.norm(out - ref) / np.linalg.norm(ref) < 3e-4


def test_cgnr_fused_batch_chunking(rng):
    """Batches beyond the per-call VMEM allowance run as several kernel
    calls (batch_chunk) with identical results."""
    from rls_tpu.kernels import solve_cgnr_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    A, B = _cgnr_fused_system(rng, m=32, n=20, P=7)
    # iterations = n: CG terminates, so fused and composed CONVERGE to
    # the same regularized solution — comparing mid-trajectory iterates
    # instead would measure f32 reduction-order divergence (amplified by
    # CG), ~1e-3 on chip
    s = rt.CGNR.create(
        rt.DenseOperator(A, compensated=_ref_comp()),
        reg=rt.L2Regularization(1e-3), iterations=20,
    )
    full = np.asarray(solve_cgnr_fused(s, B))
    for bc in (1, 3):  # 3 does not divide 7 — ragged final chunk
        chunked = np.asarray(
            solve_cgnr_fused(s, B, batch_chunk=bc)
        )
        # chip: different grid sizes compile different schedules, so
        # chunked vs full is f32-reassociation-close, not bitwise
        # (bitwise holds in CPU interpret mode)
        np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-5)
    ref = np.asarray(solve_batched_unrolled(s, B))
    assert np.linalg.norm(full - ref) / np.linalg.norm(ref) < 2e-4


# --------------------------------------------------------------------------
# fused PDHG (primal-dual)
# --------------------------------------------------------------------------


def _pdhg_problem(rng, n=24, P=3):
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    g /= g.sum()
    op = rt.SeparableConvOperator.from_taps(g, g, im_shape=(n, n))
    X = jnp.asarray(rng.normal(size=(P, n * n)), jnp.float32)
    B = jax.vmap(op.mv)(X).T
    return op, B


def test_pdhg_fused_tv8_matches_composed(rng):
    from rls_tpu.kernels import solve_pdhg_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    n = 24
    op, B = _pdhg_problem(rng, n=n)
    for kwargs in (dict(), dict(enforce_positive=True, enforce_real=True)):
        s = rt.PDHG.create(
            op,
            reg=rt.TVRegularization(5e-3, shape=(n, n)),
            iterations=12,
            **kwargs,
        )
        assert s.tv_scheme == "8dir"
        want = np.asarray(solve_batched_unrolled(s, B))
        got = np.asarray(solve_pdhg_fused(s, B, interpret=True))
        err = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert err < 1e-5, (kwargs, err)


def test_pdhg_fused_isotropic_matches_composed(rng):
    """The isotropic scheme (2-plane directional gradient + elementwise
    dual clamp) rides the kernel too."""
    from rls_tpu._pytree import replace as _replace
    from rls_tpu.kernels import solve_pdhg_fused
    from rls_tpu.models.solvers import solve_batched_unrolled
    from rls_tpu.ops.grad import GradientOperator

    n = 20
    op, B = _pdhg_problem(rng, n=n, P=2)
    s8 = rt.PDHG.create(
        op, reg=rt.TVRegularization(5e-3, shape=(n, n)), iterations=10,
        enforce_positive=True, enforce_real=True,
    )
    s = _replace(
        s8, tv_scheme="isotropic",
        trafo=GradientOperator(im_shape=(n, n), _dtype=jnp.float32),
    )
    want = np.asarray(solve_batched_unrolled(s, B))
    got = np.asarray(solve_pdhg_fused(s, B, interpret=True))
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-5, err


def test_pdhg_fused_l1_matches_composed(rng):
    from rls_tpu.kernels import solve_pdhg_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    n = 16
    op, B = _pdhg_problem(rng, n=n, P=2)
    s = rt.PDHG.create(
        op, reg=rt.L1Regularization(1e-3), iterations=15,
        normalize_reg=rt.MeasurementBasedNormalization(),
    )
    want = np.asarray(solve_batched_unrolled(s, B))
    got = np.asarray(solve_pdhg_fused(s, B, interpret=True))
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-5, err


def test_pdhg_fused_rejects_unsupported(rng):
    from rls_tpu.kernels import check_pdhg_fused
    from rls_tpu._pytree import replace as _replace

    n = 16
    op, B = _pdhg_problem(rng, n=n, P=1)
    ok = rt.PDHG.create(
        op, reg=rt.TVRegularization(1e-3, shape=(n, n)), iterations=4
    )
    check_pdhg_fused(ok)

    s_dense = rt.PDHG.create(
        rt.DenseOperator(jnp.asarray(rng.normal(size=(n, n)), jnp.float32)),
        reg=rt.L1Regularization(1e-3), iterations=4,
    )
    with pytest.raises(ValueError, match="SeparableConvOperator"):
        check_pdhg_fused(s_dense)

    fista = rt.FISTA.create(
        op, reg=rt.L1Regularization(1e-3), iterations=4
    )
    with pytest.raises(ValueError, match="PDHG solver"):
        check_pdhg_fused(fista)


def test_solve_batched_fast_dispatches_pdhg(rng):
    import warnings as _warnings

    from rls_tpu.kernels import solve_batched_fast, solve_pdhg_fused

    n = 16
    op, B = _pdhg_problem(rng, n=n, P=2)
    s = rt.PDHG.create(
        op, reg=rt.TVRegularization(1e-3, shape=(n, n)), iterations=6
    )
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        got = solve_batched_fast(s, B, interpret=True)
    ref = solve_pdhg_fused(s, B, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_admm_tv_fused_positivity_matches_composed(rng):
    """Positive projection terms now run in-kernel (after the x-update,
    reference ADMM.jl:246-249) in both the monolithic and tiled ADMM
    kernels."""
    from rls_tpu.kernels import solve_admm_tv_fused, solve_admm_tv_tiled
    from rls_tpu.models.solvers import solve_batched_unrolled

    n = 24
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    X = jnp.abs(jnp.asarray(rng.normal(size=(3, n * n)), jnp.float32))
    B = jax.vmap(op.mv)(X).T
    s = rt.ADMM.create(
        op,
        reg=[
            rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=3,
                                unroll=True),
            rt.PositiveRegularization(),
        ],
        iterations=4, iterations_cg=3, unroll_cg=True, rho=0.1,
    )
    assert len(s.proj) == 1
    want = np.asarray(solve_batched_unrolled(s, B))
    got = np.asarray(solve_admm_tv_fused(s, B, interpret=True))
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-4
    got_t = np.asarray(solve_admm_tv_tiled(s, B, interpret=True))
    assert np.abs(got_t - want).max() / np.abs(want).max() < 2e-4


# --------------------------------------------------------------------------
# fused dense FISTA
# --------------------------------------------------------------------------


def test_pgm_dense_fused_matches_unrolled(rng):
    from rls_tpu.kernels import solve_pgm_dense_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    m, n, P = 48, 96, 4  # underdetermined CS-style system
    A = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(m), jnp.float32)
    X = jnp.asarray(
        rng.normal(size=(n, P)) * (rng.uniform(size=(n, P)) < 0.2),
        jnp.float32,
    )
    B = A @ X
    for reg, kwargs in (
        (rt.L1Regularization(1e-3), dict()),
        (rt.L1Regularization(1e-3), dict(restart="gradient")),
        (rt.L1Regularization(1e-3), dict(restart="gradient_mapping")),
        (rt.L2Regularization(1e-3), dict()),
        ([rt.L1Regularization(1e-3), rt.PositiveRegularization()], dict()),
        (rt.L1Regularization(1e-3),
         dict(normalize_reg=rt.MeasurementBasedNormalization())),
    ):
        s = rt.FISTA.create(
            rt.DenseOperator(A, compensated=_ref_comp()),
            reg=reg, iterations=40, rho=0.4,
            track_residual=False, **kwargs,
        )
        want = np.asarray(solve_batched_unrolled(s, B))
        got = np.asarray(solve_pgm_dense_fused(s, B))
        err = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)
        assert err < 1e-4, (reg, kwargs, err)
        if kwargs.get("restart") is None and not isinstance(reg, list):
            chunked = np.asarray(
                solve_pgm_dense_fused(s, B, batch_chunk=3)
            )
            np.testing.assert_allclose(chunked, got, rtol=1e-5, atol=1e-5)


def test_pgm_dense_fused_restart_fires(rng):
    """On a problem where the restart provably changes the trajectory,
    the fused restart path must still match the composed one."""
    from rls_tpu.kernels import solve_pgm_dense_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    m, n = 40, 24
    A = jnp.asarray(
        rng.normal(size=(m, n)) / np.sqrt(m) + np.eye(m, n), jnp.float32
    )
    B = jnp.asarray(rng.normal(size=(m, 2)), jnp.float32)
    L = float(np.linalg.norm(np.asarray(A), 2) ** 2)
    mk = lambda r: rt.FISTA.create(
        rt.DenseOperator(A, compensated=_ref_comp()),
        reg=rt.L1Regularization(1e-3), iterations=60,
        rho=0.95 / L, restart=r, track_residual=False,
    )
    plain = np.asarray(solve_batched_unrolled(mk("none"), B))
    restarted = np.asarray(solve_batched_unrolled(mk("gradient"), B))
    assert np.linalg.norm(plain - restarted) > 1e-6  # restart fired
    got = np.asarray(solve_pgm_dense_fused(mk("gradient"), B))
    err = np.linalg.norm(got - restarted) / np.linalg.norm(restarted)
    assert err < 1e-4, err


def test_pgm_dense_fused_rejections(rng):
    from rls_tpu.kernels import check_pgm_dense_fused

    m, n = 16, 12
    A = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    ok = rt.FISTA.create(
        rt.DenseOperator(A), reg=rt.L1Regularization(1e-3), iterations=4
    )
    check_pgm_dense_fused(ok)

    pogm = rt.POGM.create(
        rt.DenseOperator(A), reg=rt.L1Regularization(1e-3), iterations=4
    )
    check_pgm_dense_fused(pogm)  # POGM rides the table path now
    pogm_r = rt.POGM.create(
        rt.DenseOperator(A), reg=rt.L1Regularization(1e-3), iterations=4,
        restart="gradient",
    )
    with pytest.raises(ValueError, match="composed"):
        check_pgm_dense_fused(pogm_r)
    kacz = rt.Kaczmarz.create(
        rt.DenseOperator(A), reg=rt.L2Regularization(1e-3), iterations=4
    )
    with pytest.raises(ValueError, match="FISTA/OptISTA/POGM"):
        check_pgm_dense_fused(kacz)
    opt_p = rt.OptISTA.create(
        rt.DenseOperator(A),
        reg=[rt.L1Regularization(1e-3), rt.PositiveRegularization()],
        iterations=4,
    )
    with pytest.raises(ValueError, match="projection"):
        check_pgm_dense_fused(opt_p)

    s_tv = rt.FISTA.create(
        rt.DenseOperator(A),
        reg=rt.TVRegularization(1e-3, shape=(n,), dims=0), iterations=4,
    )
    with pytest.raises(ValueError, match="L1/L2"):
        check_pgm_dense_fused(s_tv)

    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    sep = rt.SeparableConvOperator.from_taps(g, g, im_shape=(n, n))
    s_sep = rt.FISTA.create(
        sep, reg=rt.L1Regularization(1e-3), iterations=4
    )
    with pytest.raises(ValueError, match="dense operator"):
        check_pgm_dense_fused(s_sep)


def test_fused_and_tiled_gradient_mapping_match_composed(rng):
    """restart="gradient_mapping" (the composite-gradient variant) rides
    the monolithic AND tiled FISTA-TV kernels and must reproduce the
    composed trajectory."""
    from rls_tpu._pytree import replace as _replace
    from rls_tpu.kernels import solve_pgm_tv_fused, solve_fista_tv_tiled
    from rls_tpu.models.solvers import solve_batched_unrolled

    mild = np.array([0.1, 1.0, 0.1])
    solver, B = _small_deblur(
        rng, rho=0.95, g=mild, iterations=12, rel_tol=0.0,
        track_residual=False, restart="gradient_mapping",
    )
    want = np.asarray(solve_batched_unrolled(solver, B))
    got = np.asarray(solve_pgm_tv_fused(solver, B))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)

    # tiled VMEM-carry variant (n=24 rows tile fine at this size)
    got_t = np.asarray(solve_fista_tv_tiled(solver, B, mode="vmem"))
    np.testing.assert_allclose(got_t, want, rtol=0, atol=1e-4)


def test_pgm_dense_fused_optista_pogm_match_composed(rng):
    """OptISTA/POGM dense solves ride the f64-table loop and must match
    the composed unrolled paths (table vs f32 scalar recurrence: ~1e-5
    trajectory differences over 40 iterations)."""
    from rls_tpu.kernels import solve_pgm_dense_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    m, n, P = 48, 96, 3
    A = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(m), jnp.float32)
    X = jnp.asarray(
        rng.normal(size=(n, P)) * (rng.uniform(size=(n, P)) < 0.2),
        jnp.float32,
    )
    B = A @ X
    for cls, reg in (
        (rt.OptISTA, rt.L1Regularization(1e-3)),
        (rt.OptISTA, rt.L2Regularization(1e-3)),
        (rt.POGM, rt.L1Regularization(1e-3)),
        (rt.POGM, [rt.L1Regularization(1e-3), rt.PositiveRegularization()]),
    ):
        L = float(np.linalg.norm(np.asarray(A), 2) ** 2)
        s = cls.create(
            rt.DenseOperator(A, compensated=_ref_comp()),
            reg=reg, iterations=40, rho=0.95 / L,
            track_residual=False,
        )
        want = np.asarray(solve_batched_unrolled(s, B))
        got = np.asarray(solve_pgm_dense_fused(s, B))
        err = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)
        assert np.isfinite(got).all()
        assert err < 1e-4, (cls.__name__, err)


def test_pgm_dense_fused_complex_matches_unrolled(rng):
    """Complex dense FISTA rides the separate-plane kernel: group L1
    soft threshold over the re/im pair, complex-pattern compensated
    matvecs, real-part restart dots, and the Real/Positive projections'
    complex semantics (imaginary plane zeroed)."""
    from rls_tpu.kernels import solve_pgm_dense_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    m, n, P = 40, 24, 3
    Ac = jnp.asarray(
        (rng.normal(size=(m, n)) + 1j * rng.normal(size=(m, n)))
        / np.sqrt(2 * m),
        jnp.complex64,
    )
    B = jnp.asarray(
        rng.normal(size=(m, P)) + 1j * rng.normal(size=(m, P)), jnp.complex64
    )
    for reg, kwargs in (
        (rt.L1Regularization(1e-3), dict()),
        (rt.L1Regularization(1e-3), dict(restart="gradient")),
        (rt.L1Regularization(1e-3), dict(restart="gradient_mapping")),
        (rt.L2Regularization(1e-3), dict()),
        ([rt.L1Regularization(1e-3), rt.RealRegularization()], dict()),
        ([rt.L1Regularization(1e-3), rt.PositiveRegularization()], dict()),
    ):
        s = rt.FISTA.create(
            rt.DenseOperator(Ac), reg=reg, iterations=30, rho=0.3,
            track_residual=False, **kwargs,
        )
        want = np.asarray(solve_batched_unrolled(s, B))
        got = np.asarray(solve_pgm_dense_fused(s, B, interpret=True))
        assert got.dtype == np.complex64
        err = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)
        assert err < 1e-4, (reg, kwargs, err)


def test_pgm_dense_fused_real_A_complex_b(rng):
    """Real A with complex b routes through the plane kernel (Im A = 0):
    the planes couple through the joint momentum scalars, and the Real
    projection must zero the imaginary plane (the check sees only the
    real A, so the wrapper re-derives the prox kind)."""
    from rls_tpu.kernels import solve_pgm_dense_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    m, n, P = 32, 20, 2
    A = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(m), jnp.float32)
    Bc = jnp.asarray(
        rng.normal(size=(m, P)) + 1j * rng.normal(size=(m, P)), jnp.complex64
    )
    for reg in (
        rt.L1Regularization(1e-3),
        [rt.L1Regularization(1e-3), rt.RealRegularization()],
    ):
        s = rt.FISTA.create(
            rt.DenseOperator(A), reg=reg, iterations=20, rho=0.2,
            track_residual=False,
        )
        want = np.asarray(solve_batched_unrolled(s, Bc))
        got = np.asarray(solve_pgm_dense_fused(s, Bc, interpret=True))
        assert got.dtype == np.complex64
        err = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert err < 1e-4, err


def test_pdhg_fused_rejects_complex_b(rng):
    from rls_tpu.kernels import solve_pdhg_fused

    n = 16
    op, B = _pdhg_problem(rng, n=n, P=1)
    s = rt.PDHG.create(
        op, reg=rt.TVRegularization(1e-3, shape=(n, n)), iterations=3
    )
    with pytest.raises(ValueError, match="real data"):
        solve_pdhg_fused(s, B.astype(jnp.complex64), interpret=True)


def test_pgm_dense_fused_complex_optista_pogm(rng):
    """Complex dense OptISTA/POGM ride the plane-pair table loop and
    must match the composed complex paths."""
    from rls_tpu.kernels import solve_pgm_dense_fused
    from rls_tpu.models.solvers import solve_batched_unrolled

    m, n, P = 36, 20, 2
    Ac = jnp.asarray(
        (rng.normal(size=(m, n)) + 1j * rng.normal(size=(m, n)))
        / np.sqrt(2 * m),
        jnp.complex64,
    )
    B = jnp.asarray(
        rng.normal(size=(m, P)) + 1j * rng.normal(size=(m, P)), jnp.complex64
    )
    L = float(np.linalg.norm(np.asarray(Ac), 2) ** 2)
    for cls, reg in (
        (rt.OptISTA, rt.L1Regularization(1e-3)),
        (rt.OptISTA, rt.L2Regularization(1e-3)),
        (rt.POGM, rt.L1Regularization(1e-3)),
        (rt.POGM, [rt.L1Regularization(1e-3), rt.RealRegularization()]),
    ):
        s = cls.create(
            rt.DenseOperator(Ac), reg=reg, iterations=30, rho=0.95 / L,
            track_residual=False,
        )
        want = np.asarray(solve_batched_unrolled(s, B))
        got = np.asarray(solve_pgm_dense_fused(s, B, interpret=True))
        assert got.dtype == np.complex64
        err = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)
        assert np.isfinite(np.abs(got)).all()
        assert err < 1e-4, (cls.__name__, err)


def test_fgp_dual_bf16_close_and_exact_at_zero_lambda(rng):
    """bf16-stored FGP duals (the r4 roofline lever) perturb the
    trajectory by at most the dual storage rounding (~2e-4 over a full
    solve, CPU-measured); at λ_tv = 0 the duals are exactly zero in any
    dtype, so bf16 must match f32 bitwise."""
    from rls_tpu.kernels.fista_tv_fused import fista_tv_fused

    n, B = 24, 4
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    lcat, rcat = op.cat["normal"]
    x0 = jnp.asarray(rng.normal(size=(B, n, n)), jnp.float32)
    rho = jnp.asarray([0.9, 0.8, 0.95, 0.85], jnp.float32)
    lam = jnp.asarray([1e-3, 2e-3, 5e-4, 3e-3], jnp.float32)
    a = np.asarray(fista_tv_fused(x0, lcat, rcat, rho, lam, 8, 6,
                                  interpret=True, fgp_unroll=True))
    for kw in (
        dict(fgp_unroll=True, fgp_dual_bf16=True),
        dict(fgp_unroll=False, fgp_dual_bf16=True),
        dict(gram="noconcat", group=2, fgp_unroll=True,
             fgp_dual_bf16=True),
        dict(gram="stencil", taps=op.taps_hw(), group=2, fgp_unroll=True,
             fgp_dual_bf16=True),
    ):
        b = np.asarray(fista_tv_fused(
            x0, lcat, rcat, rho, lam, 8, 6, interpret=True, **kw))
        rel = np.linalg.norm(a - b) / np.linalg.norm(a)
        assert rel < 2e-3, (kw, rel)
        assert rel > 0.0, (kw, "bf16 path identical to f32 — flag inert?")
    lam0 = jnp.zeros((B,), jnp.float32)
    a0 = np.asarray(fista_tv_fused(x0, lcat, rcat, 0.9, lam0, 5, 4,
                                   interpret=True, fgp_unroll=True))
    b0 = np.asarray(fista_tv_fused(x0, lcat, rcat, 0.9, lam0, 5, 4,
                                   interpret=True, fgp_unroll=True,
                                   fgp_dual_bf16=True))
    np.testing.assert_allclose(a0, b0, rtol=0, atol=1e-6)


def test_gram_noconcat_full4_matches_f64(rng):
    """The 4-term noconcat Gram must track the f64 Gram strictly better
    than the 3-term form tracks it (the dropped lo·lo products are the
    r3/r4 parity-miss mechanism for error-integrating solvers)."""
    from rls_tpu.kernels._fgp_common import make_gram_normal_noconcat

    n = 32
    Bh = rng.normal(size=(n, n)).astype(np.float32)
    u = rng.normal(size=(n, n)).astype(np.float32)
    from rls_tpu.ops._precise import split_bf16

    bh, bl = split_bf16(jnp.asarray(Bh))
    l2 = jnp.concatenate([bh, bl], axis=0)
    r2 = jnp.concatenate([bh.T, bl.T], axis=1)
    g3 = make_gram_normal_noconcat(l2, bh, r2, bh.T, jnp.float32)
    g4 = make_gram_normal_noconcat(l2, bh, r2, bh.T, jnp.float32,
                                   full4=True)
    ref = (Bh.astype(np.float64) @ u.astype(np.float64)) @ Bh.T.astype(
        np.float64)
    e3 = np.abs(np.asarray(g3(jnp.asarray(u))) - ref).max()
    e4 = np.abs(np.asarray(g4(jnp.asarray(u))) - ref).max()
    scale = np.abs(ref).max()
    assert e4 / scale < 5e-7, e4 / scale
    assert e4 <= e3, (e3, e4)


def test_split3_bf16_invariants(rng):
    """3-way split: exact reconstruction, hi/mid exactly on the bf16
    grid (so MXU rounding is a no-op for them), lo at ~2^-17 of v (its
    own bf16 rounding is then ~2^-25 of v — full f32)."""
    from rls_tpu.ops._precise import split3_bf16

    v = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32)) * 37.3
    hi, mid, lo = split3_bf16(v)
    np.testing.assert_array_equal(np.asarray(hi + mid + lo), np.asarray(v))
    for part in (hi, mid):
        p = np.asarray(part)
        bits = p.view(np.uint32)
        assert (bits & np.uint32(0x0000FFFF) == 0).all()
    assert np.abs(np.asarray(lo)).max() <= 2.0 ** -16 * np.abs(
        np.asarray(v)).max()


def test_split_dft3_matches_f64(rng):
    """The 3-way-compensated DFT sandwich tracks the f64 DFT to ~1e-7
    and is self-adjoint-consistent (SplitBregman kernel's matvec)."""
    from rls_tpu.kernels._fgp_common import make_split_dft3
    from rls_tpu.ops._precise import stack3_left, stack3_right
    from rls_tpu.ops.dft_real import _dft_factors

    H = W = 64
    fr, fi = _dft_factors(H)
    xr = rng.normal(size=(H, W)).astype(np.float32)
    xi = rng.normal(size=(H, W)).astype(np.float32)
    F = fr.astype(np.float64) + 1j * fi.astype(np.float64)
    K = F @ (xr.astype(np.float64) + 1j * xi.astype(np.float64)) @ F.T
    cf3, ca3 = make_split_dft3(
        jnp.asarray(stack3_left(fr)), jnp.asarray(stack3_left(fi)),
        jnp.asarray(stack3_right(fr)), jnp.asarray(stack3_right(fi)),
        jnp.float32)
    kr, ki = cf3(jnp.asarray(xr), jnp.asarray(xi))
    err = np.abs((np.asarray(kr) + 1j * np.asarray(ki)) - K).max()
    assert err / np.abs(K).max() < 1e-6
    yr = rng.normal(size=(H, W)).astype(np.float32)
    yi = rng.normal(size=(H, W)).astype(np.float32)
    vr, vi = ca3(jnp.asarray(yr), jnp.asarray(yi))
    lhs = float(np.sum(np.asarray(kr) * yr + np.asarray(ki) * yi))
    rhs = float(np.sum(xr * np.asarray(vr) + xi * np.asarray(vi)))
    assert abs(lhs - rhs) / abs(lhs) < 1e-5


def test_sepconv_rmv_stencil_exact(rng):
    """rmv_stencil == the banded-matmul adjoint at f64 accuracy (the
    exact-f32 Aᴴb seed of the fused ADMM/PGM paths)."""
    n = 48
    g = np.exp(-((np.arange(7) - 3) ** 2) / 3.0)
    g /= g.sum()
    op = rt.SeparableConvOperator.from_kernel(np.outer(g, g),
                                              im_shape=(n, n))
    y = rng.normal(size=(n * n,)).astype(np.float32)
    a = np.asarray(op.rmv_stencil(jnp.asarray(y)))
    ah64 = np.asarray(op.ah, np.float64)
    aw64 = np.asarray(op.aw, np.float64)
    ref = (ah64.T @ y.reshape(n, n).astype(np.float64) @ aw64).reshape(-1)
    assert np.abs(a - ref).max() / np.abs(ref).max() < 1e-6
