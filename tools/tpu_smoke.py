"""On-chip smoke test for the restricted TPU runtime.

Runs every TPU-compatible path (control-flow-free, real dtype) on the
attached chip and checks numerical agreement with a CPU reference:
  * unrolled FISTA-TV (XLA fused) — the bench hot path
  * unrolled FISTA-TV with the Pallas TV kernel
  * Pallas Kaczmarz sweep
  * CGNR step sequence (unrolled)

Usage: python tools/tpu_smoke.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    # persistent compile cache: the unrolled programs take minutes cold
    # through the tunnel; cached re-runs finish in well under a minute
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import jax.numpy as jnp

    import rls_tpu as rt
    from rls_tpu._pytree import replace
    from rls_tpu.models.solvers import solve_unrolled

    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)
    rng = np.random.default_rng(0)
    n = 64

    # shared problem: conv deblurring
    k = 5
    axk = np.arange(k) - k // 2
    g = np.exp(-(axk**2) / 2.0)
    kern = np.outer(g, g); kern /= kern.sum()
    op = rt.DirectConvOperator(kernel=jnp.asarray(kern, jnp.float32), im_shape=(n, n))
    img = np.zeros((n, n), np.float32); img[16:48, 16:48] = 1.0
    xt = jnp.asarray(img.reshape(-1))
    b = op.mv(xt)

    results = {}
    for tag, reg in [
        ("fista_tv_xla", rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=5, unroll=True)),
        ("fista_tv_pallas", rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=5, unroll=True, backend="pallas")),
        ("fista_l1", rt.L1Regularization(1e-4)),
    ]:
        s = rt.FISTA.create(op, reg=reg, iterations=10, rho=0.95, rel_tol=0.0)
        x = jax.jit(solve_unrolled)(s, b)
        r = np.asarray(x)
        ok = np.isfinite(r).all()
        err = float(np.linalg.norm(r - np.asarray(xt)) / np.linalg.norm(np.asarray(xt)))
        results[tag] = (ok, err)
        print(f"{tag}: finite={ok} rel_err={err:.3f}", file=sys.stderr)

    # pallas kaczmarz
    A = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32) / 12)
    xk = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    bk = A @ xk
    s = rt.Kaczmarz.create(A, reg=rt.L2Regularization(1e-6), iterations=5, backend="pallas")
    x = jax.jit(solve_unrolled)(s, bk)
    err = float(np.linalg.norm(np.asarray(x) - np.asarray(xk)) / np.linalg.norm(np.asarray(xk)))
    results["kaczmarz_pallas"] = (np.isfinite(np.asarray(x)).all(), err)
    print(f"kaczmarz_pallas: rel_err={err:.4f}", file=sys.stderr)

    # fused whole-solve mega-kernels (sep-conv TV + DFT-real L1 + ADMM-TV)
    from rls_tpu.kernels import (
        solve_admm_tv_fused,
        solve_fista_l1_dft_fused,
        solve_pgm_tv_fused,
    )
    from rls_tpu.models.solvers import solve_batched_unrolled

    sep = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n, n))
    bsep = sep.mv(xt)
    Bm = jnp.tile(bsep[:, None], (1, 2))
    for tag, build, solve_fused in [
        ("fused_fista_tv",
         lambda: rt.FISTA.create(sep, reg=rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=5, unroll=True), iterations=10, rho=0.95, rel_tol=0.0, track_residual=False),
         solve_pgm_tv_fused),
        ("fused_admm_tv",
         lambda: rt.ADMM.create(sep, reg=rt.TVRegularization(1e-3, shape=(n, n), iterations_tv=5, unroll=True), iterations=5, iterations_cg=4, unroll_cg=True, rho=0.1),
         solve_admm_tv_fused),
    ]:
        s = build()
        got = np.asarray(jax.jit(lambda B, s=s, f=solve_fused: f(s, B))(Bm))
        want = np.asarray(jax.jit(lambda B, s=s: solve_batched_unrolled(s, B))(Bm))
        dev_err = float(np.abs(got - want).max() / (np.abs(want).max() + 1e-30))
        results[tag] = (np.isfinite(got).all(), dev_err)
        print(f"{tag}: finite={np.isfinite(got).all()} vs_composed={dev_err:.2e}",
              file=sys.stderr)

    idx = np.sort(rng.choice(n * n, size=n * n // 3, replace=False))
    dft = rt.SubsampledDFT2RealOperator.from_sample_idx(jnp.asarray(idx, jnp.int32), (n, n))
    Bd = jnp.tile(dft.mv(xt)[:, None], (1, 2))
    s = rt.FISTA.create(dft, reg=rt.L1Regularization(1e-3), iterations=10,
                        rho=0.95, rel_tol=0.0, track_residual=False)
    got = np.asarray(jax.jit(lambda B: solve_fista_l1_dft_fused(s, B))(Bd))
    want = np.asarray(jax.jit(lambda B: solve_batched_unrolled(s, B))(Bd))
    dev_err = float(np.abs(got - want).max() / (np.abs(want).max() + 1e-30))
    results["fused_fista_l1_dft"] = (np.isfinite(got).all(), dev_err)
    print(f"fused_fista_l1_dft: vs_composed={dev_err:.2e}", file=sys.stderr)

    # streamed whole-solve Kaczmarz (HBM row blocks, randomized order)
    from rls_tpu.kernels import solve_kaczmarz_streamed

    s = rt.Kaczmarz.create(
        A, reg=[rt.L2Regularization(1e-6), rt.PositiveRegularization()],
        iterations=5, randomized=True, sub_matrix_fraction=0.5,
        precompute_order=True)
    Bk = jnp.tile(jnp.abs(bk)[:, None], (1, 2))
    got = np.asarray(jax.jit(lambda B: solve_kaczmarz_streamed(s, B))(Bk))
    want = np.asarray(jax.jit(lambda B: solve_batched_unrolled(s, B))(Bk))
    dev_err = float(np.abs(got - want).max() / (np.abs(want).max() + 1e-30))
    results["kaczmarz_streamed"] = (np.isfinite(got).all(), dev_err)
    print(f"kaczmarz_streamed: vs_composed={dev_err:.2e}", file=sys.stderr)

    # chunked streamed Kaczmarz: forced tiny sweep chunks (the
    # HBM-bounded randomized driver) must equal the single-call kernel
    got_c = np.asarray(
        jax.jit(lambda B: solve_kaczmarz_streamed(s, B, chunk_sweeps=2))(Bk)
    )
    dev_err = float(np.abs(got_c - got).max() / (np.abs(got).max() + 1e-30))
    results["kaczmarz_streamed_chunked"] = (np.isfinite(got_c).all(), dev_err)
    print(f"kaczmarz_streamed_chunked: vs_single_call={dev_err:.2e}",
          file=sys.stderr)
    assert dev_err < 1e-5, "chunked sweeps must match the single call"

    # fused whole-solve CGNR (compensated MXU matvecs, in-kernel CG)
    from rls_tpu.kernels import solve_cgnr_fused

    s_cg = rt.CGNR.create(
        rt.DenseOperator(A), reg=rt.L2Regularization(1e-6), iterations=64
    )
    Bcg = jnp.tile(bk[:, None], (1, 4))
    got = np.asarray(jax.jit(lambda B: solve_cgnr_fused(s_cg, B))(Bcg))
    want = np.asarray(jax.jit(lambda B: solve_batched_unrolled(s_cg, B))(Bcg))
    dev_err = float(np.abs(got - want).max() / (np.abs(want).max() + 1e-30))
    sol_err = float(
        np.linalg.norm(got[:, 0] - np.asarray(xk))
        / np.linalg.norm(np.asarray(xk))
    )
    results["cgnr_fused"] = (np.isfinite(got).all(), sol_err)
    print(f"cgnr_fused: vs_composed={dev_err:.2e} sol_err={sol_err:.2e}",
          file=sys.stderr)
    # composed runs bf16 matmuls on chip (~4e-3); the fused kernel is
    # compensated — require it to SOLVE accurately, not merely agree
    assert sol_err < 1e-3, "fused CGNR must reach the f32 solution on chip"

    # fused dense FISTA (4-term compensated normal op, in-kernel θ/restart)
    from rls_tpu.kernels import solve_pgm_dense_fused

    s_pg = rt.FISTA.create(
        rt.DenseOperator(A), reg=rt.L1Regularization(1e-4), iterations=60,
        rho=0.15, restart="gradient", track_residual=False,
    )
    got = np.asarray(jax.jit(lambda B: solve_pgm_dense_fused(s_pg, B))(Bcg))
    want = np.asarray(
        jax.jit(lambda B: solve_batched_unrolled(s_pg, B))(Bcg)
    )
    dev_err = float(np.abs(got - want).max() / (np.abs(want).max() + 1e-30))
    sol_err = float(
        np.linalg.norm(got[:, 0] - np.asarray(xk))
        / np.linalg.norm(np.asarray(xk))
    )
    results["pgm_dense_fused"] = (np.isfinite(got).all(), sol_err)
    print(
        f"pgm_dense_fused: vs_composed={dev_err:.2e} sol_err={sol_err:.2e}",
        file=sys.stderr,
    )
    assert sol_err < 2e-2, "fused dense FISTA must solve on chip"

    # fused whole-solve PDHG (8-direction TV conjugate prox, VPU stencil
    # conv) vs the composed primal-dual path
    from rls_tpu.kernels import solve_pdhg_fused

    g5 = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    g5 /= g5.sum()
    sep24 = rt.SeparableConvOperator.from_taps(g5, g5, im_shape=(24, 24))
    s_pd = rt.PDHG.create(
        sep24, reg=rt.TVRegularization(5e-3, shape=(24, 24)), iterations=12
    )
    Xpd = jnp.asarray(rng.normal(size=(2, 24 * 24)), jnp.float32)
    Bpd = jax.vmap(sep24.mv)(Xpd).T
    got = np.asarray(jax.jit(lambda B: solve_pdhg_fused(s_pd, B))(Bpd))
    want = np.asarray(jax.jit(lambda B: solve_batched_unrolled(s_pd, B))(Bpd))
    dev_err = float(np.abs(got - want).max() / (np.abs(want).max() + 1e-30))
    results["pdhg_fused"] = (np.isfinite(got).all(), dev_err)
    print(f"pdhg_fused: vs_composed={dev_err:.2e}", file=sys.stderr)
    assert dev_err < 1e-3, "fused PDHG must match the composed path on chip"

    # SVD proxes on-chip: Jacobi SVT vs CPU f64 (nuclear + LLR)
    from rls_tpu.ops.jacobi_svd import svt_jacobi

    Ab = jnp.asarray(rng.normal(size=(16, 48, 6)).astype(np.float32))
    got = np.asarray(jax.jit(lambda a: svt_jacobi(a, 0.8))(Ab))
    u64, s64, vt64 = np.linalg.svd(np.asarray(Ab, np.float64),
                                   full_matrices=False)
    want = (u64 * np.maximum(s64 - 0.8, 0)[..., None, :]) @ vt64
    dev_err = float(np.linalg.norm(got - want) / np.linalg.norm(want))
    results["svt_jacobi"] = (np.isfinite(got).all(), dev_err)
    print(f"svt_jacobi: vs_f64={dev_err:.2e}", file=sys.stderr)
    assert dev_err < 1e-4, "Jacobi SVT must hold 1e-4 parity on chip"

    # scan-over-rounds Jacobi (the large-block compile-time mode) must
    # hold the same parity on chip
    got = np.asarray(jax.jit(lambda a: svt_jacobi(a, 0.8, unroll=False))(Ab))
    dev_err = float(np.linalg.norm(got - want) / np.linalg.norm(want))
    results["svt_jacobi_scan"] = (np.isfinite(got).all(), dev_err)
    print(f"svt_jacobi_scan: vs_f64={dev_err:.2e}", file=sys.stderr)
    assert dev_err < 1e-4, "scan-mode Jacobi SVT must hold 1e-4 on chip"

    nreg = rt.NuclearRegularization(0.05, svt_shape=(32, 32))
    xn = jnp.asarray(rng.normal(size=(32 * 32,)).astype(np.float32))
    got = np.asarray(jax.jit(nreg.prox)(xn))
    results["nuclear_prox"] = (np.isfinite(got).all(), 0.0)
    lreg = rt.LLRRegularization(0.05, shape=(32, 32), block_size=(8, 8))
    xl = jnp.asarray(rng.normal(size=(32 * 32 * 4,)).astype(np.float32))
    got = np.asarray(jax.jit(lreg.prox)(xl))
    results["llr_prox"] = (np.isfinite(got).all(), 0.0)
    print("nuclear/llr prox: finite on chip", file=sys.stderr)

    # wavelet operator (rolls + strided slices only): perfect
    # reconstruction must hold on chip exactly as on CPU
    wop = rt.WaveletOperator((64, 64), wavelet="db2")
    xw = jnp.asarray(rng.normal(size=(64 * 64,)).astype(np.float32))
    got = np.asarray(jax.jit(lambda v: wop.rmv(wop.mv(v)))(xw))
    dev_err = float(np.linalg.norm(got - np.asarray(xw)) /
                    np.linalg.norm(np.asarray(xw)))
    results["wavelet_roundtrip"] = (np.isfinite(got).all(), dev_err)
    print(f"wavelet_roundtrip: rel_err={dev_err:.2e}", file=sys.stderr)
    assert dev_err < 1e-5, "orthogonal DWT must reconstruct on chip"

    # direct solvers on chip: the Jacobi-SVD route must hit 1e-4 vs the
    # f64 regularized normal solve (XLA SVD/LU cap at ~2e-3 on bf16 MXU)
    from rls_tpu.models.solvers import solve as _solve

    Adir = jnp.asarray(rng.normal(size=(96, 64)).astype(np.float32) / 8)
    xdir = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    bdir = Adir @ xdir
    lam_d = 1e-3
    A64 = np.asarray(Adir, np.float64)
    want = np.linalg.solve(
        A64.T @ A64 + lam_d * np.eye(64), A64.T @ np.asarray(bdir, np.float64)
    )
    for tag, cls in [("direct_jacobi", rt.DirectSolver),
                     ("pinv_jacobi", rt.PseudoInverse)]:
        s_d = cls.create(Adir, reg=rt.L2Regularization(lam_d))
        got = np.asarray(jax.jit(lambda b, s=s_d: _solve(s, b))(bdir))
        dev_err = float(np.linalg.norm(got - want) / np.linalg.norm(want))
        results[tag] = (np.isfinite(got).all(), dev_err)
        print(f"{tag}: vs_f64={dev_err:.2e}", file=sys.stderr)
        assert dev_err < 1e-4, f"{tag} must hold 1e-4 vs f64 on chip"

    bad = [k for k, (ok, err) in results.items() if not ok or err > 0.9]
    print("SMOKE", "PASS" if not bad else f"FAIL {bad}")
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())
