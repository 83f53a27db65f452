"""Proximal map correctness, mirroring /root/reference/test/testProxMaps.jl:
each prox is tested as a denoiser (error shrinks) and via the proximal
objective-decrease inequality ½‖x−prox(x)‖² + g(prox(x)) ≤ g(x)
(testProxMaps.jl:15,38,70-71,101-102); directional TV ≡ per-line 1-D TV
(:128); Condat ≈ FGP (:133-135); nuclear (:167-192); LLR (:194-278)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rls_tpu as rt
from rls_tpu.models.prox import prox_tv_fgp, soft_threshold
from rls_tpu.models.tv_condat import tv_denoise_1d_condat


def _prox_inequality(reg, x, lam=None):
    p = reg.prox(x, lam) if lam is not None else reg.prox(x)
    gx = reg.value(x, lam) if lam is not None else reg.value(x)
    gp = reg.value(p, lam) if lam is not None else reg.value(p)
    lhs = 0.5 * float(jnp.linalg.norm(x - p) ** 2) + float(gp)
    assert lhs <= float(gx) * (1 + 1e-4) + 1e-5


def _denoise_improves(reg, signal, noisy, lam=None):
    den = reg.prox(noisy, lam) if lam is not None else reg.prox(noisy)
    err_noisy = float(jnp.linalg.norm(noisy - signal))
    err_den = float(jnp.linalg.norm(den - signal))
    assert err_den < err_noisy


def test_l1_prox(rng):
    x = jnp.asarray(
        (rng.normal(size=(64,)) + 1j * rng.normal(size=(64,))).astype(np.complex64)
    )
    reg = rt.L1Regularization(0.3)
    _prox_inequality(reg, x)
    # exact formula check against manual soft threshold
    p = reg.prox(x)
    mag = np.abs(np.asarray(x))
    expected = np.maximum(mag - 0.3, 0) * np.asarray(x) / np.where(mag == 0, 1, mag)
    np.testing.assert_allclose(np.asarray(p), expected, atol=1e-5)


def test_l2_prox(rng):
    x = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    reg = rt.L2Regularization(0.4)
    _prox_inequality(reg, x)
    np.testing.assert_allclose(
        np.asarray(reg.prox(x)), np.asarray(x) / (1 + 0.8), rtol=1e-6
    )
    # vector λ
    lam = jnp.asarray(rng.uniform(0.1, 1.0, size=(32,)), jnp.float32)
    regv = rt.L2Regularization(lam)
    np.testing.assert_allclose(
        np.asarray(regv.prox(x)), np.asarray(x / (1 + 2 * lam)), rtol=1e-6
    )


def test_l21_prox(rng):
    slices = 4
    x = jnp.asarray(
        (rng.normal(size=(slices * 16,))).astype(np.float32)
    )
    reg = rt.L21Regularization(0.5, slices=slices)
    _prox_inequality(reg, x)
    # group norms shrink uniformly per group
    p = reg.prox(x)
    x2 = np.asarray(x).reshape(slices, 16)
    p2 = np.asarray(p).reshape(slices, 16)
    gn = np.linalg.norm(x2, axis=0)
    scale = np.maximum((gn - 0.5) / gn, 0)
    np.testing.assert_allclose(p2, x2 * scale[None, :], atol=1e-5)


def test_tv_denoising_2d(rng):
    n = 16
    img = np.zeros((n, n), np.float32)
    img[4:10, 5:12] = 1.0
    noisy = img + 0.1 * rng.normal(size=img.shape).astype(np.float32)
    reg = rt.TVRegularization(0.08, shape=(n, n), iterations_tv=40)
    x = jnp.asarray(noisy.reshape(-1))
    _denoise_improves(reg, jnp.asarray(img.reshape(-1)), x)
    _prox_inequality(reg, x)


def test_tv_directional_equals_per_line(rng):
    """dims=int (Condat) ≡ applying 1-D TV to every line
    (testProxMaps.jl:128)."""
    n = 12
    img = rng.normal(size=(n, n)).astype(np.float32)
    reg = rt.TVRegularization(0.3, shape=(n, n), dims=1)
    out = np.asarray(reg.prox(jnp.asarray(img.reshape(-1)))).reshape(n, n)
    for i in range(n):
        line = np.asarray(tv_denoise_1d_condat(jnp.asarray(img[i]), 0.3))
        np.testing.assert_allclose(out[i], line, atol=1e-5)


def test_tv_condat_exactness(rng):
    """Condat result must satisfy the TV prox optimality better than FGP and
    agree with FGP to loose tolerance (testProxMaps.jl:133-135)."""
    n = 64
    sig = np.repeat(rng.normal(size=(8,)), 8).astype(np.float32)
    noisy = jnp.asarray(sig + 0.2 * rng.normal(size=(n,)).astype(np.float32))
    lam = 0.3
    exact = tv_denoise_1d_condat(noisy, lam)
    grad = rt.GradientOperator(im_shape=(n,), _dtype=jnp.float32)
    fgp = prox_tv_fgp(noisy, lam, grad, 400)

    def obj(u):
        return 0.5 * float(jnp.linalg.norm(u - noisy) ** 2) + lam * float(
            jnp.sum(jnp.abs(jnp.diff(u)))
        )

    assert obj(exact) <= obj(fgp) + 1e-4
    np.testing.assert_allclose(np.asarray(exact), np.asarray(fgp), atol=2e-2)


def test_nuclear_prox(rng):
    m = (rng.normal(size=(8, 6)) @ np.diag([5, 2, 1, 0.1, 0, 0])).astype(np.float32)
    x = jnp.asarray(m[:, :6].reshape(-1))
    reg = rt.NuclearRegularization(0.5, svt_shape=(8, 6))
    _prox_inequality(reg, x)
    # singular values of the result are soft-thresholded
    p = np.asarray(reg.prox(x)).reshape(8, 6)
    s_in = np.linalg.svd(np.asarray(x).reshape(8, 6), compute_uv=False)
    s_out = np.linalg.svd(p, compute_uv=False)
    # rtol 5e-5: the Jacobi SVT path plateaus at the f32 rotation floor
    # (~1e-5 relative), slightly above LAPACK's on the largest σ
    np.testing.assert_allclose(
        s_out, np.maximum(s_in - 0.5, 0), rtol=5e-5, atol=1e-4
    )


@pytest.mark.parametrize("randshift", [False, True])
def test_llr_prox_denoises(rng, randshift):
    """Low-rank multi-frame data + noise: LLR SVT must reduce error
    (testProxMaps.jl:194-236)."""
    n, K = 16, 6
    base = rng.normal(size=(n, n, 2)).astype(np.float32)
    coeff = rng.normal(size=(2, K)).astype(np.float32)
    clean = np.einsum("ijr,rk->ijk", base, coeff).reshape(-1)
    noisy = clean + 0.3 * rng.normal(size=clean.shape).astype(np.float32)
    reg = rt.LLRRegularization(
        0.4, shape=(n, n), block_size=(4, 4), randshift=randshift
    )
    _denoise_improves(reg, jnp.asarray(clean), jnp.asarray(noisy))


def test_llr_value_skips_partial_blocks(rng):
    """Reference blockNuclearNorm counts only L = floor(N/prod(block))
    FULL blocks (ProxLLR.jl:115-152) — trailing partial blocks of a
    non-dividing shape must not contribute to value()."""
    n, K = 7, 3  # 7 not divisible by 3 → one partial block per axis
    x = rng.normal(size=(n, n, K)).astype(np.float32).reshape(-1)
    reg = rt.LLRRegularization(
        0.5, shape=(n, n), block_size=(3, 3), randshift=False
    )
    got = float(reg.value(jnp.asarray(x)))
    # brute force: nuclear norms of the 2x2 full blocks only
    img = x.reshape(n, n, K)
    want = 0.0
    for i in range(n // 3):
        for j in range(n // 3):
            blk = img[3 * i : 3 * i + 3, 3 * j : 3 * j + 3].reshape(9, K)
            want += np.linalg.svd(blk, compute_uv=False).sum()
    np.testing.assert_allclose(got, 0.5 * want, rtol=2e-5)


def test_llr_value_randshift_matches_prox_partition(rng):
    """value() with randshift must measure the SAME shifted partition
    the prox thresholds: for a dividing shape, value(randshift=True)
    equals the brute-force nuclear norm over the shifted blocks."""
    n, K = 8, 3
    x = rng.normal(size=(n, n, K)).astype(np.float32).reshape(-1)
    reg = rt.LLRRegularization(
        1.0, shape=(n, n), block_size=(4, 4), randshift=True
    )
    got = float(reg.value(jnp.asarray(x)))
    key = jax.random.PRNGKey(reg.seed)
    shifts = [int(jax.random.randint(jax.random.fold_in(key, d), (), 0, 4))
              for d in range(2)]
    img = np.roll(x.reshape(n, n, K), shifts, axis=(0, 1))
    want = 0.0
    for i in range(2):
        for j in range(2):
            blk = img[4 * i : 4 * i + 4, 4 * j : 4 * j + 4].reshape(16, K)
            want += np.linalg.svd(blk, compute_uv=False).sum()
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_llr_overlapping(rng):
    n, K = 8, 4
    base = rng.normal(size=(n, n, 1)).astype(np.float32)
    coeff = rng.normal(size=(1, K)).astype(np.float32)
    clean = np.einsum("ijr,rk->ijk", base, coeff).reshape(-1)
    noisy = clean + 0.3 * rng.normal(size=clean.shape).astype(np.float32)
    reg = rt.LLRRegularization(
        0.4, shape=(n, n), block_size=(2, 2), randshift=False, fully_overlapping=True
    )
    _denoise_improves(reg, jnp.asarray(clean), jnp.asarray(noisy))


def test_positive_real_proj(rng):
    x = jnp.asarray(
        (rng.normal(size=(16,)) + 1j * rng.normal(size=(16,))).astype(np.complex64)
    )
    pos = rt.PositiveRegularization()
    p = pos.prox(x)
    assert float(jnp.min(jnp.real(p))) >= 0
    assert float(jnp.max(jnp.abs(jnp.imag(p)))) == 0
    assert float(pos.value(p)) == 0
    assert not np.isfinite(float(pos.value(x)))

    real = rt.RealRegularization()
    r = real.prox(x)
    assert float(jnp.max(jnp.abs(jnp.imag(r)))) == 0

    proj = rt.ProjectionRegularizationTerm(proj_func=lambda v: jnp.clip(v, -1, 1))
    xr = jnp.asarray(rng.normal(size=(16,)) * 3, jnp.float32)
    assert float(jnp.max(jnp.abs(proj.prox(xr)))) <= 1.0


def test_lambda_dtype_conversion(rng):
    """λ passed as python float/f64 must work on f32/c64 arrays
    (testProxMaps.jl:280-298)."""
    x32 = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    xc = x32.astype(jnp.complex64)
    for reg in [rt.L1Regularization(0.1), rt.L2Regularization(0.1)]:
        assert reg.prox(x32, 0.2).dtype == jnp.float32
        assert reg.prox(xc, np.float64(0.2)).dtype == jnp.complex64
