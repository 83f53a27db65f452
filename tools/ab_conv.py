"""A/B: single-channel 9x9 spatial conv (lax.conv) vs separable banded
matmul for the deblurring normal operator at 256^2, batch 64."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import rls_tpu as rt

N, BATCH, K = 256, 64, 9
rng = np.random.default_rng(0)
ax = np.arange(K) - K // 2
g = np.exp(-(ax**2) / (2 * 2.0**2))
kern = np.outer(g, g)
kern /= kern.sum()

op = rt.DirectConvOperator(kernel=jnp.asarray(kern, jnp.float32), im_shape=(N, N))
X = jnp.asarray(rng.normal(size=(BATCH, N * N)), jnp.float32)


def banded(n, taps):
    """(n, n) matrix for SAME zero-padded 1-D convolution with `taps`."""
    k = len(taps)
    m = np.zeros((n, n), np.float32)
    for i, t in enumerate(taps):
        off = i - k // 2
        d = np.diag(np.full(n - abs(off), t, np.float32), k=off)
        m += d
    return m


# kern = outer(g, g) / (Σg)², so the per-axis factor is g/Σg
Ah = jnp.asarray(banded(N, (g / g.sum()).astype(np.float32)))
Aw = Ah
Bh = Ah.T @ Ah  # normal-op banded factors (17-band)
Bw = Bh


def timeit(f, *args, reps=30):
    out = f(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


f_spatial = jax.jit(jax.vmap(op.normal))


@jax.jit
def f_matmul(x):
    imgs = x.reshape(BATCH, N, N)
    out = jnp.einsum("ij,bjk,kl->bil", Bh, imgs, Bw.T)
    return out.reshape(BATCH, N * N)


@jax.jit
def f_matmul_bf16(x):
    imgs = x.reshape(BATCH, N, N)
    out = jnp.einsum(
        "ij,bjk,kl->bil",
        Bh,
        imgs,
        Bw.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return out.reshape(BATCH, N * N)


# correctness check (interior agreement; boundary also exact since SAME
# zero-pad conv == banded matmul)
ref = np.asarray(f_spatial(X))
got = np.asarray(f_matmul(X))
err = np.abs(ref - got).max() / np.abs(ref).max()
print("max rel err matmul vs spatial:", err)

for name, f in [
    ("identity_calibration", jax.jit(lambda x: x + 1.0)),
    ("spatial_conv_normal", f_spatial),
    ("banded_matmul_normal", f_matmul),
    ("banded_matmul_bf16", f_matmul_bf16),
]:
    dt = timeit(f, X)
    print(f"{name:24s} {dt*1e3:8.2f} ms")
