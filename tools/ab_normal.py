"""A/B the separable-conv normal op at bench scale: uncompensated bf16 vs
3-matmul hi/lo compensation vs stacked single-matmul compensation."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import rls_tpu as rt
from rls_tpu._pytree import replace

N, BATCH, REPEAT = 256, 64, 20
rng = np.random.default_rng(0)
g = np.exp(-((np.arange(9) - 4) ** 2) / 8.0)
k2 = np.outer(g, g)
k2 /= k2.sum()
sep = rt.SeparableConvOperator.from_kernel(k2, im_shape=(N, N))
sep_raw = replace(sep, compensated=False)
X = jnp.asarray(rng.normal(size=(BATCH, N * N)), jnp.float32)


def np_hilo(m):
    m32 = np.ascontiguousarray(np.asarray(m, np.float32))
    hi = (m32.view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32)
    return hi, m32 - hi


Bh_hi, Bh_lo = np_hilo(sep.bh)
L_cat = jnp.asarray(np.hstack([Bh_hi, Bh_hi, Bh_lo]))  # (N, 3N)
Bw_hi, Bw_lo = np_hilo(np.asarray(sep.bw).T)
R_cat = jnp.asarray(np.vstack([Bw_hi, Bw_hi, Bw_lo]))  # (3N, N)


def split_bits(v):
    vi = lax.bitcast_convert_type(v, jnp.uint32)
    hi = lax.bitcast_convert_type(vi & jnp.uint32(0xFFFF0000), jnp.float32)
    return hi, v - hi


def normal_stacked(x):
    img = x.reshape(x.shape[:-1] + (N, N))
    xh, xl = split_bits(img)
    xcat = jnp.concatenate([xh, xl, xh], axis=-2)  # (3N, N)
    m = L_cat @ xcat
    mh, ml = split_bits(m)
    mcat = jnp.concatenate([mh, ml, mh], axis=-1)  # (N, 3N)
    return (mcat @ R_cat).reshape(x.shape)


def chain(g):
    def f(x):
        for _ in range(REPEAT):
            x = g(x)
        return x

    return jax.jit(f)


f_raw = chain(jax.vmap(sep_raw.normal))
f_comp = chain(jax.vmap(sep.normal))
f_stack = chain(jax.vmap(normal_stacked))

# accuracy single-application check vs f64
from scipy.signal import convolve2d as c2d

x0 = np.asarray(X[0]).reshape(N, N).astype(np.float64)
ref = c2d(c2d(x0, k2, mode="same"), np.flip(np.flip(k2, 0), 1), mode="same")
for name, fn in [("raw", sep_raw.normal), ("comp", sep.normal), ("stack", normal_stacked)]:
    got = np.asarray(jax.jit(fn)(X[0])).reshape(N, N)
    print(f"acc {name:6s}: {np.abs(got-ref).max()/np.abs(ref).max():.2e}")


def timeit(f, *a, reps=15):
    out = f(*a)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


t_id = timeit(jax.jit(lambda x: x + 1.0), X)
print(f"identity {t_id*1e3:.2f} ms")
for name, f in [("raw_bf16", f_raw), ("comp_3mm", f_comp), ("stacked_1mm", f_stack)]:
    dt = timeit(f, X)
    print(f"{name:12s} {(dt-t_id)/REPEAT*1e3:8.3f} ms/normal-batch")
