"""A/B microbenchmark: TV-FGP prox XLA-unrolled vs fused Pallas on the
real TPU chip. 256x256, batch 64, 10 dual iterations (the bench.py inner
configuration)."""

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

N, BATCH, IT = 256, 64, 10
rng = np.random.default_rng(0)
X = jnp.asarray(rng.normal(size=(BATCH, N * N)), jnp.float32)

reg_xla = rt.TVRegularization(5e-4, shape=(N, N), iterations_tv=IT, unroll=True)
reg_pl = rt.TVRegularization(
    5e-4, shape=(N, N), iterations_tv=IT, unroll=True, backend="pallas"
)


def timeit(f, *args, reps=20):
    out = f(*args)
    np.asarray(out)  # force full materialization (tunnel runtime: b_u_r lies)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    np.asarray(out)  # device queue serializes: waits for all reps' compute
    return (time.perf_counter() - t0) / reps


REPEAT = 20  # chain prox applications inside one dispatch to beat ~20ms
# of tunnel dispatch noise; per-prox time = (t - t_identity) / REPEAT


def _chain(g):
    def f(x):
        for _ in range(REPEAT):
            x = g(x)
        return x

    return jax.jit(f)


f_xla = _chain(jax.vmap(reg_xla.prox))
f_pl_vmap = _chain(jax.vmap(reg_pl.prox))


def _batched(x):
    from rls_tpu.kernels.tv_pallas import prox_tv2d_fgp_pallas

    return prox_tv2d_fgp_pallas(x, 5e-4, (N, N), IT)


f_pl_batched = _chain(_batched)


for name, f in [
    ("identity_calibration", jax.jit(lambda x: x + 1.0)),
    ("xla_unrolled_vmap", f_xla),
    ("pallas_vmap", f_pl_vmap),
    ("pallas_batched_grid", f_pl_batched),
]:
    try:
        dt = timeit(f, X)
        per = dt / (1 if name == "identity_calibration" else REPEAT)
        print(f"{name:24s} {dt*1e3:8.2f} ms/dispatch  {per*1e3:8.3f} ms/prox-batch")
    except Exception as e:
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}")
