"""Decompose the bench FISTA iteration cost on chip: full vmapped step vs
normal-op only vs TV prox only vs elementwise rest."""

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

N, BATCH, REPEAT = 256, 64, 20
rng = np.random.default_rng(0)
k = 9
ax = np.arange(k) - k // 2
g = np.exp(-(ax**2) / (2 * 2.0**2))
kern = np.outer(g, g)
kern /= kern.sum()
op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(N, N))
reg = rt.TVRegularization(5e-4, shape=(N, N), iterations_tv=10, unroll=True,
                          backend="pallas")
solver = rt.FISTA.create(op, reg=reg, iterations=50, rho=0.95, rel_tol=0.0,
                         track_residual=False)

X = jnp.asarray(rng.normal(size=(BATCH, N * N)), jnp.float32)
B = jax.vmap(op.mv)(X).T
states = jax.vmap(solver.init)(B.T)


def chain_state(stepfn):
    def f(s):
        for _ in range(REPEAT):
            s = stepfn(s)
        return s

    return jax.jit(f)


def chain_x(g_):
    def f(x):
        for _ in range(REPEAT):
            x = g_(x)
        return x

    return jax.jit(f)


f_full = chain_state(jax.vmap(solver.step))
f_norm = chain_x(jax.vmap(op.normal))
lams = jnp.full((BATCH,), 5e-4, jnp.float32)
_prox_v = jax.vmap(reg.prox)


def _prox_once(x):
    return _prox_v(x, lams)


f_prox = chain_x(_prox_once)


def timeit(f, a, reps=15, leaf=None):
    out = f(a)
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(a)
    jax.tree_util.tree_map(np.asarray, out)
    return (time.perf_counter() - t0) / reps


t_id = timeit(jax.jit(lambda x: x + 1.0), X)
print(f"identity {t_id*1e3:.2f} ms")
for name, f, arg in [
    ("full_step", f_full, states),
    ("normal_only", f_norm, X),
    ("tv_prox_only", f_prox, X),
]:
    dt = timeit(f, arg)
    print(f"{name:14s} {(dt-t_id)/REPEAT*1e3:8.3f} ms/iter-batch")
