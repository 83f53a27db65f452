"""Row-action solving with Kaczmarz and its randomized variants
(reference docs/src/literate/howto/efficient_kaczmarz.jl).

The reference optimizes row access by transposed storage + SIMD; on TPU the
row recurrence runs as a `lax.scan` over dynamically gathered rows, and
`time_solver` replaces BenchmarkTools.
"""

import jax
import jax.numpy as jnp
import numpy as np

import rls_tpu as rt

rng = np.random.default_rng(0)
A = jnp.asarray(rng.normal(size=(200, 64)).astype(np.float32))
x_true = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
b = A @ x_true

for kw in [
    {},  # cyclic
    {"shuffle_rows": True},
    {"randomized": True, "sub_matrix_fraction": 0.5},
    {"greedy_randomized": True},
]:
    solver = rt.Kaczmarz.create(A, reg=rt.L2Regularization(1e-6), iterations=20, **kw)
    stats = rt.time_solver(jax.jit(rt.solve), solver, b, reps=3)
    x = rt.solve(solver, b)
    err = float(jnp.linalg.norm(x - x_true) / jnp.linalg.norm(x_true))
    print(f"{kw or 'cyclic'}: rel_err={err:.2e} mean_time={stats['mean_s']*1e3:.1f} ms")

# vector-λ Tikhonov (standard-form transform, solution auto-rescaled)
lam_vec = jnp.asarray(rng.uniform(0.5, 2.0, size=(64,)), jnp.float32) * 1e-6
solver = rt.Kaczmarz.create(A, reg=rt.L2Regularization(lam_vec), iterations=20)
x = rt.solve(solver, b)
print("vector-λ rel. error:", float(jnp.linalg.norm(x - x_true) / jnp.linalg.norm(x_true)))

# streamed whole-solve Pallas fast path: A streamed from HBM in row blocks
# (no VMEM matrix limit), randomized order precomputed at construction so
# the sweep runs on restricted TPU runtimes too
solver = rt.Kaczmarz.create(
    A, reg=rt.L2Regularization(1e-6), iterations=20,
    randomized=True, sub_matrix_fraction=0.5, precompute_order=True,
)
X = rt.solve_kaczmarz_streamed(solver, b[:, None])
err = float(jnp.linalg.norm(X[:, 0] - x_true) / jnp.linalg.norm(x_true))
print(f"streamed randomized: rel_err={err:.2e}")

# sparse systems: PaddedCSROperator gives O(nnz_row) row actions (the
# reference's CSC dot_with_matrix_row / kaczmarz_update! fast paths) —
# a sweep costs O(m·k_max) instead of the dense O(m·n)
import numpy as np  # noqa: E402

A_np = np.asarray(A)
A_sp = A_np.copy()
A_sp[np.random.default_rng(0).uniform(size=A_sp.shape) < 0.7] = 0.0
b_sp = jnp.asarray(A_sp) @ x_true
solver = rt.Kaczmarz.create(
    rt.PaddedCSROperator.from_dense(A_sp), reg=rt.L2Regularization(1e-6),
    iterations=30,
)
x = rt.solve(solver, b_sp)
print("padded-CSR sparse rel_err:",
      float(jnp.linalg.norm(x - x_true) / jnp.linalg.norm(x_true)))

# ...and sparse storage rides the streamed fast path too: the driver
# densifies only the VISITED rows per sweep chunk (bounded HBM), the
# kernel sees identical row blocks
solver = rt.Kaczmarz.create(
    rt.PaddedCSROperator.from_dense(A_sp), reg=rt.L2Regularization(1e-6),
    iterations=30, randomized=True, sub_matrix_fraction=0.5,
    precompute_order=True,
)
Xs = rt.solve_kaczmarz_streamed(solver, b_sp[:, None])
print("padded-CSR streamed rel_err:",
      float(jnp.linalg.norm(Xs[:, 0] - x_true) / jnp.linalg.norm(x_true)))

# greedy-randomized mode (residual-driven e_k-thresholded sampling,
# reference Kaczmarz.jl:393-426) — the fused sweep kernel runs each
# S-step sweep as ONE Pallas call (2.1x the scan path on chip)
solver = rt.Kaczmarz.create(
    A, reg=rt.L2Regularization(1e-6), iterations=12,
    greedy_randomized=True, sub_matrix_fraction=0.25,
)
from rls_tpu.kernels import solve_kaczmarz_greedy  # noqa: E402

Xg = solve_kaczmarz_greedy(solver, b[:, None])
print("greedy fused rel_err:",
      float(jnp.linalg.norm(Xg[:, 0] - x_true) / jnp.linalg.norm(x_true)))
