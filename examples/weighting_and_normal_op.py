"""Weighted least squares and fused normal operators
(reference docs/src/literate/howto/weighting.jl + normal_operator.jl).

Weighted problem: argmin ½‖W(Ax − b)‖². Two equivalent routes:
  * ProdOperator(WeightingOperator(w), A) — weighted forward operator;
  * NormalOperator(A, weights=w²) — the fused AᴴW A normal operator passed
    directly as AHA (solvers then expect the back-projection AᴴWb).
"""

import jax
import jax.numpy as jnp
import numpy as np

import rls_tpu as rt

rng = np.random.default_rng(0)
A = jnp.asarray(rng.normal(size=(40, 16)).astype(np.float32))
x_true = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
b = A @ x_true
w = jnp.asarray(rng.uniform(0.5, 2.0, size=(40,)), jnp.float32)

# route 1: weighted operator
WA = rt.ProdOperator(rt.WeightingOperator(w), rt.DenseOperator(A))
s1 = rt.CGNR.create(WA, reg=rt.L2Regularization(1e-6), iterations=40)
x1 = rt.solve(s1, w * b)

# route 2: fused normal operator AᴴW²A (one fewer pass over the data)
AHA = rt.NormalOperator(rt.DenseOperator(A), weights=w**2)
s2 = rt.CGNR.create(AHA=AHA, reg=rt.L2Regularization(1e-6), iterations=40)
x2 = rt.solve(s2, rt.DenseOperator(A).rmv(w**2 * b))

print("route1 rel. error:", float(jnp.linalg.norm(x1 - x_true) / jnp.linalg.norm(x_true)))
print("route2 rel. error:", float(jnp.linalg.norm(x2 - x_true) / jnp.linalg.norm(x_true)))
print("routes agree:", bool(jnp.allclose(x1, x2, atol=1e-3)))
