"""Getting started — solve argmin_x ½‖Ax − b‖² + λ‖x‖₁.

Python analog of the reference's getting_started example
(docs/src/literate/examples/getting_started.jl): build a solver with
`create_linear_solver`, call `solve`.
"""

import jax
import jax.numpy as jnp
import numpy as np

import rls_tpu as rt

rng = np.random.default_rng(0)
A = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
x_true = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
b = A @ x_true

# 1. the explicit class API
solver = rt.ADMM.create(A, reg=rt.L1Regularization(1e-4), iterations=50)
x = rt.solve(solver, b)
print("ADMM rel. error:", float(jnp.linalg.norm(x - x_true) / jnp.linalg.norm(x_true)))

# 2. the factory API with kwarg filtering (warns about unknown kwargs)
solver = rt.create_linear_solver(
    "FISTA", A, reg=rt.L1Regularization(1e-4), iterations=100
)
x = jax.jit(rt.solve)(solver, b)  # the whole solve is one jitted program
print("FISTA rel. error:", float(jnp.linalg.norm(x - x_true) / jnp.linalg.norm(x_true)))

# 3. which solvers can handle a given set of regularizers?
print("applicable:", [s.__name__ for s in rt.applicable_solver_list([rt.L1Regularization(0.1)])])
