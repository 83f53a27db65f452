"""Callbacks and convergence tracing
(reference docs/src/literate/howto/callbacks.jl + src/Callbacks.jl).

Two modes:
  * host callbacks via `solve_with_callbacks` — exact reference semantics
    (invoked at iteration 0 and after every step);
  * `solve_trace` — jit-friendly: a lax.scan stacks per-iteration solutions
    and metrics on device, no host round-trips.
"""

import jax.numpy as jnp
import numpy as np

import rls_tpu as rt

rng = np.random.default_rng(0)
A = jnp.asarray(rng.normal(size=(24, 12)).astype(np.float32))
x_true = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
b = A @ x_true

solver = rt.FISTA.create(A, reg=rt.L1Regularization(1e-5), iterations=20)

# --- host callbacks
conv = rt.StoreConvergenceCallback()
cmp = rt.CompareSolutionCallback(np.asarray(x_true), cmp=rt.nrmsd)
x = rt.solve_with_callbacks(solver, b, callbacks=[conv, cmp])
print("residuals:", [float(r) for r in conv.conv_meas["residual"][:5]], "...")
print("nrmsd trace:", [round(r, 4) for r in cmp.results[:5]], "...")

# --- on-device trace
x, (xs, metrics, active) = rt.solve_trace(solver, b)
print("traced solutions shape:", xs.shape)
print("final residual:", float(metrics["residual"][-1]))
