"""Sparse-view computed tomography
(reference docs/src/literate/examples/computed_tomography.jl).

Radon projections at few angles, reconstructed with CGNR (Tikhonov) and
FISTA-TV. The Radon adjoint (backprojection) is derived exactly via
`jax.linear_transpose`.
"""

import jax
import jax.numpy as jnp
import numpy as np

import rls_tpu as rt

N = 48
rng = np.random.default_rng(0)

# Shepp-Logan-ish phantom: a couple of ellipses
yy, xx = np.mgrid[0:N, 0:N]
cy, cx = (N - 1) / 2, (N - 1) / 2
img = ((((yy - cy) / (0.4 * N)) ** 2 + ((xx - cx) / (0.3 * N)) ** 2) <= 1).astype(
    np.float32
)
img -= 0.5 * (
    (((yy - cy) / (0.2 * N)) ** 2 + ((xx - cx - 4) / (0.12 * N)) ** 2) <= 1
).astype(np.float32)
x_true = jnp.asarray(img.reshape(-1))

angles = jnp.linspace(0, np.pi, 30, endpoint=False)
R = rt.RadonOperator(angles=angles, im_shape=(N, N))
b = R.mv(x_true) + 0.1 * jnp.asarray(rng.normal(size=(R.out_size,)), jnp.float32)

# CGNR with Tikhonov
cg = rt.CGNR.create(R, reg=rt.L2Regularization(1.0), iterations=20)
x_cg = jax.jit(rt.solve)(cg, b)
print("CGNR rel. error:", float(jnp.linalg.norm(x_cg - x_true) / jnp.linalg.norm(x_true)))

# FISTA with TV
fista = rt.FISTA.create(
    R,
    reg=rt.TVRegularization(1.0, shape=(N, N), iterations_tv=20),
    iterations=30,
)
x_tv = jax.jit(rt.solve)(fista, b)
print("FISTA-TV rel. error:", float(jnp.linalg.norm(x_tv - x_true) / jnp.linalg.norm(x_true)))
