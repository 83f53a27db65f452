"""Plug-and-play priors: a learned denoiser as the proximal map
(reference docs/src/literate/howto/plug-and-play.jl).

Any callable array→array works as the model — here a tiny hand-rolled
smoother stands in for a trained network; a flax/haiku `apply` closure
drops in identically.
"""

import jax
import jax.numpy as jnp
import numpy as np

import rls_tpu as rt
from rls_tpu.models.regularization import IdentityTransform

rng = np.random.default_rng(0)
N = 16

img = np.zeros((N, N), np.float32)
img[4:12, 4:12] = 1.0
x_true = jnp.asarray(img.reshape(-1))

A = jnp.asarray(rng.normal(size=(3 * N * N // 2, N * N)).astype(np.float32)) / N
b = A @ x_true


def denoiser(x):
    """Toy 'model': local averaging (stand-in for a trained CNN)."""
    im = x.reshape(N, N)
    sm = (
        im
        + jnp.roll(im, 1, 0)
        + jnp.roll(im, -1, 0)
        + jnp.roll(im, 1, 1)
        + jnp.roll(im, -1, 1)
    ) / 5.0
    return sm.reshape(x.shape)


pnp = rt.PnPRegularization(
    0.3, model=denoiser, shape=(N * N,), input_transform=IdentityTransform
)
solver = rt.ADMM.create(A, reg=pnp, iterations=30, rho=0.1)
x = jax.jit(rt.solve)(solver, b)
print("PnP-ADMM rel. error:",
      float(jnp.linalg.norm(x - x_true) / jnp.linalg.norm(x_true)))
