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

# --- a genuinely LEARNED prior: tiny residual CNN, trained in-process ----
# (reference how-to plugs a pre-trained model the same way; any apply fn
# works — rls_tpu.denoisers is a self-contained pure-jnp DnCNN-style net)
from rls_tpu.models.denoisers import make_pnp_model, train_denoiser

n2 = 32
params = train_denoiser(n2, channels=6, steps=150, noise_sigma=0.08)
g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
kern = np.outer(g, g)
kern /= kern.sum()
op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(n2, n2))
img2 = np.zeros((n2, n2), np.float32)
img2[6:10, 4:20] = 0.7
img2[14:28, 10:22] = 0.4
x2_true = jnp.asarray(img2.reshape(-1))
b2 = op.mv(x2_true) + 0.02 * jnp.asarray(
    np.random.default_rng(1).normal(size=(n2 * n2,)), jnp.float32
)
pnp_cnn = rt.PnPRegularization(
    0.3, model=make_pnp_model(params), shape=(n2 * n2,),
    input_transform=IdentityTransform,
)
s_cnn = rt.ADMM.create(op, reg=pnp_cnn, iterations=25, iterations_cg=6,
                       rho=0.5)
x2 = jax.jit(rt.solve)(s_cnn, b2)
print("PnP-ADMM (trained CNN) rel. error:",
      float(jnp.linalg.norm(x2 - x2_true) / jnp.linalg.norm(x2_true)))
