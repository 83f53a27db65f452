"""The regularization system, explained — parameterized terms, projection
terms, and nested decorators (wavelet-domain soft-thresholding).

Python analog of the reference's regularization explanation
(docs/src/literate/explanations/regularization.jl): construct core terms,
invoke prox with an overriding λ, nest L1 around a wavelet transform, and
walk the nesting with `sink` / iteration.
"""

import jax.numpy as jnp
import numpy as np

import rls_tpu as rt

# --- parameterized terms: λ at construction, overridable per prox call -----
l2 = rt.L2Regularization(0.3)
print("prox_L2(1.0):", float(l2.prox(jnp.asarray([1.0]))[0]))  # 1/(1+2λ)
param = l2.lam  # retrieve λ, as `λ(reg)` does in the reference
print("prox_L2(1.0, λ*0.2):", float(l2.prox(jnp.asarray([1.0]), param * 0.2)[0]))

# --- projection terms: prox = projection onto a convex set -----------------
positive = rt.PositiveRegularization()
print("prox_+([2.0, -0.2]):", np.asarray(positive.prox(jnp.asarray([2.0, -0.2]))))

# --- nested terms: L1 soft-thresholding in the wavelet domain --------------
# (reference explanation nests L1Regularization around a WaveletOp)
N = 64
yy, xx = np.mgrid[0:N, 0:N]
image = ((xx - N / 2) ** 2 / 400 + (yy - N / 2) ** 2 / 200 < 1).astype(np.float32)
image += 0.5 * ((xx - N / 3) ** 2 + (yy - N / 3) ** 2 < 30)
x = jnp.asarray(image.reshape(-1))

wop = rt.WaveletOperator((N, N), wavelet="db2")
core = rt.L1Regularization(0.1)
reg = rt.TransformedRegularization(core, wop)

img_prox_image = core.prox(x)  # thresholds the pixels
img_prox_wavelet = reg.prox(x)  # thresholds the wavelet coefficients

# thresholding in the wavelet domain preserves the (piecewise-smooth) image
# far better than thresholding pixels at the same λ
err_img = float(jnp.linalg.norm(img_prox_image - x) / jnp.linalg.norm(x))
err_wav = float(jnp.linalg.norm(img_prox_wavelet - x) / jnp.linalg.norm(x))
print(f"rel. change, image-domain prox:   {err_img:.3f}")
print(f"rel. change, wavelet-domain prox: {err_wav:.3f}")
assert err_wav < err_img

# the wavelet coefficients really are sparse where the pixels are not
coeffs = wop.mv(x)
frac = float(jnp.mean(jnp.abs(coeffs) > 0.1))
print(f"fraction of wavelet coeffs > 0.1: {frac:.3f}")
assert frac < 0.2

# --- walking the nesting ---------------------------------------------------
# every nested term exposes its inner term; `sink` returns the core
assert reg.inner is core  # `innerreg` in the reference
assert rt.sink(reg) is core
for r in rt.reg_chain(reg):  # Base.iterate on the nesting in the reference
    print(type(r).__name__)
