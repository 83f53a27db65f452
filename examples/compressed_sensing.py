"""Compressed sensing — sparse image recovery from subsampled Fourier
measurements (reference docs/src/literate/examples/compressed_sensing.jl).

The operator is matrix-free: `SubsampledFFTOperator` fuses AᴴA into
FFT → mask → IFFT, the FISTA-TV hot loop is one jitted program.
"""

import jax
import jax.numpy as jnp
import numpy as np

import rls_tpu as rt

rng = np.random.default_rng(0)
N = 64

# piecewise-constant phantom
img = np.zeros((N, N), np.float32)
img[16:48, 16:48] = 1.0
img[24:40, 24:40] = 2.0
x_true = jnp.asarray(img.reshape(-1), jnp.complex64)

# random 40% Fourier sampling
n2 = N * N
idx = np.sort(rng.choice(n2, size=int(0.4 * n2), replace=False))
idx[0] = 0
op = rt.SubsampledFFTOperator(sample_idx=jnp.asarray(idx, jnp.int32), im_shape=(N, N))
b = op.mv(x_true)

# zero-filled reconstruction (baseline)
x_zf = op.rmv(b)
print("zero-filled rel. error:",
      float(jnp.linalg.norm(x_zf - x_true) / jnp.linalg.norm(x_true)))

# FISTA with TV prior
solver = rt.FISTA.create(
    op,
    reg=rt.TVRegularization(1e-2, shape=(N, N), iterations_tv=20),
    iterations=50,
    rho=0.95,  # ‖AᴴA‖ = 1 for a subsampled unitary FFT
)
x = jax.jit(rt.solve)(solver, b)
print("FISTA-TV rel. error:",
      float(jnp.linalg.norm(x - x_true) / jnp.linalg.norm(x_true)))
