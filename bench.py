"""Benchmark: batched FISTA-TV 256² reconstruction throughput (problems/s).

North-star config from /root/repo/BASELINE.json: ≥100 problems/s batched
FISTA-TV 256² recon on a TPU v5e-8 matching reference residuals. This bench
runs on ONE chip, so `vs_baseline` is normalized against the single-chip
share of the target (100/8 = 12.5 problems/s per chip).

A "problem" = one 256×256 complex compressed-sensing reconstruction solved
with 50 FISTA iterations, each iteration = fused subsampled-FFT normal op +
TV-FGP prox (10 dual iterations).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import rls_tpu as rt
    from rls_tpu.models.solvers import solve_batched

    N = 256
    BATCH = 16
    ITERS = 50

    rng = np.random.default_rng(0)
    n2 = N * N
    idx = np.sort(rng.choice(n2, size=n2 // 3, replace=False))
    idx[0] = 0
    op = rt.SubsampledFFTOperator(
        sample_idx=jnp.asarray(idx, jnp.int32), im_shape=(N, N)
    )

    solver = rt.FISTA.create(
        op,
        reg=rt.TVRegularization(2e-3, shape=(N, N), iterations_tv=10),
        iterations=ITERS,
        rho=0.95,  # ‖AᴴA‖ = 1 for subsampled unitary FFT
        rel_tol=0.0,  # fixed-iteration throughput measurement
    )

    # piecewise-constant phantoms (TV-friendly), K problems as columns
    imgs = np.zeros((BATCH, N, N), np.float32)
    for k in range(BATCH):
        for _ in range(6):
            x0, y0 = rng.integers(0, N - 32, size=2)
            w, h = rng.integers(16, 64, size=2)
            imgs[k, x0 : x0 + w, y0 : y0 + h] += rng.normal()
    xs = jnp.asarray(imgs.reshape(BATCH, n2), jnp.complex64)
    B = jax.vmap(op.mv)(xs).T  # (m, BATCH)

    solve_fn = jax.jit(solve_batched)

    # warmup / compile
    out = solve_fn(solver, B)
    out.block_until_ready()

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = solve_fn(solver, B)
        out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    problems_per_s = BATCH / dt
    target_per_chip = 100.0 / 8.0  # v5e-8 target prorated to one chip
    print(
        json.dumps(
            {
                "metric": "fista_tv_256_batched_recon_throughput_1chip",
                "value": round(problems_per_s, 3),
                "unit": "problems/s",
                "vs_baseline": round(problems_per_s / target_per_chip, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
