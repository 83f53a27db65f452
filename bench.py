"""Benchmark: batched FISTA-TV 256² deblurring throughput (problems/s).

North-star config from /root/repo/BASELINE.json: ≥100 problems/s batched
FISTA-TV 256² recon on a TPU v5e-8 matching reference residuals. This bench
runs on ONE chip, so `vs_baseline` is normalized against the single-chip
share of the target (100/8 = 12.5 problems/s per chip).

A "problem" = one 256×256 real image deblurring (9×9 Gaussian PSF,
MXU-native separable banded-matmul convolution) solved with 50 FISTA
iterations, each iteration = conv normal op + TV-FGP prox (10 dual
iterations). The whole solve runs as ONE fused Pallas kernel
(rls_tpu/kernels/fista_tv_fused.py): all FISTA iterations VMEM-resident
per problem — HBM traffic is one read of AᴴB + the Gram factors and one
write of the solution. Verified against the composed
solve_batched_unrolled path on chip (~1e-3 over 50 iterations; the kernel
uses the f64-precomputed momentum table), and ~1.5× faster. The chip
shows ~2× run-to-run window variance; 290–570 problems/s measured.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_problem(N=256, BATCH=16, ITERS=50):
    import jax
    import jax.numpy as jnp

    import rls_tpu as rt

    rng = np.random.default_rng(0)

    # 9×9 Gaussian blur kernel
    k = 9
    ax = np.arange(k) - k // 2
    g = np.exp(-(ax**2) / (2 * 2.0**2))
    kern = np.outer(g, g)
    kern /= kern.sum()
    # MXU-native banded-matmul separable conv (bf16 hi/lo compensated):
    # ~5x faster normal-op than the single-channel spatial conv path
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(N, N))

    # ‖AᴴA‖ ≤ (Σ|k|)² = 1 for a normalized blur; use rho = 0.95
    solver = rt.FISTA.create(
        op,
        reg=rt.TVRegularization(
            5e-4, shape=(N, N), iterations_tv=10, unroll=True, backend="pallas"
        ),
        iterations=ITERS,
        rho=0.95,
        rel_tol=0.0,
        track_residual=False,  # fixed-iteration throughput: skip the unused reduction
    )

    # piecewise-constant phantoms (TV-friendly)
    imgs = np.zeros((BATCH, N, N), np.float32)
    for b in range(BATCH):
        for _ in range(6):
            x0, y0 = rng.integers(0, N - 32, size=2)
            w, h = rng.integers(16, 64, size=2)
            imgs[b, x0 : x0 + w, y0 : y0 + h] += rng.normal()
    xs = jnp.asarray(imgs.reshape(BATCH, N * N))
    B = jax.vmap(op.mv)(xs).T  # (n2, BATCH) blurred measurements
    return solver, B, xs


def main():
    import jax

    # persistent compilation cache: the unrolled 50-iteration batch-64
    # program takes minutes to compile cold but is fully cacheable
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from rls_tpu.kernels import solve_fista_tv_fused

    n_dev = len(jax.devices())
    N, BATCH, ITERS = 256, 64 * max(1, n_dev), 50
    solver, B, xs_true = build_problem(N, BATCH, ITERS)

    # solver is closed over (not a jit argument): the fused wrapper builds
    # its momentum table host-side from solver.theta, which must stay
    # concrete
    if n_dev > 1:
        # multi-chip: problems sharded over the batch axis, one fused
        # kernel per shard under shard_map — zero collectives
        from rls_tpu.parallel import make_mesh, solve_fista_tv_fused_sharded

        mesh = make_mesh(axis_names=("batch",))
        solve_fn = lambda B_: solve_fista_tv_fused_sharded(solver, B_, mesh)
    else:
        solve_fn = jax.jit(lambda B_: solve_fista_tv_fused(solver, B_))

    # warmup / compile
    out = solve_fn(B)
    res = np.asarray(out)  # force full materialization on host
    assert np.isfinite(res).all()

    # timing protocol (see .claude/skills/verify/SKILL.md): dispatch reps
    # back-to-back and materialize once — the device queue serializes, so
    # the final np.asarray waits for all compute; block_until_ready does
    # not reliably block through the tunneled runtime. Take the best of 5
    # windows of 4 reps to shed tunnel/scheduling noise.
    reps = 4
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = solve_fn(B)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    dt = best

    # sanity: reconstruction should beat the blurred input
    err = np.linalg.norm(res.T - np.asarray(xs_true)) / np.linalg.norm(
        np.asarray(xs_true)
    )

    problems_per_s = BATCH / dt
    target_per_chip = 100.0 / 8.0  # v5e-8 target prorated to one chip

    # ---- FLOP / MFU accounting (VERDICT r1 item 4) -----------------------
    # Executed FLOPs per problem inside the fused kernel:
    #  * MXU: the compensated Gram sandwich is two (N,3N)x(3N,N) matmuls
    #    per iteration -> 2 * 2*N*3N*N = 12 N^3 MACs... counted as
    #    2*(2*N*(3N)*N) flops.
    #  * VPU: TV-FGP dual loop ~27 elementwise ops per pixel per dual
    #    iteration (gradients, clamp, momentum) + ~10/pixel FISTA chain.
    mxu_flops = ITERS * 2 * (2 * N * (3 * N) * N)
    vpu_flops = ITERS * ((10 * 27 + 10) * N * N)  # iterations_tv = 10
    achieved_tflops = (mxu_flops + vpu_flops) * problems_per_s / 1e12
    # 197 TFLOP/s bf16 per v5e chip; problems_per_s counts ALL chips, so
    # normalize by n_dev. The kernel is VPU/latency-bound — MFU vs the MXU
    # peak is the honest "how far from speed-of-light"
    mfu = (mxu_flops * problems_per_s / 1e12) / (197.0 * n_dev)
    print(
        json.dumps(
            {
                "metric": "fista_tv_256_batched_deblur_throughput_1chip",
                "value": round(problems_per_s, 3),
                "unit": "problems/s",
                "vs_baseline": round(problems_per_s / target_per_chip, 3),
                "recon_rel_err": round(float(err), 4),
                "gflop_per_problem": round((mxu_flops + vpu_flops) / 1e9, 2),
                "achieved_tflops": round(achieved_tflops, 2),
                "mfu_vs_bf16_peak": round(mfu, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
