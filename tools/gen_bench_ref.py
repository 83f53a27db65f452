"""Generate the f64 reference solutions for bench.py's parity field.

bench.py's JSON line must witness the BASELINE "residual match to 1e-4"
metric (VERDICT r2 item 4), but x64 is a process-global switch that can't
coexist with the chip's f32 runtime. This tool runs the SAME seeded
flagship problem (bench.build_problem) through the composed
`solve_batched_unrolled` path on CPU with x64 enabled and f64-built
operators — reference semantics at reference precision — and stores the
first N_REF solution columns in bench_ref_f64.npz (committed; ~1 MB).
bench.py loads it and reports `parity_max_rel_err` = max column-wise
‖x_chip − x_64‖/‖x_64‖ over those problems.

Regenerate whenever build_problem changes:
    python tools/gen_bench_ref.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

N_REF = 4  # columns of the batch to store


def main():
    import jax
    import numpy as np

    # the env prefix is NOT enough on this machine — the TPU plugin
    # overrides JAX_PLATFORMS; pin the platform via config
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", f"{REPO}/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    import rls_tpu as rt
    from rls_tpu.models.solvers import solve_batched_unrolled

    import bench

    # rebuild the flagship problem in f64 with identical seeded data
    solver32, B32, xs_true = bench.build_problem(N=256, BATCH=64, ITERS=50)
    N = 256
    k = 9
    ax = np.arange(k) - k // 2
    g = np.exp(-(ax**2) / (2 * 2.0**2))
    kern = np.outer(g, g)
    kern /= kern.sum()
    op64 = rt.SeparableConvOperator.from_kernel(
        kern, im_shape=(N, N), dtype=jnp.float64, compensated=False
    )
    solver64 = rt.FISTA.create(
        op64,
        reg=rt.TVRegularization(
            5e-4, shape=(N, N), iterations_tv=10, unroll=True
        ),
        iterations=50,
        rho=0.95,
        rel_tol=0.0,
        track_residual=False,
    )
    B64 = jnp.asarray(np.asarray(B32, np.float64))[:, :N_REF]
    X64 = np.asarray(jax.jit(solve_batched_unrolled)(solver64, B64))
    # f64 data-residual norms ‖A x64 − b‖ for the residual-match metric
    r64 = np.asarray(
        [
            float(jnp.linalg.norm(op64.mv(jnp.asarray(X64[:, j])) - B64[:, j]))
            for j in range(N_REF)
        ]
    )
    out = os.path.join(REPO, "bench_ref_f64.npz")
    np.savez_compressed(
        out,
        x64=X64.astype(np.float32),
        b64=np.asarray(B64),
        r64=r64,
        n_ref=N_REF,
    )
    print("wrote", out, X64.shape, r64, file=sys.stderr)


if __name__ == "__main__":
    main()
