"""Op-level roofline attribution for the flagship fused FISTA-TV kernel
(VERDICT r3 item 3).

The flagship bench (256², batch 64, 50 FISTA iters × 10 FGP iters) runs at
~10% of the VPU f32 peak. This tool times ABLATED Pallas kernels at the
exact flagship shape to attribute the time between the three in-kernel
phases:

  * gram_only        — the compensated noconcat Gram sandwich (MXU)
  * fgp_only         — the TV-FGP dual loop (VPU stencils + clamps)
  * elementwise_only — the FISTA momentum/residual chain (VPU)
  * full             — the real fused solve (solve_pgm_tv_fused)
  * full_group2      — the same with TWO problems per grid step (fills
                       sublanes; the grouped kernel path)

Every variant uses the same timing protocol as bench.py (dispatch reps
back-to-back, materialize once, best + median of windows). Prints one
JSON line per variant; the sum gram+fgp+elementwise vs full exposes any
unattributed overhead (pipeline bubbles, prologue DMAs).

Usage: python tools/roofline_ablate.py            (flagship shape)
       python tools/roofline_ablate.py N BATCH    (custom)
"""

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _timed(fn, B, batch, reps=4, n_windows=8):
    out = fn(B)
    np.asarray(out)  # warm/compile
    windows = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(B)
        np.asarray(out)
        windows.append((time.perf_counter() - t0) / reps)
    best = min(windows)
    med = float(np.median(windows))
    return batch / best, batch / med, [round(batch / w, 1) for w in windows]


def main():
    import jax

    # the axon plugin overrides the JAX_PLATFORMS env var on this machine;
    # honor an explicit cpu request (CPU interpret-mode validation)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", f"{REPO}/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import rls_tpu as rt
    from rls_tpu.kernels._fgp_common import (
        make_gram_normal_noconcat,
        make_tv_fgp,
    )
    from rls_tpu.kernels.fista_tv_fused import (
        _vmem_limit_pgm_tv,
        solve_pgm_tv_fused,
    )

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    ITERS, TV_IT = 50, 10

    rng = np.random.default_rng(0)
    k = 9
    ax = np.arange(k) - k // 2
    g = np.exp(-(ax**2) / (2 * 2.0**2))
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(N, N))
    solver = rt.FISTA.create(
        op,
        reg=rt.TVRegularization(5e-4, shape=(N, N), iterations_tv=TV_IT,
                                unroll=True),
        iterations=ITERS, rho=0.95, rel_tol=0.0, track_residual=False,
    )
    imgs = rng.normal(size=(BATCH, N * N)).astype(np.float32)
    B = jax.vmap(op.mv)(jnp.asarray(imgs)).T

    lcat, rcat = op.cat["normal"]
    interpret = jax.default_backend() == "cpu"

    # ---- ablated kernels ---------------------------------------------------
    def _ablated_kernel(lcat_ref, rcat_ref, x0_ref, out_ref, *, phase):
        x0hat = x0_ref[0]
        H, W = x0hat.shape
        f32 = x0hat.dtype
        rho = jnp.asarray(0.95, f32)
        lam = jnp.asarray(5e-4, f32)
        lc = lcat_ref[...]
        rc = rcat_ref[...]
        l2 = jnp.concatenate([lc[:, :H], lc[:, 2 * H:]], axis=0)
        r2 = jnp.concatenate([rc[:W], rc[2 * W:]], axis=1)
        normal = make_gram_normal_noconcat(l2, lc[:, :H], r2, rc[:W], f32)
        _, fgp_n = make_tv_fgp(H, W, f32)

        def body(i, carry):
            x, m1 = carry
            if phase == "gram":
                res = normal(x) - x0hat
                return (x - rho * res, m1)
            if phase == "fgp":
                return (fgp_n(x, rho * lam, TV_IT), m1)
            # elementwise: the FISTA momentum/residual chain with the
            # normal op replaced by identity (keeps per-iter plane count)
            a = jnp.asarray(0.6, f32)
            x_mom = x + a * (x - m1)
            res = x_mom - x0hat
            return (x_mom - rho * res, x)

        x, _ = lax.fori_loop(0, ITERS, body, (x0hat * 0.0, x0hat * 0.0))
        out_ref[0] = x

    def make_ablated(phase):
        kern_fn = functools.partial(_ablated_kernel, phase=phase)
        H = W = N
        call = pl.pallas_call(
            kern_fn,
            grid=(BATCH,),
            in_specs=[
                pl.BlockSpec((H, 3 * H), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * W, W), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BATCH, H, W), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_limit_pgm_tv(H, W, "noconcat")
            ),
            interpret=interpret,
        )

        def run(Bm):
            bt = Bm.T
            x0 = jax.vmap(op.rmv)(bt).reshape(-1, N, N)
            return call(lcat, rcat, x0)

        return jax.jit(run)

    results = {}
    for phase in ("gram", "fgp", "elementwise"):
        fn = make_ablated(phase)
        best, med, windows = _timed(fn, B, BATCH)
        results[phase] = best
        print(json.dumps({
            "variant": f"{phase}_only", "problems_per_s_best": round(best, 1),
            "problems_per_s_median": round(med, 1), "windows": windows,
        }))

    # ---- full fused solve (per-problem and grouped) -------------------------
    full = jax.jit(lambda Bm: solve_pgm_tv_fused(solver, Bm))
    best, med, windows = _timed(full, B, BATCH)
    results["full"] = best
    print(json.dumps({
        "variant": "full", "problems_per_s_best": round(best, 1),
        "problems_per_s_median": round(med, 1), "windows": windows,
    }))

    from rls_tpu.kernels.fista_tv_fused import fista_tv_fused

    def full_grouped(Bm, group):
        bt = Bm.T
        x0 = jax.vmap(op.rmv)(bt).reshape(-1, N, N)
        out = fista_tv_fused(
            x0, lcat, rcat, solver.rho, 5e-4, ITERS, TV_IT,
            interpret=interpret, method="fista", gram="noconcat",
            group=group,
        )
        return out.reshape(out.shape[0], N * N).T

    for group in (2,):
        try:
            fn = jax.jit(functools.partial(full_grouped, group=group))
            best, med, windows = _timed(fn, B, BATCH)
            results[f"full_group{group}"] = best
            print(json.dumps({
                "variant": f"full_group{group}",
                "problems_per_s_best": round(best, 1),
                "problems_per_s_median": round(med, 1), "windows": windows,
            }))
        except Exception as e:  # VMEM gate or Mosaic reject: record, move on
            print(json.dumps({
                "variant": f"full_group{group}", "error": str(e)[:200],
            }))

    # ---- attribution summary ------------------------------------------------
    t = {k: 1.0 / v for k, v in results.items()}  # s/problem
    summed = t.get("gram", 0) + t.get("fgp", 0) + t.get("elementwise", 0)
    print(json.dumps({
        "variant": "attribution",
        "per_problem_ms": {k: round(v * 1e3, 3) for k, v in t.items()},
        "gram_plus_fgp_plus_elem_ms": round(summed * 1e3, 3),
        "unattributed_ms": round((t.get("full", 0) - summed) * 1e3, 3),
        "fgp_share_of_full": round(t.get("fgp", 0) / t["full"], 3)
        if "full" in t else None,
        "gram_share_of_full": round(t.get("gram", 0) / t["full"], 3)
        if "full" in t else None,
    }))


if __name__ == "__main__":
    main()
