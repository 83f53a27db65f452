"""On-chip A/B for the tiled FISTA-TV kernels.

Measures, on the real chip:
  * 512² VMEM-carry: grid-stepped vs fori-looped iteration axis
  * 1024² HBM-streamed (prefetched halo windows)

Prints one JSON line per variant with every timing window (the chip
shows ~2x window variance; see .claude/skills/verify/SKILL.md).
Usage: python tools/tiled_ab.py [--sizes 512,1024]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(N, batch, rng):
    import jax
    import jax.numpy as jnp

    import rls_tpu as rt

    k = 9
    ax = np.arange(k) - k // 2
    g = np.exp(-(ax**2) / (2 * 2.0**2))
    kern = np.outer(g, g)
    kern /= kern.sum()
    op = rt.SeparableConvOperator.from_kernel(kern, im_shape=(N, N))
    s = rt.FISTA.create(
        op,
        reg=rt.TVRegularization(5e-4, shape=(N, N), iterations_tv=10,
                                unroll=True),
        iterations=50, rho=0.95, rel_tol=0.0, track_residual=False,
    )
    imgs = np.zeros((batch, N, N), np.float32)
    for bb in range(batch):
        for _ in range(6):
            i0, j0 = rng.integers(0, N - 64, size=2)
            w, h = rng.integers(16, N // 4, size=2)
            imgs[bb, i0:i0 + w, j0:j0 + h] += rng.normal()
    xs = jnp.asarray(imgs.reshape(batch, N * N))
    B = jax.vmap(op.mv)(xs).T
    return s, B, xs


def bench(tag, fn, B, batch, reps=2, n_windows=5):
    out = fn(B)
    ref = np.asarray(out)  # warmup/compile + materialize
    windows = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(B)
        np.asarray(out)
        windows.append(batch * reps / (time.perf_counter() - t0))
    print(json.dumps({
        "variant": tag,
        "problems_per_s_best": round(max(windows), 2),
        "windows": [round(w, 2) for w in windows],
    }), flush=True)
    return ref


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from rls_tpu.kernels import solve_fista_tv_tiled

    sizes = [512, 1024]
    for a in sys.argv[1:]:
        if a.startswith("--sizes"):
            sizes = [int(x) for x in a.split("=")[1].split(",")]
    rng = np.random.default_rng(0)

    if 512 in sizes:
        import jax as _j

        import rls_tpu as rt

        s, B, _ = build(512, 16, rng)
        f_grid = _j.jit(lambda B_: solve_fista_tv_tiled(s, B_, mode="vmem"))
        f_fori = _j.jit(
            lambda B_: solve_fista_tv_tiled(s, B_, mode="vmem",
                                            iter_loop="fori")
        )
        r1 = bench("512_vmem_grid", f_grid, B, 16)
        r2 = bench("512_vmem_fori", f_fori, B, 16)
        d = float(np.abs(r1 - r2).max())
        print(json.dumps({"check": "512_grid_vs_fori_max_abs_diff",
                          "value": d}), flush=True)

        # dynamic schedules on real Mosaic (compile + run; the semantics
        # are CPU-proven in tests/test_kernels.py)
        sr = rt.FISTA.create(
            s.AHA.A, reg=s.reg, iterations=50, rho=0.95, rel_tol=0.0,
            track_residual=False, restart="gradient",
        )
        fr_grid = _j.jit(lambda B_: solve_fista_tv_tiled(sr, B_, mode="vmem"))
        fr_fori = _j.jit(
            lambda B_: solve_fista_tv_tiled(sr, B_, mode="vmem",
                                            iter_loop="fori")
        )
        g1 = bench("512_vmem_restart_grid", fr_grid, B, 16)
        g2 = bench("512_vmem_restart_fori", fr_fori, B, 16)
        print(json.dumps({
            "check": "512_restart_grid_vs_fori_max_abs_diff",
            "value": float(np.abs(g1 - g2).max()),
            "restart_changes_result": float(np.abs(g1 - r1).max()),
        }), flush=True)
        sp = rt.create_linear_solver(
            "POGM", s.AHA.A, reg=s.reg, iterations=50, rho=0.95,
            restart="gradient", sigma_fac=0.95, kwarg_warning=False,
        )
        fp = _j.jit(lambda B_: solve_fista_tv_tiled(sp, B_, mode="vmem"))
        p1 = bench("512_vmem_pogm_restart", fp, B, 16)
        assert np.isfinite(p1).all()

        # tiled ADMM-TV (tiled in-kernel CG matvec + tiled FGP z-update),
        # on the SAME problem batch as the FISTA benches above
        from rls_tpu.kernels import solve_admm_tv_tiled

        sa = rt.ADMM.create(
            s.AHA.A,
            reg=rt.TVRegularization(5e-4, shape=(512, 512),
                                    iterations_tv=10, unroll=True),
            iterations=10, iterations_cg=5, unroll_cg=True, rho=0.1,
        )
        fa = _j.jit(lambda B_: solve_admm_tv_tiled(sa, B_))
        a1 = bench("512_admm_tiled", fa, B, 16)
        assert np.isfinite(a1).all()

    if 1024 in sizes:
        s, B, _ = build(1024, 8, rng)
        import jax as _j
        f_hbm = _j.jit(lambda B_: solve_fista_tv_tiled(s, B_, mode="hbm"))
        r_def = bench("1024_hbm_prefetch", f_hbm, B, 8)
        # larger streamed tiles (VERDICT r3 item 4): the default 14 MiB
        # picker lands TR=128 → 37% halo recompute + 8 tile boundaries
        # per iteration; explicit vmem_limit_bytes makes TR=256/512
        # compilable (19-plane models ~24/42 MiB, far under the 128 MiB
        # physical VMEM). Equivalence asserted against the default tile.
        for tr in (256, 512):
            f_big = _j.jit(lambda B_, tr=tr: solve_fista_tv_tiled(
                s, B_, mode="hbm", tile_rows=tr))
            r_big = bench(f"1024_hbm_tr{tr}", f_big, B, 8)
            print(json.dumps({
                "check": f"1024_tr{tr}_vs_default_max_abs_diff",
                "value": float(np.abs(r_big - r_def).max()),
            }), flush=True)


if __name__ == "__main__":
    main()
