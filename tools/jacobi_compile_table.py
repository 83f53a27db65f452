"""Measure Jacobi SVT compile+run time vs minor dimension on the chip
(VERDICT r2 item 9) and print a markdown table for docs/tpu.md.

Two sweep-loop variants are measured: the python-UNROLLED loop (~10
sweeps x (n-1) rotation rounds baked into the program — compile grows
with n) and the lax.SCAN-over-rounds loop (round body compiles once;
gather indices are scan inputs). The nuclear/LLR proxes auto-route to
Jacobi for n <= JACOBI_AUTO_GATE; this tool records the data that
justifies the gate and the unroll-vs-scan default. Run as the only chip
user:

    python tools/jacobi_compile_table.py
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    # NO persistent cache: this tool measures COLD compile time
    import jax.numpy as jnp
    import numpy as np

    from rls_tpu.ops.jacobi_svd import svt_jacobi

    rows = []
    for n in (16, 32, 64, 128):
        k = 8  # batch of blocks, LLR-style
        m = 2 * n  # tall blocks
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.normal(size=(k, m, n)).astype(np.float32))
        lam = 0.1

        timings = {}
        for label, unroll in (("unroll", True), ("scan", False)):
            fn = jax.jit(lambda x, u=unroll: svt_jacobi(x, lam, unroll=u))
            t0 = time.perf_counter()
            out = fn(a)
            np.asarray(out)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            reps = 10
            for _ in range(reps):
                out = fn(a)
            np.asarray(out)
            run_ms = (time.perf_counter() - t0) / reps * 1e3
            timings[label] = (compile_s, run_ms)
        # f64 accuracy reference (scan output; variants agree to ~1e-5)
        a64 = np.asarray(a, np.float64)
        want = np.zeros_like(a64)
        for j in range(k):
            u, s, vt = np.linalg.svd(a64[j], full_matrices=False)
            want[j] = (u * np.maximum(s - lam, 0.0)) @ vt
        err = float(
            np.linalg.norm(np.asarray(out, np.float64) - want)
            / np.linalg.norm(want)
        )
        rows.append((n, *timings["unroll"], *timings["scan"], err))
        print(
            f"n={n}: unroll compile {timings['unroll'][0]:.1f}s run "
            f"{timings['unroll'][1]:.1f}ms | scan compile "
            f"{timings['scan'][0]:.1f}s run {timings['scan'][1]:.1f}ms | "
            f"rel_err {err:.2e}",
            file=sys.stderr, flush=True,
        )

    print(
        "| minor dim n | unroll compile (s) | unroll run (ms) "
        "| scan compile (s) | scan run (ms) | rel err vs f64 |"
    )
    print("|---|---|---|---|---|---|")
    for n, cu, ru, cs, rs, e in rows:
        print(f"| {n} | {cu:.1f} | {ru:.1f} | {cs:.1f} | {rs:.1f} | {e:.1e} |")


if __name__ == "__main__":
    main()
