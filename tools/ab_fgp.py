"""A/B the fused FISTA-TV kernel variants on chip (flagship 256² config).

Variants: gram ∈ {noconcat (MXU compensated), stencil (VPU)} × FGP dual
loop ∈ {fori (θ recurrence in-kernel), unrolled (baked t2 constants +
λ-scaled duals)} × group ∈ {1, 2} (stencil only). Window-protocol timing
(best + spread), numerics cross-checked against the current default.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from bench import build_problem
from rls_tpu.kernels.fista_tv_fused import fista_tv_fused
from rls_tpu.models.regularization import normalization_factor

N, BATCH, ITERS = 256, 64, 50
solver, B, xs_true = build_problem(N, BATCH, ITERS)
op = solver.AHA.A
reg = solver.reg

bt = jnp.asarray(B).T
x0hat_b = jax.vmap(solver.A.rmv)(bt).reshape(-1, N, N)
scale = jax.vmap(lambda b: normalization_factor(solver.normalize_reg, solver.A, b))(bt)
lam_eff = reg.get_lam() * scale
lcat, rcat = op.cat["normal"]
taps = op.taps_hw()
dummy = jnp.zeros((1, 1), jnp.float32)
interp = jax.default_backend() == "cpu"

# cheapest-to-compile first (fori variants ride the committed cache);
# pass variant names as argv to run a subset — each cold compile is
# slow, so one-variant runs survive tunnel hiccups (results accumulate
# in the persistent compile cache either way)
VARIANTS = [
    ("noconcat_g1_fori", dict(gram="noconcat", group=1, fgp_unroll=False)),
    ("stencil_g2_fori", dict(gram="stencil", group=2, fgp_unroll=False)),
    ("noconcat_g1_unroll", dict(gram="noconcat", group=1, fgp_unroll=True)),
    ("stencil_g1_unroll", dict(gram="stencil", group=1, fgp_unroll=True)),
    ("stencil_g2_unroll", dict(gram="stencil", group=2, fgp_unroll=True)),
    ("noconcat_g2_unroll", dict(gram="noconcat", group=2, fgp_unroll=True)),
    # warm-started TV duals (accuracy refinement; expect ≈ cold timing —
    # vs_ref shows the trajectory delta, CPU-measured ~1e-4 at tv=10)
    ("noconcat_g1_warm", dict(gram="noconcat", group=1, fgp_unroll=True,
                              warm_tv=True)),
    # bf16-stored FGP duals (r4 roofline lever: dual VMEM traffic is the
    # bound; expect ~1.3e-4 vs_ref — CPU-measured trajectory delta)
    ("noconcat_g1_unroll_bf16", dict(gram="noconcat", group=1,
                                     fgp_unroll=True, fgp_dual_bf16=True)),
    ("noconcat_g1_fori_bf16", dict(gram="noconcat", group=1,
                                   fgp_unroll=False, fgp_dual_bf16=True)),
    ("stencil_g2_unroll_bf16", dict(gram="stencil", group=2,
                                    fgp_unroll=True, fgp_dual_bf16=True)),
]
if len(sys.argv) > 1:
    sel = set(sys.argv[1:])
    unknown = sel - {n for n, _ in VARIANTS}
    if unknown:
        raise SystemExit(f"unknown variants: {sorted(unknown)}")
    VARIANTS = [(n, c) for n, c in VARIANTS if n in sel]


def make_fn(cfg):
    gram = cfg["gram"]
    l_, r_ = (dummy, dummy) if gram == "stencil" else (lcat, rcat)
    tp = taps if gram == "stencil" else None

    def f(x0):
        return fista_tv_fused(
            x0, l_, r_, solver.rho, lam_eff, ITERS, reg.iterations_tv,
            interpret=interp, method="fista", gram=gram, taps=tp,
            group=cfg["group"], fgp_unroll=cfg["fgp_unroll"],
            warm_tv=cfg.get("warm_tv", False),
            fgp_dual_bf16=cfg.get("fgp_dual_bf16", False),
        )

    return jax.jit(f)


# cross-run numerics reference (first variant ever run writes it), keyed
# on the problem config so a stale ref from an earlier N/BATCH/ITERS or
# tv-iteration count can't masquerade as a kernel numerics regression
REF_PATH = f"/tmp/ab_fgp_ref_{N}x{BATCH}x{ITERS}x{reg.iterations_tv}.npy"
ref_out = np.load(REF_PATH) if os.path.exists(REF_PATH) else None
for name, cfg in VARIANTS:
    try:
        f = make_fn(cfg)
        t0 = time.perf_counter()
        out = np.asarray(f(x0hat_b))
        t_compile = time.perf_counter() - t0
        assert np.isfinite(out).all()
        if ref_out is None:
            ref_out = out
            np.save(REF_PATH, out)
            rel = 0.0
        else:
            rel = float(
                np.linalg.norm(out - ref_out) / np.linalg.norm(ref_out)
            )
        windows = []
        for _ in range(6):
            t0 = time.perf_counter()
            for _ in range(4):
                o = f(x0hat_b)
            np.asarray(o)
            windows.append(BATCH / ((time.perf_counter() - t0) / 4))
        ws = sorted(windows)
        print(
            f"{name:22s} best {max(windows):7.1f} p/s  "
            f"windows [{', '.join(f'{w:.0f}' for w in windows)}]  "
            f"vs_ref {rel:.2e}  compile+run1 {t_compile:.1f}s",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        print(f"{name:22s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
