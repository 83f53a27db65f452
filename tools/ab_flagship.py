"""Interleaved flagship A/B (VERDICT r4 item 1 + item 3).

Round-robins the fused FISTA-TV flagship variants WITHIN one chip
session — variant order rotates every round, so slow drift in the shared
tunnel's throughput hits every variant equally. This is the artifact that
separates session variance from real regressions: r4's driver capture
(319 p/s) vs its README claim (534 p/s) could not be reconciled because
no committed run ever timed the variants side by side.

Variants:
  * unroll_f32  — the r4 default (statically-unrolled λ-scaled FGP)
  * fori_f32    — the pre-r4 default (fori dual loop)
  * unroll_bf16 — unrolled + bf16-stored dual fields (the r4 roofline
                  ablation's named lever: dual VMEM traffic is the bound)
  * unroll_fold — r5: mask folded into the clamp bounds + shared exact
                  ×⅛ scale (~12% fewer VPU issue events; the r5 default)
  * unroll_pack — r5: fold + dual planes stacked along sublanes (clamp/
                  gradient/momentum issue once at double size)

Writes AB_FLAGSHIP_r05.json: per-variant raw windows per round, medians,
best, and cross-variant numerics deltas. Usage:
    python tools/ab_flagship.py [rounds]
"""

import json
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
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
REPS = 4

solver, B, xs_true = build_problem(N, BATCH, ITERS)
op = solver.AHA.A
reg = solver.reg
bt = jnp.asarray(B).T
x0hat_b = jax.vmap(solver.A.rmv)(bt).reshape(-1, N, N)
scale = jax.vmap(
    lambda b: normalization_factor(solver.normalize_reg, solver.A, b)
)(bt)
lam_eff = reg.get_lam() * scale
lcat, rcat = op.cat["normal"]
interp = jax.default_backend() == "cpu"

# the i4 interleave variant's working-set model (~18 MiB) exceeds the
# 16 MiB dispatch gate; raise it for the A/B only — the kernel passes
# its own explicit vmem_limit_bytes, and v5e has 128 MiB physical VMEM
os.environ.setdefault("RLS_TPU_VMEM_GATE_MIB", "24")

VARIANTS = [
    ("unroll_f32", dict(fgp_unroll=True, fgp_dual_bf16=False)),
    ("fori_f32", dict(fgp_unroll=False, fgp_dual_bf16=False)),
    # r5 issue-count-reduced unrolled variants (same strict-f32 math;
    # docs/tpu.md roofline: the bound is per-op issue/dependency latency)
    ("unroll_fold", dict(fgp_unroll=True, fgp_opt="fold")),
    ("unroll_pack", dict(fgp_unroll=True, fgp_opt="pack")),
    # r5 run-4 candidates: G INDEPENDENT per-problem chains interleaved
    # in program order (fold math per problem; the scheduler fills one
    # chain's dependency stalls with another's work) vs G plane-STACKED
    # problems (fold on (G·H, W) planes, λ/ρ as iota-select planes) —
    # the stacking form lost in r4 (448.9 vs 575.5 plain-unroll); the
    # interleaved form is new
    ("fold_i2", dict(fgp_unroll=True, fgp_opt="fold", interleave=2)),
    ("fold_i4", dict(fgp_unroll=True, fgp_opt="fold", interleave=4)),
    ("fold_g2", dict(fgp_unroll=True, fgp_opt="fold", group=2)),
]


def make_fn(cfg):
    kw = dict(gram="noconcat", group=1)
    kw.update(cfg)

    def f(x0):
        return fista_tv_fused(
            x0, lcat, rcat, solver.rho, lam_eff, ITERS, reg.iterations_tv,
            interpret=interp, method="fista", **kw,
        )

    return jax.jit(f)


fns = {}
outs = {}
failed = {}
for name, cfg in VARIANTS:
    try:
        f = make_fn(cfg)
        t0 = time.perf_counter()
        out = np.asarray(f(x0hat_b))  # compile + run 1
        print(f"{name}: compile+run1 {time.perf_counter()-t0:.1f}s",
              flush=True)
        assert np.isfinite(out).all()
        fns[name] = f
        outs[name] = out
    except Exception as e:  # noqa: BLE001 — record, keep A/B'ing the rest
        failed[name] = f"{type(e).__name__}: {str(e)[:300]}"
        print(f"{name}: FAILED {failed[name]}", flush=True)
VARIANTS = [(n, c) for n, c in VARIANTS if n in fns]

ref = outs["unroll_f32"]
deltas = {
    name: float(np.linalg.norm(o - ref) / np.linalg.norm(ref))
    for name, o in outs.items()
}

windows = {name: [] for name, _ in VARIANTS}
for rnd in range(ROUNDS):
    order = [VARIANTS[(i + rnd) % len(VARIANTS)][0]
             for i in range(len(VARIANTS))]
    for name in order:
        f = fns[name]
        t0 = time.perf_counter()
        for _ in range(REPS):
            o = f(x0hat_b)
        np.asarray(o)
        pps = BATCH / ((time.perf_counter() - t0) / REPS)
        windows[name].append(round(pps, 1))
    print(f"round {rnd}: " + "  ".join(
        f"{n}={windows[n][-1]:.0f}" for n in order), flush=True)

report = {
    "config": {"N": N, "batch": BATCH, "iters": ITERS,
               "tv_iters": int(reg.iterations_tv), "rounds": ROUNDS,
               "reps_per_window": REPS,
               "protocol": "variant order rotates each round; one window "
               "(REPS back-to-back dispatches, materialize once) per "
               "variant per round"},
    "variants": {},
    "failed": failed,
}
for name, _ in VARIANTS:
    w = windows[name]
    report["variants"][name] = {
        "windows_problems_per_s": w,
        "best": max(w),
        "median": float(np.median(w)),
        "rel_err_vs_unroll_f32": round(deltas[name], 8),
    }
print(json.dumps(report["variants"], indent=1))
out_path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "AB_FLAGSHIP_r05.json")
# APPEND to the committed artifact instead of overwriting it — earlier
# runs are cited by README/ROUND5_NOTES and must stay reproducible
# in-place. Schema: {config, runs: [{scheme, variants}, ...], ...}.
try:
    with open(out_path) as fh:
        merged = json.load(fh)
except (OSError, json.JSONDecodeError):
    merged = {"config": report["config"], "runs": []}
merged.setdefault("runs", []).append({
    "scheme": "ab_flagship rerun: " + ", ".join(n for n, _ in VARIANTS),
    "rounds": ROUNDS,
    "variants": report["variants"],
    "failed": failed,
})
with open(out_path, "w") as fh:
    json.dump(merged, fh, indent=1)
print(f"appended run {len(merged['runs'])} to {out_path}")
