#!/bin/bash
# Final r4 artifact refresh at end-of-round HEAD: the kernels changed
# after the mid-round full queue (unrolled FGP defaults, 4-term mm_both,
# x0-resident streamed tiles), so the driver-facing artifacts are
# regenerated. ab_fgp and the jacobi compile table are skipped — their
# evidence from the mid-round run (CHIP_RESULTS step log) measures
# explicit variants that did not change. Same one-job-at-a-time rule.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_final.log
FROM=${1:-0}
run() {
  local n=$1 name=$2 t=$3; shift 3
  [ "$n" -lt "$FROM" ] && return 0
  echo "=== [$n] $name ($(date -u +%H:%MZ)) ===" | tee -a "$LOG"
  timeout "$t" env PYTHONPATH=/root/.axon_site:${PYTHONPATH:-} JAX_PLATFORMS=axon \
    "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== [$n] $name exit=$rc ===" | tee -a "$LOG"
  if [ "$n" -eq 0 ] && [ "$rc" -ne 0 ]; then
    echo "probe failed — tunnel down; aborting" | tee -a "$LOG"
    exit 1
  fi
}
run 0 probe 120 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices())
print(np.asarray(jnp.ones((8,128)) @ jnp.ones((128,8))).sum())"
run 1 tpu_smoke 2400 python tools/tpu_smoke.py
run 2 bench_cold 1800 python bench.py
run 3 bench 1200 python bench.py
run 4 tiled_ab_cold 3600 python tools/tiled_ab.py
run 5 tiled_ab_warm 1800 python tools/tiled_ab.py
run 6 bench_suite_cold 3000 python tools/bench_suite.py
run 7 bench_suite 1800 python tools/bench_suite.py
run 8 parity_suite 1800 python tools/parity_suite.py
run 9 tpu_suite_census 7200 python tools/tpu_suite_report.py
python tools/chip_summary.py "$LOG" CHIP_RESULTS_r04.md || true
git add CHIP_RESULTS_r04.md 2>/dev/null || true
git add TPU_SUITE_r04.md 2>/dev/null || true
git add PARITY_r04.json 2>/dev/null || true
git add .tpu_suite_r04_full.log 2>/dev/null || true
git commit -q -m "Final r4 chip artifacts at end-of-round HEAD" || true
echo "final queue complete — see $LOG"
