#!/bin/bash
# Final r5 artifact refresh at end-of-round HEAD (VERDICT r4 items 1+2):
# every driver-facing artifact regenerated in ONE session at a pinned
# HEAD, ending with an EXPLICIT check that the auto-commit actually
# landed — r4's queue swallowed its commit failure silently and the
# round shipped a stale mid-round census. One-job-at-a-time rule.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_final_r5.log
FROM=${1:-0}
HEAD_AT_LAUNCH=$(git rev-parse --short HEAD)
echo "=== queue launch at HEAD $HEAD_AT_LAUNCH ($(date -u +%H:%MZ)) ===" | tee -a "$LOG"
if ! git diff --quiet || ! git diff --cached --quiet; then
  echo "WARNING: working tree dirty at launch — census runs from the TREE" | tee -a "$LOG"
fi
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
run 2 ab_flagship 3600 python tools/ab_flagship.py 6
run 3 bench_cold 1800 python bench.py
run 4 bench 1200 python bench.py
run 5 jacobi_table 2400 python tools/jacobi_compile_table.py
run 6 tiled_ab_cold 3600 python tools/tiled_ab.py
run 7 tiled_ab_warm 1800 python tools/tiled_ab.py
run 8 bench_suite_cold 3000 python tools/bench_suite.py
run 9 bench_suite 1800 python tools/bench_suite.py
run 10 parity_suite 2400 python tools/parity_suite.py
run 11 tpu_suite_census 7200 python tools/tpu_suite_report.py
python tools/chip_summary.py "$LOG" CHIP_RESULTS_r05.md || true
git add -f CHIP_RESULTS_r05.md TPU_SUITE_r05.md PARITY_r05.json \
  AB_FLAGSHIP_r05.json .tpu_suite_r05_full.log 2>/dev/null
git commit -m "Final r5 chip artifacts at end-of-round HEAD $HEAD_AT_LAUNCH"
RC=$?
# --- EXPLICIT landing check (r4 failure mode: silent commit failure) ----
LANDED=$(git log --oneline -1)
echo "=== commit rc=$RC; HEAD now: $LANDED ===" | tee -a "$LOG"
if ! git log --oneline -1 | grep -q "Final r5 chip artifacts"; then
  echo "!!! ARTIFACT COMMIT DID NOT LAND — commit manually:" | tee -a "$LOG"
  git status --short | tee -a "$LOG"
  exit 1
fi
for f in CHIP_RESULTS_r05.md TPU_SUITE_r05.md PARITY_r05.json AB_FLAGSHIP_r05.json; do
  if git ls-files --error-unmatch "$f" >/dev/null 2>&1; then
    echo "tracked: $f" | tee -a "$LOG"
  else
    echo "!!! MISSING FROM COMMIT: $f" | tee -a "$LOG"
  fi
done
echo "final r5 queue complete — see $LOG"
