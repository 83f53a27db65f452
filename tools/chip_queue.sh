#!/bin/bash
# Run the full on-chip validation/bench backlog in order, one job at a
# time (the tunnel serves ONE client; concurrent chip jobs UNIMPLEMENTED-
# storm each other). Each step gets its own timeout and appends to
# /tmp/chip_queue.log; a dead tunnel fails fast on the probe.
#
# Usage: bash tools/chip_queue.sh [from_step]
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue.log
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
    echo "probe failed — tunnel still down; aborting" | tee -a "$LOG"
    exit 1
  fi
}
run 0 probe 120 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices())
print(np.asarray(jnp.ones((8,128)) @ jnp.ones((128,8))).sum())"
# A/B the tiled kernels (512^2 grid/fori/restart/POGM/ADMM; 1024^2 hbm).
# Two invocations: cold compiles can blow the first timeout, the
# persistent cache makes the second pass fast.
run 1 tiled_ab_cold 3000 python tools/tiled_ab.py
run 2 tiled_ab_warm 1800 python tools/tiled_ab.py
run 3 tpu_smoke 1800 python tools/tpu_smoke.py
run 4 ab_fgp_cold 3000 python tools/ab_fgp.py
run 5 ab_fgp_warm 1800 python tools/ab_fgp.py
run 6 bench_cold 1800 python bench.py
run 7 bench 1200 python bench.py
run 8 bench_suite_cold 3000 python tools/bench_suite.py
run 9 bench_suite 1800 python tools/bench_suite.py
run 10 parity_suite 1800 python tools/parity_suite.py
run 11 jacobi_table 3000 python tools/jacobi_compile_table.py
# full on-chip pytest suite + skip census (refreshes TPU_SUITE_r03.md
# with the session's new tests); runs last — it is the longest step
run 12 tpu_suite_census 7200 python tools/tpu_suite_report.py
# distill the log into a committed artifact so the chip evidence
# survives the round even if no one is at the keyboard
python tools/chip_summary.py "$LOG" CHIP_RESULTS_r04.md || true
git add CHIP_RESULTS_r04.md 2>/dev/null || true
git add TPU_SUITE_r04.md 2>/dev/null || true
git add PARITY_r04.json 2>/dev/null || true
git commit -q -m "Chip backlog results (auto-extracted from the queue log)" || true
echo "chip queue complete — see $LOG"
