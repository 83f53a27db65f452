#!/bin/bash
# Priority-reordered chip backlog for a short wall-clock window:
# correctness smoke + driver-bench + parity first, long A/Bs and the
# full suite census last. Same one-job-at-a-time rule as chip_queue.sh.
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
run 1 tpu_smoke 2400 python tools/tpu_smoke.py
run 2 bench_cold 1800 python bench.py
run 3 bench 1200 python bench.py
run 4 parity_suite 1800 python tools/parity_suite.py
run 5 bench_suite_cold 3000 python tools/bench_suite.py
run 6 bench_suite 1800 python tools/bench_suite.py
run 7 tiled_ab_cold 3000 python tools/tiled_ab.py
run 8 tiled_ab_warm 1800 python tools/tiled_ab.py
run 9 ab_fgp 2400 python tools/ab_fgp.py
run 10 jacobi_table 3000 python tools/jacobi_compile_table.py
run 11 tpu_suite_census 7200 python tools/tpu_suite_report.py
python tools/chip_summary.py "$LOG" CHIP_RESULTS_r03.md \
  && git add CHIP_RESULTS_r03.md TPU_SUITE_r03.md 2>/dev/null \
  && git commit -q -m "Chip backlog results (auto-extracted from the queue log)" \
  || true
echo "chip queue complete — see $LOG"
