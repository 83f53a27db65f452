#!/bin/bash
# Poll the axon tunnel; when a probe succeeds, run the full chip backlog
# (tools/chip_queue.sh) exactly once. Single chip client at a time: while
# this watcher is running, do NOT start other chip jobs by hand.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tunnel_watch.log
DEADLINE=$(( $(date +%s) + ${1:-36000} ))   # default: give up after 10h
echo "watch start $(date -u +%H:%MZ)" | tee -a "$LOG"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 120 env PYTHONPATH=/root/.axon_site:${PYTHONPATH:-} JAX_PLATFORMS=axon \
      python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices())
print(np.asarray(jnp.ones((8,128)) @ jnp.ones((128,8))).sum())" >> "$LOG" 2>&1
  then
    echo "tunnel UP at $(date -u +%H:%MZ) — running chip queue" | tee -a "$LOG"
    bash tools/chip_queue.sh 1   # skip step 0 (we just probed)
    echo "chip queue done at $(date -u +%H:%MZ)" | tee -a "$LOG"
    exit 0
  fi
  echo "tunnel still down at $(date -u +%H:%MZ); sleeping 300s" >> "$LOG"
  sleep 300
done
echo "watch gave up at $(date -u +%H:%MZ)" | tee -a "$LOG"
exit 2
