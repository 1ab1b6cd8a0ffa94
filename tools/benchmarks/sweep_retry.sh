#!/bin/bash
# Re-run the sweep steps a prior sweep_priority/sweep_on_chip run SKIPped
# ("tpu probe failed" — dead tunnel or a starved probe). Waits for the
# TPU to answer first, then replays each skipped command with the same
# flock/timeout discipline.
# Usage: bash tools/benchmarks/sweep_retry.sh PRIOR_LOG [RETRY_LOG]
set -u
cd "$(dirname "$0")/../.."
LOG_IN=${1:?prior sweep log}
LOG=${2:-/tmp/sweep_retry.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
TPULOCK=/tmp/sdt_tpu.lock

# 400s probe budget: the axon tunnel has been observed taking ~150s for
# the FIRST dispatch of a fresh process even when perfectly healthy
# (r4: 8x8 matmul = 147s). A 60-90s probe misreads that as a dead
# tunnel and skips runnable steps.
probe() {
  flock -w 600 "$TPULOCK" timeout 400 python -c "
import jax
assert jax.devices()[0].platform == 'tpu'
import jax.numpy as jnp
float((jnp.ones((8,8))@jnp.ones((8,8))).sum())" >/dev/null 2>&1
}

echo "[retry] waiting for TPU..." | tee -a "$LOG"
until probe; do sleep 180; done
echo "[retry] TPU alive at $(date)" | tee -a "$LOG"

run() {
  if ! probe; then
    echo "=== SKIP (tpu probe failed) $* ($(date +%H:%M:%S))" >> "$LOG"
    return
  fi
  echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"
  flock -w 3000 "$TPULOCK" timeout 2700 "$@" >> "$LOG" 2>&1 \
    || echo "[retry] step failed or lock-wait expired: $*" >> "$LOG"
  echo "=== exit $? ($(date +%H:%M:%S)) ===" >> "$LOG"
}

# replay every skipped command, preserving order and de-duplicating
grep '^=== SKIP (tpu probe failed) ' "$LOG_IN" \
  | sed -e 's/^=== SKIP (tpu probe failed) //' -e 's/ ([0-9:]*)$//' \
  | awk '!seen[$0]++' \
  | while read -r cmd; do
      # the skipped commands contain no quoted args; word splitting is safe
      run $cmd
    done
echo "[retry] done at $(date)" | tee -a "$LOG"
