#!/bin/bash
# Round-4 fifth stage: measure the uint8+prefetch-put pipeline and the
# unroll=6 default end to end.
#   1. bench.py — canonical SSOD recipe number at the new defaults
#   2. recipe rehearsal (300 steps) — real-trainer throughput with the
#      4x-smaller batch transfer + worker-thread device_put
#   3. fresh profiler trace at unroll=6 — next-lever attribution
# Usage: bash tools/benchmarks/sweep_r4_pipeline.sh [LOG]
set -u
cd "$(dirname "$0")/../.."
LOG=${1:-/tmp/sweep_r4_pipeline.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
TPULOCK=/tmp/sdt_tpu.lock

probe() {
  flock -w 600 "$TPULOCK" timeout 400 python -c "
import jax
assert jax.devices()[0].platform == 'tpu'
import jax.numpy as jnp
float((jnp.ones((8,8))@jnp.ones((8,8))).sum())" >/dev/null 2>&1
}

run() {  # run TIMEOUT CMD...
  local t=$1; shift
  if ! probe; then
    echo "=== SKIP (tpu probe failed) $* ($(date +%H:%M:%S))" >> "$LOG"
    return
  fi
  echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"
  flock -w 3000 "$TPULOCK" timeout "$t" "$@" >> "$LOG" 2>&1 \
    || echo "[pipeline] step failed or lock-wait expired: $*" >> "$LOG"
  echo "=== exit $? ($(date +%H:%M:%S)) ===" >> "$LOG"
}

# 1. canonical bench — NO flock wrapper: bench.py takes the same lock
# internally (wrapping it deadlocks for its whole 3000 s bounded wait)
echo "=== python bench.py ($(date +%H:%M:%S))" >> "$LOG"
timeout 6000 python bench.py >> "$LOG" 2>&1
# 2. real-trainer rehearsal at the new pipeline defaults
run 6000 python tools/recipe_rehearsal.py --steps 300 --imgs 100 \
  --workdir /tmp/rehearsal_u8
# 3. fresh attribution trace (unroll=6 defaults)
run 2700 python tools/benchmarks/train_step_bench.py --ssod --steps 3 \
  --profile /tmp/ssod_trace_u6
echo "[pipeline] done at $(date)" | tee -a "$LOG"
