#!/bin/bash
# Round-4 fourth stage: A/B the layer-scan unroll knob on chip, and
# re-profile the tiled-layout SSOD step for fresh attribution.
# Usage: bash tools/benchmarks/sweep_r4_unroll.sh [LOG]
set -u
cd "$(dirname "$0")/../.."
LOG=${1:-/tmp/sweep_r4_unroll.log}
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

run() {
  if ! probe; then
    echo "=== SKIP (tpu probe failed) $* ($(date +%H:%M:%S))" >> "$LOG"
    return
  fi
  echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"
  flock -w 3000 "$TPULOCK" timeout 2700 "$@" >> "$LOG" 2>&1 \
    || echo "[unroll] step failed or lock-wait expired: $*" >> "$LOG"
  echo "=== exit $? ($(date +%H:%M:%S)) ===" >> "$LOG"
}

# 1. supervised A/B first (cheapest compile): unroll=6 vs the landed 1
run python tools/benchmarks/train_step_bench.py --batch 2 --steps 5 \
  --donate --no-remat --unroll 6
# 2. headline: SSOD recipe step fully unrolled
run python tools/benchmarks/train_step_bench.py --ssod --steps 5 --unroll 6
# 3. fresh attribution trace of the tiled+packed SSOD step (unroll=1)
run python tools/benchmarks/train_step_bench.py --ssod --steps 3 \
  --profile /tmp/ssod_trace_tiled
echo "[unroll] done at $(date)" | tee -a "$LOG"
