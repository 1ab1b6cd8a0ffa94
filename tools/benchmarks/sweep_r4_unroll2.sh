#!/bin/bash
# Re-run the two unroll=6 A/B steps that were skipped when the tunnel
# was down (sweep_r4_unroll.sh steps 1-2). Adds an unroll=2 middle
# point for the SSOD step if the full unroll regresses compile.
# Usage: bash tools/benchmarks/sweep_r4_unroll2.sh [LOG]
set -u
cd "$(dirname "$0")/../.."
LOG=${1:-/tmp/sweep_r4_unroll2.log}
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
    || echo "[unroll2] step failed or lock-wait expired: $*" >> "$LOG"
  echo "=== exit $? ($(date +%H:%M:%S)) ===" >> "$LOG"
}

# 1. supervised A/B (cheapest compile): unroll=6 vs landed unroll=1
#    landed reference: 413 ms/step (donate+no-remat+packed, r4 tiled sweep)
run python tools/benchmarks/train_step_bench.py --batch 2 --steps 5 \
  --donate --no-remat --unroll 6
# 2. headline: SSOD recipe step fully unrolled
#    landed reference: 1574-1585 ms/step
run python tools/benchmarks/train_step_bench.py --ssod --steps 5 --unroll 6
echo "[unroll2] done at $(date)" | tee -a "$LOG"
