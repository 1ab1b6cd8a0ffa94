#!/bin/bash
# Round-4 third stage: measure the tile-order refactor (commit afafcfc)
# on chip. Waits for the extra stage to finish, then re-runs the step
# benches + the tracked bench.py metric with the new layout.
# Usage: bash tools/benchmarks/sweep_r4_tiled.sh PRIOR_LOG [LOG]
set -u
cd "$(dirname "$0")/../.."
PRIOR=${1:-/tmp/sweep_r4_extra.log}
LOG=${2:-/tmp/sweep_r4_tiled.log}
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

echo "[tiled] waiting for prior sweep to finish..." | tee -a "$LOG"
until grep -q "^\[extra\] done" "$PRIOR" 2>/dev/null; do sleep 120; done
echo "[tiled] prior done at $(date)" | tee -a "$LOG"

run() {
  if ! probe; then
    echo "=== SKIP (tpu probe failed) $* ($(date +%H:%M:%S))" >> "$LOG"
    return
  fi
  echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"
  flock -w 3000 "$TPULOCK" timeout 2700 "$@" >> "$LOG" 2>&1 \
    || echo "[tiled] step failed or lock-wait expired: $*" >> "$LOG"
  echo "=== exit $? ($(date +%H:%M:%S)) ===" >> "$LOG"
}

# 1. headline: SSOD recipe step with tile-order + packed gathers
run python tools/benchmarks/train_step_bench.py --ssod --steps 5
# 2. supervised flagship (donate + no-remat won the earlier A/Bs)
run python tools/benchmarks/train_step_bench.py --batch 2 --steps 5 \
  --donate --no-remat
# 3. tracked driver metric
echo "=== python bench.py ($(date +%H:%M:%S))" >> "$LOG"
timeout 6000 python bench.py >> "$LOG" 2>&1
echo "=== exit $? ($(date +%H:%M:%S)) ===" >> "$LOG"
# 4. serving throughput with the tiled layout
run python tools/benchmarks/train_step_bench.py --infer --batch 8 --steps 10
echo "[tiled] done at $(date)" | tee -a "$LOG"
