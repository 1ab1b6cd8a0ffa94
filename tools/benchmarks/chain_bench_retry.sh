#!/bin/bash
# Wait for sweep_r4_pipeline.sh to finish, then retry bench.py (its
# first attempt died to a TPU-worker crash). Retries a few times with
# a probe between attempts.
set -u
cd "$(dirname "$0")/../.."
PRIOR=${1:-/tmp/sweep_r4_pipeline.log}
LOG=${2:-/tmp/bench_retry_r4.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
TPULOCK=/tmp/sdt_tpu.lock

until grep -q "^\[pipeline\] done" "$PRIOR" 2>/dev/null; do sleep 120; done
echo "[bench-retry] prior done at $(date)" | tee -a "$LOG"

for i in 1 2 3; do
  if ! flock -w 600 "$TPULOCK" timeout 400 python -c "
import jax
assert jax.devices()[0].platform == 'tpu'
import jax.numpy as jnp
float((jnp.ones((8,8))@jnp.ones((8,8))).sum())" >/dev/null 2>&1; then
    echo "[bench-retry] probe $i failed at $(date)" | tee -a "$LOG"
    sleep 600
    continue
  fi
  echo "=== bench.py attempt $i ($(date +%H:%M:%S))" >> "$LOG"
  if timeout 6000 python bench.py >> "$LOG" 2>&1; then
    echo "[bench-retry] success at $(date)" | tee -a "$LOG"
    break
  fi
  echo "[bench-retry] attempt $i failed" | tee -a "$LOG"
  sleep 300
done
echo "[bench-retry] done at $(date)" | tee -a "$LOG"
