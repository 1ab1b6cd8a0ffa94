#!/bin/bash
# Wait for the unroll sweep to finish, then run the flagship recipe
# rehearsal (tools/recipe_rehearsal.py) on chip under the TPU lock.
# Usage: bash tools/benchmarks/chain_rehearsal.sh [PRIOR_LOG] [LOG]
set -u
cd "$(dirname "$0")/../.."
PRIOR=${1:-/tmp/sweep_r4_unroll.log}
LOG=${2:-/tmp/rehearsal_r4.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
TPULOCK=/tmp/sdt_tpu.lock

echo "[rehearsal] waiting for unroll sweep..." | tee -a "$LOG"
until grep -q "^\[unroll\] done" "$PRIOR" 2>/dev/null; do sleep 120; done
echo "[rehearsal] prior done at $(date)" | tee -a "$LOG"

if ! flock -w 600 "$TPULOCK" timeout 400 python -c "
import jax
assert jax.devices()[0].platform == 'tpu'
import jax.numpy as jnp
float((jnp.ones((8,8))@jnp.ones((8,8))).sum())" >/dev/null 2>&1; then
  echo "[rehearsal] SKIP: tpu probe failed at $(date)" | tee -a "$LOG"
  exit 1
fi

flock -w 3000 "$TPULOCK" timeout 9000 \
  python tools/recipe_rehearsal.py --steps 600 >> "$LOG" 2>&1 \
  || echo "[rehearsal] FAILED (see log)" >> "$LOG"
echo "[rehearsal] done at $(date)" | tee -a "$LOG"
