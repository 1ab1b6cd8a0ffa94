#!/bin/bash
# Round-4 final chip queue with a PATIENT probe: wait for the axon
# worker to come back (it crashed twice today), then run the remaining
# measurements in priority order:
#   1. bench.py (driver metric; warms the persistent cache incl. the
#      fused-encode program)
#   2. fwd-MXU mode-1 and mode-2 kernel A/Bs
#   3. SSOD step with the winning-looking MXU mode
#   4. fresh attribution trace at the landed defaults
# Usage: bash tools/benchmarks/queue_r4_final.sh [LOG]
set -u
cd "$(dirname "$0")/../.."
LOG=${1:-/tmp/queue_r4_final.log}
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

# wait up to ~6 h for the worker to come back, probing every 10 min
tries=0
until probe; do
  tries=$((tries + 1))
  echo "[queue] probe $tries failed at $(date)" | tee -a "$LOG"
  if [ "$tries" -ge 36 ]; then
    echo "[queue] giving up at $(date)" | tee -a "$LOG"
    exit 1
  fi
  sleep 600
done
echo "[queue] TPU alive at $(date)" | tee -a "$LOG"

run() {
  if ! probe; then
    echo "=== SKIP (tpu probe failed) $* ($(date +%H:%M:%S))" >> "$LOG"
    return
  fi
  echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"
  flock -w 3000 "$TPULOCK" timeout 2700 "$@" >> "$LOG" 2>&1 \
    || echo "[queue] step failed or lock-wait expired: $*" >> "$LOG"
  echo "=== exit $? ($(date +%H:%M:%S)) ===" >> "$LOG"
}

# 1. driver metric (bench.py locks internally -> no wrapper flock)
echo "=== python bench.py ($(date +%H:%M:%S))" >> "$LOG"
timeout 6000 python bench.py >> "$LOG" 2>&1
echo "=== exit $? ($(date +%H:%M:%S)) ===" >> "$LOG"
# 2. fwd-MXU kernel A/Bs (encoder scale; baseline packed fwd = 38.7 ms)
run env SDT_FWD_MXU=1 python \
  tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla
run env SDT_FWD_MXU=2 python \
  tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla --skip-parity
# 3. whole SSOD step under mode 2 (cheaper compile first? no - direct)
run env SDT_FWD_MXU=2 python \
  tools/benchmarks/train_step_bench.py --ssod --steps 5
# 4. fresh attribution trace at landed defaults
run python tools/benchmarks/train_step_bench.py --ssod --steps 3 \
  --profile /tmp/ssod_trace_u6
echo "[queue] done at $(date)" | tee -a "$LOG"
