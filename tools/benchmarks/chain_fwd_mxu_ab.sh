#!/bin/bash
# Wait for chain_bench_retry.sh, then A/B the forward one-hot-MXU
# variant (SDT_FWD_MXU=1) against the landed packed-gather fwd at
# encoder scale, plus the sorted decoder path.
set -u
cd "$(dirname "$0")/../.."
PRIOR=${1:-/tmp/bench_retry_r4.log}
LOG=${2:-/tmp/fwd_mxu_ab.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
TPULOCK=/tmp/sdt_tpu.lock

until grep -q "^\[bench-retry\] done" "$PRIOR" 2>/dev/null; do sleep 120; done
echo "[mxu-ab] prior done at $(date)" | tee -a "$LOG"

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
    || echo "[mxu-ab] step failed or lock-wait expired: $*" >> "$LOG"
  echo "=== exit $? ($(date +%H:%M:%S)) ===" >> "$LOG"
}

# baseline reference rows already measured: packed fwd 38.7 ms, bwd 64.7
# 1. MXU fwd at encoder scale (with parity check on first run)
run env SDT_FWD_MXU=1 python \
  tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla
# 2. MXU fwd on the decoder sorted path
run env SDT_FWD_MXU=1 python \
  tools/benchmarks/attn_kernel_bench.py --decoder --iters 5 --skip-xla
# 3. whole SSOD step with the MXU fwd
run env SDT_FWD_MXU=1 python \
  tools/benchmarks/train_step_bench.py --ssod --steps 5
echo "[mxu-ab] done at $(date)" | tee -a "$LOG"
