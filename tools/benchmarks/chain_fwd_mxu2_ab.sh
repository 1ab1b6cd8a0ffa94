#!/bin/bash
# Wait for chain_fwd_mxu_ab.sh, then A/B fwd-MXU mode 2 (bf16 slab +
# bf16 C, one native MXU pass).
set -u
cd "$(dirname "$0")/../.."
PRIOR=${1:-/tmp/fwd_mxu_ab.log}
LOG=${2:-/tmp/fwd_mxu2_ab.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
TPULOCK=/tmp/sdt_tpu.lock

until grep -q "^\[mxu-ab\] done" "$PRIOR" 2>/dev/null; do sleep 120; done
echo "[mxu2-ab] prior done at $(date)" | tee -a "$LOG"

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
    || echo "[mxu2-ab] step failed or lock-wait expired: $*" >> "$LOG"
  echo "=== exit $? ($(date +%H:%M:%S)) ===" >> "$LOG"
}

run env SDT_FWD_MXU=2 python \
  tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla --skip-parity
run env SDT_FWD_MXU=2 python \
  tools/benchmarks/train_step_bench.py --ssod --steps 5
echo "[mxu2-ab] done at $(date)" | tee -a "$LOG"
