#!/bin/bash
# Round-4 second-stage sweep: runs AFTER sweep_retry finishes (waits on
# its done marker in the log). Measures the remat A/B (bwd recompute vs
# activation HBM), flagship compile time post decoder-scan, and the
# recipe dress rehearsal.
# Usage: bash tools/benchmarks/sweep_r4_extra.sh PRIOR_LOG [LOG]
set -u
cd "$(dirname "$0")/../.."
PRIOR=${1:-/tmp/sweep_retry_r4b.log}
LOG=${2:-/tmp/sweep_r4_extra.log}
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

echo "[extra] waiting for prior sweep to finish..." | tee -a "$LOG"
until grep -q "^\[retry\] done" "$PRIOR" 2>/dev/null; do sleep 120; done
echo "[extra] prior done at $(date)" | tee -a "$LOG"

run() {
  if ! probe; then
    echo "=== SKIP (tpu probe failed) $* ($(date +%H:%M:%S))" >> "$LOG"
    return
  fi
  echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"
  flock -w 3000 "$TPULOCK" timeout 2700 "$@" >> "$LOG" 2>&1 \
    || echo "[extra] step failed or lock-wait expired: $*" >> "$LOG"
  echo "=== exit $? ($(date +%H:%M:%S)) ===" >> "$LOG"
}

# 1. remat A/B: does dropping remat fit HBM, and what does it buy?
run python tools/benchmarks/train_step_bench.py --batch 2 --steps 5 \
  --donate --no-remat
# 2. SSOD step without remat (the north-star workload)
run python tools/benchmarks/train_step_bench.py --ssod --steps 5 --no-remat
# 3. flagship compile-time probe (decoder nn.scan landed this round)
run python tools/benchmarks/compile_time_probe.py
echo "[extra] done at $(date)" | tee -a "$LOG"
