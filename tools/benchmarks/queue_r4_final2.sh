#!/bin/bash
# Corrected round-4 final queue: the fwd-MXU mode-2 A/B needs
# --bf16-value (the packed-gather 38.7 ms baseline is bf16; mode 2
# falls back to mode 1 on f32 values). Patient probe, then:
#   1. mode-2 kernel A/B vs a same-session packed bf16 baseline
#   2. SSOD step under mode 2 (only if the kernel A/B wins)
#   3. fresh attribution trace at landed defaults
#   4. bench.py retries (crashed 3x today on the axon worker)
set -u
cd "$(dirname "$0")/../.."
LOG=${1:-/tmp/queue_r4_final2.log}
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

waitup() {
  local tries=0
  until probe; do
    tries=$((tries + 1))
    echo "[queue2] probe $tries failed at $(date)" | tee -a "$LOG"
    [ "$tries" -ge 24 ] && return 1
    sleep 600
  done
  return 0
}

run() {
  if ! probe; then
    echo "=== SKIP (tpu probe failed) $* ($(date +%H:%M:%S))" >> "$LOG"
    return 1
  fi
  echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"
  flock -w 3000 "$TPULOCK" timeout 2700 "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc ($(date +%H:%M:%S)) ===" >> "$LOG"
  return $rc
}

waitup || { echo "[queue2] giving up" | tee -a "$LOG"; exit 1; }

# same-session packed bf16 baseline + mode-2 A/B
run python tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla \
  --skip-parity --bf16-value
run env SDT_FWD_MXU=2 python tools/benchmarks/attn_kernel_bench.py \
  --iters 5 --skip-xla --bf16-value
# decoder sorted path under mode 2
run env SDT_FWD_MXU=2 python tools/benchmarks/attn_kernel_bench.py \
  --decoder --iters 5 --skip-xla --skip-parity --bf16-value
# whole SSOD step under mode 2
run env SDT_FWD_MXU=2 python tools/benchmarks/train_step_bench.py \
  --ssod --steps 5
# fresh attribution trace at landed defaults
run python tools/benchmarks/train_step_bench.py --ssod --steps 3 \
  --profile /tmp/ssod_trace_u6
# bench.py, up to 3 attempts (locks internally -> no wrapper flock)
for i in 1 2 3; do
  waitup || break
  echo "=== bench.py attempt $i ($(date +%H:%M:%S))" >> "$LOG"
  if timeout 6000 python bench.py >> "$LOG" 2>&1; then
    echo "[queue2] bench ok at $(date)" | tee -a "$LOG"
    break
  fi
  echo "[queue2] bench attempt $i failed" | tee -a "$LOG"
  sleep 300
done
echo "[queue2] done at $(date)" | tee -a "$LOG"
