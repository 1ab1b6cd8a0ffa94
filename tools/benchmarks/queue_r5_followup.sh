#!/bin/bash
# Round-5 follow-up chip queue — runs AFTER chain_r5.sh (pass its pid).
# Closes the remaining round-4 verdict items that need chip time:
#   #4  post-warm-up (stage-2) SSOD step attribution: step bench at
#       realistic pseudo-load is covered by rehearsal v2; here we take
#       the isolated stage-2 step number + a profiler trace so the
#       stage-2 cost can be attributed bucket-by-bucket like the
#       warm-up stage was in round 4.
#   #8  flagship compile time: warm-persistent-cache compile of the
#       SSOD warm-up program (the chain just paid the cold compiles —
#       its log carries the cold numbers), plus the depth-scaling
#       probe on chip.
set -u
cd "$(dirname "$0")/../.."
WAIT_PID=${1:-0}
LOG=${2:-/tmp/queue_r5_followup.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
TPULOCK=/tmp/sdt_tpu.lock

echo "[r5fu] waiting for pid $WAIT_PID at $(date)" | tee -a "$LOG"
while [ "$WAIT_PID" -gt 0 ] && kill -0 "$WAIT_PID" 2>/dev/null; do
  sleep 60
done
echo "[r5fu] predecessor done at $(date)" | tee -a "$LOG"

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
    echo "[r5fu] probe $tries failed at $(date)" | tee -a "$LOG"
    [ "$tries" -ge 18 ] && return 1
    sleep 600
  done
  return 0
}

run() {
  waitup || { echo "=== SKIP (tpu down) $* ($(date +%H:%M:%S))" >> "$LOG"; return 1; }
  echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"
  flock -w 3000 "$TPULOCK" timeout 2700 "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc ($(date +%H:%M:%S)) ===" >> "$LOG"
  return $rc
}

B="python tools/benchmarks/train_step_bench.py --ssod"

# 1. stage-2 (post-warm-up) isolated step at landed defaults
run $B --post-warmup --steps 5
# 2. stage-2 attribution trace
run $B --post-warmup --steps 3 --profile /tmp/ssod_trace_stage2
# 3. summarize the trace (CPU)
echo "=== trace_summary stage2 ($(date +%H:%M:%S))" >> "$LOG"
JAX_PLATFORMS=cpu timeout 900 python tools/benchmarks/trace_summary.py \
  /tmp/ssod_trace_stage2 >> "$LOG" 2>&1
# 4. warm-persistent-cache flagship compile (the chain paid the cold
#    compile for the same program; this measures the cache-hit path)
run $B --steps 2
# 5. compile-time depth-scaling probe on chip (cold, small shapes)
run python tools/benchmarks/compile_time_probe.py
echo "[r5fu] done at $(date)" | tee -a "$LOG"
