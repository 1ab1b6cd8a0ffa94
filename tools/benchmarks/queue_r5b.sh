#!/bin/bash
# Round-5b chip queue — re-run of the round-5 campaign legs whose
# results were lost when the sandbox rebooted mid-queue (/tmp wiped:
# queue logs + jax compile cache gone). Ordered by value-per-minute
# under an uncertain chip window:
#   1. official bench.py at the landed defaults (BENCH_r05 signal +
#      warms the persistent cache for everything downstream)
#   2. fwd-MXU mode-2 A/B, encoder scale (the remaining perf lever)
#   3. mode-2 decoder scale
#   4. SSOD step under mode 2 (only meaningful if 2-3 win)
#   5. 100-step soak at landed defaults (stability acceptance bar)
#   6. stage-2 isolated step + attribution trace + summary
#   7. compile-time probe (warm vs cold table)
#   8. 600-step recipe rehearsal v2 (realistic pseudo-load generator)
set -u
cd "$(dirname "$0")/../.."
LOG=${1:-/tmp/queue_r5b.log}
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
    echo "[r5b] probe $tries failed at $(date)" | tee -a "$LOG"
    [ "$tries" -ge 30 ] && return 1
    sleep 300
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

K="python tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla"
B="python tools/benchmarks/train_step_bench.py --ssod"

# 1. official bench at landed defaults (SDT_TPU_LOCK_HELD: run()'s
#    flock already holds the TPU lock; bench.py must not re-acquire)
run env SDT_TPU_LOCK_HELD=1 python bench.py
# 2. mode-2 encoder-scale A/B vs same-session unpacked baseline
run $K --skip-parity
run env SDT_FWD_MXU=2 $K
# 3. mode-2 decoder scale
run env SDT_FWD_MXU=2 $K --decoder --skip-parity
# 4. SSOD step under mode 2
run env SDT_FWD_MXU=2 $B --steps 5
# 5. 100-step soak at landed defaults
run $B --steps 100
# 6. stage-2 isolated step + trace + summary
run $B --post-warmup --steps 5
run $B --post-warmup --steps 3 --profile /tmp/ssod_trace_stage2
echo "=== trace_summary stage2 ($(date +%H:%M:%S))" >> "$LOG"
JAX_PLATFORMS=cpu timeout 900 python tools/benchmarks/trace_summary.py \
  /tmp/ssod_trace_stage2 >> "$LOG" 2>&1
# 7. compile-time probe (cold numbers were lost with the cache; this
#    run is warm for the programs above, cold for the probe's shapes)
run python tools/benchmarks/compile_time_probe.py
# 8. rehearsal v2: 600 steps across the warm-up boundary, distractor
#    clutter generator so pseudo_per_img sits below the max_pseudo cap
waitup && {
  echo "=== rehearsal v2 ($(date +%H:%M:%S))" >> "$LOG"
  flock -w 3000 "$TPULOCK" timeout 7200 \
    python tools/recipe_rehearsal.py --steps 600 \
    --workdir /tmp/rehearsal_r5 >> "$LOG" 2>&1
  echo "=== rehearsal exit $? ($(date +%H:%M:%S)) ===" >> "$LOG"
}
echo "[r5b] done at $(date)" | tee -a "$LOG"
