#!/bin/bash
# Round-5 P0: root-cause the BENCH_r04 TPU-worker kernel fault.
# BENCH_r04.json died 3/3 inside timed_steps at the landed r4 defaults
# (tiled_tokens=True, SDT_PACKED_GATHER=1, scan_unroll=6). This queue:
#   1-2. reproduce attempt: landed defaults, 10 timed steps, twice
#   3.   soak: landed defaults, 100 timed steps (flake-exoneration bar)
#   4-6. knock one suspect off at a time (packed gathers / unroll / tiles)
#   7.   r3-equivalent control (all three off)
# Every leg is its own child process (fresh TPU client), bounded, logged.
set -u
cd "$(dirname "$0")/../.."
LOG=${1:-/tmp/queue_r5_bisect.log}
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
    echo "[r5bisect] probe $tries failed at $(date)" | tee -a "$LOG"
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

# 1-2. reproduce at landed defaults (the exact bench.py configuration)
run $B --steps 10
run $B --steps 10
# 3. soak at landed defaults (the "default that can fault the chip"
#    acceptance bar: 100 consecutive steps clean)
run $B --steps 100
# 4-6. one suspect off at a time
run env SDT_PACKED_GATHER=0 $B --steps 10
run $B --steps 10 --unroll 1
run $B --steps 10 --no-tiled-tokens
# 7. r3-equivalent control
run env SDT_PACKED_GATHER=0 $B --steps 10 --unroll 1 --no-tiled-tokens
echo "[r5bisect] done at $(date)" | tee -a "$LOG"
