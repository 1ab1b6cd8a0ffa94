#!/bin/bash
# Round-5 P0 v2: root-cause the BENCH_r04 TPU-worker kernel fault.
# Facts so far: the exact command `train_step_bench.py --ssod` succeeded
# at 3.44 img/s (sweep_r4_unroll2), then crashed 3/3 in BENCH_r04 and
# again in leg 1 of this queue (4/4 since) — always at the FIRST step's
# host sync. Two default-ON step changes landed between the last success
# and the first crash: the fused sup+unsup encode (5797249) and the
# empty-image fake center RoI (3690f12); the real TRAINER (uint8 input
# path) survived a 300-step rehearsal with both. Ladder:
#   1. fused encode OFF
#   2. fake RoI OFF
#   3. both OFF (pre-change control)
#   4. uint8 inputs (the surviving trainer's input path, all defaults on)
#   5. kernel knobs: packed gathers off / unroll 1 / untiled (in case
#      the fault is kernel-state dependent after all)
#   8. whichever ran clean -> 100-step soak at landed defaults if 1-5
#      all crash is impossible (something ran clean), so the soak leg
#      uses defaults and doubles as the flake test if leg order matters.
set -u
cd "$(dirname "$0")/../.."
LOG=${1:-/tmp/queue_r5_bisect2.log}
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
    echo "[r5bisect2] probe $tries failed at $(date)" | tee -a "$LOG"
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

# 1-3. the two post-measurement default-on changes
run env SDT_FUSED_ENCODE=0 $B --steps 5
run env SDT_FAKE_CONS_ROI=0 $B --steps 5
run env SDT_FUSED_ENCODE=0 SDT_FAKE_CONS_ROI=0 $B --steps 5
# 4. the trainer's input path (survived the 300-step rehearsal)
run $B --steps 5 --uint8-inputs
# 5-7. kernel knobs
run env SDT_PACKED_GATHER=0 $B --steps 5
run $B --steps 5 --unroll 1
run $B --steps 5 --no-tiled-tokens
# 8. landed defaults again (flake check after other programs ran)
run $B --steps 5
echo "[r5bisect2] done at $(date)" | tee -a "$LOG"
