#!/bin/bash
# Round-5 main chip campaign, run after queue_r5_bisect.sh concluded
# (fused encode pinned as the BENCH_r04 crasher; default now OFF):
#   1-3. fwd-MXU mode-2 A/B (bf16 slab, ONE native MXU pass/window) vs
#        the packed-bf16 baseline, encoder + decoder scale — the queued
#        round-4 lever that never ran (Mosaic compile error, now fixed)
#   4.   SSOD step under mode 2 (only meaningful if 1-3 win)
#   5.   official bench.py at the new safe defaults (BENCH_r05 signal)
#   6.   100-step soak at new defaults (the "default that can fault the
#        chip" acceptance bar)
#   7.   fresh attribution trace at final defaults
set -u
cd "$(dirname "$0")/../.."
LOG=${1:-/tmp/queue_r5_main.log}
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
    echo "[r5main] probe $tries failed at $(date)" | tee -a "$LOG"
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

K="python tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla"
B="python tools/benchmarks/train_step_bench.py --ssod"

# 1. same-session packed-bf16 baseline (the 38.7 ms record config)
run $K --skip-parity --bf16-value
# 2. mode-2 encoder-scale A/B (parity on: first successful mode-2 run)
run env SDT_FWD_MXU=2 $K --bf16-value
# 3. mode-2 decoder-scale
run env SDT_FWD_MXU=2 $K --decoder --skip-parity --bf16-value
# 4. SSOD step under mode 2
run env SDT_FWD_MXU=2 $B --steps 5
# 5. official bench signal at the new safe defaults (ladder bounded)
run timeout 2700 python bench.py
# 6. 100-step soak at new defaults
run $B --steps 100
# 7. attribution trace at final defaults
run $B --steps 3 --profile /tmp/ssod_trace_r5
# 8-10. fused-fault shape diagnosis: is the trigger simply an odd
# encoder batch (N=5)? supervised bs5 isolates the encoder at N=5
# without any SSOD machinery; fused SSOD at 1+5 unsup runs the fused
# encode at N=6. If bs5 crashes and N=6 fused is clean, the fix is
# padding the fused batch to even N.
run python tools/benchmarks/train_step_bench.py --batch 5 --steps 3
run env SDT_FUSED_ENCODE=1 $B --batch 5 --steps 3
run env SDT_FUSED_ENCODE=1 $B --batch 3 --steps 3
echo "[r5main] done at $(date)" | tee -a "$LOG"
