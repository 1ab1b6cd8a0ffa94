#!/bin/bash
# Round-5 chip chain: wait for queue_r5_bisect.sh (pid $1) to exit, then
# run the main campaign (mode-2 A/B, official bench, soak, trace, shape
# diagnosis), then the 600-step recipe rehearsal v2 (realistic
# pseudo-label load via the distractor generator).
set -u
cd "$(dirname "$0")/../.."
BISECT_PID=${1:-0}
LOG=/tmp/chain_r5.log
echo "[chain] waiting for bisect pid $BISECT_PID at $(date)" | tee -a "$LOG"
while [ "$BISECT_PID" -gt 0 ] && kill -0 "$BISECT_PID" 2>/dev/null; do
  sleep 60
done
echo "[chain] bisect done at $(date); starting main queue" | tee -a "$LOG"
bash tools/benchmarks/queue_r5_main.sh /tmp/queue_r5_main.log
echo "[chain] main queue done at $(date); rehearsal v2" | tee -a "$LOG"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
flock -w 3000 /tmp/sdt_tpu.lock timeout 7200 \
  python tools/recipe_rehearsal.py --steps 600 \
  --workdir /tmp/rehearsal_r5 >> "$LOG" 2>&1
echo "[chain] rehearsal exit $? at $(date)" | tee -a "$LOG"
