#!/bin/bash
# Fused-encode fault diagnosis (round 5): the bisect pinned the
# BENCH_r04 worker fault to the fused sup+unsup encode, whose only
# structural novelty is running the encoder at N=5 (1 sup + 4 unsup in
# one pass). This chain asks WHERE N=5 starts faulting:
#   a. bare kernel at N=5, encoder scale        -> Mosaic kernel bug?
#   b. full supervised train step at bs5        -> any N=5 program?
#   c. (context) supervised bs5 with remat off  -> remat interplay?
# Clean a+b => the fault is specific to the fused-encode program
# composition (concat/slice + shared scan), not to N=5 itself.
set -u
cd "$(dirname "$0")/../.."
LOG=${1:-/tmp/diag_n5.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
TPULOCK=/tmp/sdt_tpu.lock

run() {
  echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"
  flock -w 7200 "$TPULOCK" timeout 1800 "$@" >> "$LOG" 2>&1
  echo "=== exit $? ($(date +%H:%M:%S)) ===" >> "$LOG"
}

run python tools/benchmarks/attn_kernel_bench.py --batch 5 --iters 5 \
  --skip-xla --skip-parity
run python tools/benchmarks/train_step_bench.py --batch 5 --steps 3
echo "[diag_n5] done at $(date)" | tee -a "$LOG"
