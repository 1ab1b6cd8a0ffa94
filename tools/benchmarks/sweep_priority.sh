#!/bin/bash
# Round-3 prioritized on-chip sweep: headline numbers FIRST so a tunnel
# death mid-sweep still leaves the tracked series with real TPU points.
# Cache dir matches bench.py's default so the driver's end-of-round
# bench.py run hits a warm persistent cache.
# Usage: bash tools/benchmarks/sweep_priority.sh [logfile]
set -u
cd "$(dirname "$0")/../.."
LOG=${1:-/tmp/sweep_priority.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
TPULOCK=/tmp/sdt_tpu.lock

# Cheap TPU-alive probe (bounded lock wait + bounded python): a dead
# tunnel should skip a step in ~2 min, not hang it for 2700 s or let it
# silently fall back to CPU and pollute the A/B timings.
# 400s probe budget: a healthy tunnel has been observed taking ~150s
# for the first dispatch of a fresh process (r4).
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
  # -w bounds the lock wait (a wedged external holder skips the step
  # instead of stalling the sweep); the 2700s timeout starts after.
  flock -w 3000 "$TPULOCK" timeout 2700 "$@" >> "$LOG" 2>&1 \
    || echo "[sweep] step failed or lock-wait expired: $*" >> "$LOG"
  echo "=== exit $? ($(date +%H:%M:%S)) ===" >> "$LOG"
}

# 1. driver metric first (bench.py locks internally — no wrapper flock).
# Timeout 6000 > bench.py's own 3000s internal lock wait + step runtime,
# so a contended lock can't kill it before it emits its JSON line.
echo "=== python bench.py ($(date +%H:%M:%S))" >> "$LOG"
timeout 6000 python bench.py >> "$LOG" 2>&1
echo "=== exit $? ($(date +%H:%M:%S)) ===" >> "$LOG"
# 2. flagship supervised train step (headline vs round-1 0.60 img/s)
run python tools/benchmarks/train_step_bench.py --batch 2 --steps 5
# 3. SSOD post-warm-up stage (warm-up stage covered by bench.py)
run python tools/benchmarks/train_step_bench.py --ssod --post-warmup --steps 5
# 4. donation A/B + larger per-chip batch (north-star levers)
run python tools/benchmarks/train_step_bench.py --batch 2 --steps 5 --donate
run python tools/benchmarks/train_step_bench.py --batch 4 --steps 5 --donate
# 5. kernel microbench baseline + parity
run python tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla
# 6. bwd matmul precision A/B
run env SDT_BWD_MM_PRECISION=high python \
  tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla --skip-parity
# 7. bwd stage attribution (timing only)
run env SDT_BWD_SKIP_DLOC=1 python \
  tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla --skip-parity
run env SDT_BWD_SKIP_DV=1 python \
  tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla --skip-parity
run env SDT_FWD_NO_GATHER=1 python \
  tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla --skip-parity
# 8. bf16 scatter-matrix A/B (bwd C build)
run env SDT_BWD_C_BF16=1 python \
  tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla --skip-parity
# 9. packed-bf16 gather A/B (fwd)
run env SDT_PACKED_GATHER=1 python \
  tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla \
  --skip-parity --bf16-value
# 10. decoder cross-attn scale (sorted-query path)
run python tools/benchmarks/attn_kernel_bench.py --decoder --iters 5
# 11. in-graph Hungarian attribution
run python tools/benchmarks/hungarian_bench.py
# 12. serving/eval throughput
run python tools/benchmarks/train_step_bench.py --infer --batch 8 --steps 10
# 13. profiler trace of the SSOD recipe step
run python tools/benchmarks/train_step_bench.py --ssod --steps 3 \
  --profile /tmp/ssod_trace
echo "[sweep] done at $(date)" | tee -a "$LOG"
