#!/bin/bash
# One-shot on-chip benchmark sweep. Polls until the axon tunnel answers,
# then runs each benchmark SEQUENTIALLY in its own process (two
# concurrent axon clients can wedge the relay — see verify SKILL.md).
# Env A/Bs use `env VAR=...` so nothing leaks between runs.
# Usage: bash tools/benchmarks/sweep_on_chip.sh [logfile]
set -u
cd "$(dirname "$0")/../.."
LOG=${1:-/tmp/sweep_on_chip.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

# All TPU clients (this sweep, bench.py, ad-hoc probes) serialize on one
# flock: two concurrent axon clients can wedge the loopback relay.
TPULOCK=/tmp/sdt_tpu.lock

probe() {
  flock "$TPULOCK" timeout 60 python -c "
import jax, jax.numpy as jnp
print('tpu alive:', float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" \
    >/dev/null 2>&1
}

echo "[sweep] waiting for TPU..." | tee -a "$LOG"
until probe; do sleep 180; done
echo "[sweep] TPU alive at $(date)" | tee -a "$LOG"

run() {
  echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"
  # -w bounds the lock wait so a wedged external holder skips the step
  # instead of stalling the sweep indefinitely.
  flock -w 3000 "$TPULOCK" timeout 2700 "$@" >> "$LOG" 2>&1 \
    || echo "[sweep] step failed or lock-wait expired: $*" >> "$LOG"
  echo "=== exit $? ===" >> "$LOG"
}

# 1. kernel microbench (v2 baseline + parity)
run python tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla
# 2. bwd matmul precision A/B
run env SDT_BWD_MM_PRECISION=high python \
  tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla --skip-parity
# 3. stage attribution (outputs wrong by design; timing only)
run env SDT_BWD_SKIP_DLOC=1 python \
  tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla --skip-parity
run env SDT_BWD_SKIP_DV=1 python \
  tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla --skip-parity
run env SDT_FWD_NO_GATHER=1 python \
  tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla --skip-parity
# 4. packed-bf16 gather A/B (fwd-only experiment)
run env SDT_PACKED_GATHER=1 python \
  tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla \
  --skip-parity --bf16-value
# 4b. bf16 scatter-matrix A/B (bwd C build, ROADMAP P0.6; interpret-mode
# parity in tests/test_ms_deform_attn_pallas.py)
run env SDT_BWD_C_BF16=1 python \
  tools/benchmarks/attn_kernel_bench.py --iters 5 --skip-xla --skip-parity
# 4c. decoder cross-attn scale (sorted-query path, VERDICT weak #2):
#     sorted-vs-unsorted-vs-XLA fwd, full-vjp bwd, parity
run python tools/benchmarks/attn_kernel_bench.py --decoder --iters 5
# 5. in-graph Hungarian attribution (post-warm-up serial suspect)
run python tools/benchmarks/hungarian_bench.py
# 6. flagship supervised train step (both stages)
run python tools/benchmarks/train_step_bench.py --batch 2 --steps 5
# 7. SSOD recipe step (north-star workload), both stages
run python tools/benchmarks/train_step_bench.py --ssod --steps 5
run python tools/benchmarks/train_step_bench.py --ssod --post-warmup --steps 5
# 8. donation A/B (HBM reuse; retests the round-1 axon donation bug)
run python tools/benchmarks/train_step_bench.py --batch 2 --steps 5 --donate
# 9. larger per-chip batch (if 8 fits with donation, north-star lever)
run python tools/benchmarks/train_step_bench.py --batch 4 --steps 5 --donate
# 9b. serving/eval throughput (forward + top-300 decode)
run python tools/benchmarks/train_step_bench.py --infer --batch 8 --steps 10
# 10. profiler trace of the SSOD recipe step (stage attribution:
#     encoder/decoder/NMS/Hungarian/optimizer shares)
run python tools/benchmarks/train_step_bench.py --ssod --steps 3 \
  --profile /tmp/ssod_trace
# 11. the driver metric — NO flock wrapper: bench.py takes the same
# lock internally (a wrapper's held lock would self-block it; flock is
# per open-file-description). Sequential here, so no other sweep step
# can race it.
# Timeout 6000 > bench.py's own 3000s internal lock wait + runtime, so a
# contended lock can't kill it before it emits its JSON line.
echo "=== python bench.py ($(date +%H:%M:%S))" >> "$LOG"
timeout 6000 python bench.py >> "$LOG" 2>&1
echo "=== exit $? ===" >> "$LOG"
echo "[sweep] done at $(date)" | tee -a "$LOG"
