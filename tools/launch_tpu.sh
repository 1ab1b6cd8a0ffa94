#!/usr/bin/env bash
# Multi-host TPU launcher — the TPU-native analog of the reference's
# tools/dist_train_*.sh (torch.distributed.launch over N GPUs).
#
# On TPU pods there is no per-chip process launch: ONE python process per
# HOST, and jax.distributed discovers the slice topology. For single-host
# slices (v4-8/v5e-8) this is just `python tools/train_detr_ssod.py ...`.
#
# Usage (per host, e.g. via gcloud compute tpus tpu-vm ssh --worker=all):
#   bash tools/launch_tpu.sh tools/train_detr_ssod.py CONFIG [args...]
#
# Env:
#   COORDINATOR_ADDRESS  host:port of worker 0 (multi-host only)
#   NUM_PROCESSES        number of hosts (multi-host only)
#   PROCESS_ID           this host's index (multi-host only)
set -euo pipefail

SCRIPT=$1; shift

if [[ -n "${COORDINATOR_ADDRESS:-}" ]]; then
  export JAX_COORDINATOR_ADDRESS="$COORDINATOR_ADDRESS"
  export JAX_NUM_PROCESSES="${NUM_PROCESSES:?}"
  export JAX_PROCESS_ID="${PROCESS_ID:?}"
fi

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"

exec python "$SCRIPT" "$@"
