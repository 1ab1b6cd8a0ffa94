"""Device mesh + sharding helpers — the TPU-native replacement for DDP.

The reference's only parallelism is data parallelism over NCCL
(`MMDistributedDataParallel`, `detr_ssod/apis/train.py:84-93`; collectives
inventoried in SURVEY.md §2.5). The TPU-native design is a 1-D `data` mesh
over ICI with ONE jitted global-view train step:

* batches are global arrays sharded on axis 0 (`P('data')`);
* params/optimizer state are replicated — XLA inserts the grad all-reduce
  that DDP performs explicitly;
* the reference's `reduce_mean` of loss avg-factors and its variable-size
  `concat_all_gather` of GMM costs (`dist_utils.py:4-46`) both disappear:
  in global view, sums over the batch axis ARE the cross-device reductions,
  and the GMM cost pool is simply the (fixed-capacity, masked) global array.

Scaling beyond data parallelism (absent in the reference, SURVEY.md §2.5)
is expressed by adding axes to the same mesh — `make_mesh((dp, mp))` — and
threading `P('data')`/`P('model')` shardings through `shard` params below.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Optional[Sequence[str]] = None,
              devices=None) -> Mesh:
    """Create a device mesh. Default: all devices on one 'data' axis;
    multi-dim shapes default to ('data', 'model', ...) names."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (devices.size,)
    if axis_names is None:
        axis_names = ("data", "model", "pipe", "expert")[:len(shape)]
    assert len(axis_names) == len(shape), (axis_names, shape)
    return Mesh(devices.reshape(tuple(shape)), tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def maybe_initialize_distributed() -> bool:
    """Form the multi-host JAX runtime when launched by tools/launch_tpu.sh
    (the analog of the reference's `init_dist`, tools/train_detr_ssod.py:
    130-137). JAX does NOT consume JAX_COORDINATOR_ADDRESS by itself —
    `jax.distributed.initialize()` must be called before any backend use.

    No-op (returns False) when the coordinator env is absent, i.e. on
    single-host slices and in tests."""
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS") is None:
        return False
    if jax.distributed.is_initialized():   # idempotent
        return True
    # jax.distributed.initialize reads JAX_COORDINATOR_ADDRESS itself but
    # NOT JAX_NUM_PROCESSES / JAX_PROCESS_ID (those come from cluster
    # auto-detection, absent on bare launches) — pass them explicitly
    # when the launch script (tools/launch_tpu.sh) provides them.
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        num_processes=int(num) if num else None,
        process_id=int(pid) if pid else None)
    return True


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Assemble a host-local batch pytree into global arrays sharded on
    axis 0. Single-process: a plain sharded device_put of the full batch.
    Multi-host: each process contributes only ITS slice
    (`jax.make_array_from_process_local_data`) — paired with the
    sampler's per-host index shards, so no host ever materializes the
    global batch."""
    s = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def fsdp_sharding(mesh: Mesh, tree, axis: str = "data",
                  min_size: int = 8192):
    """Per-leaf FSDP-style shardings for a state pytree (ZeRO analog).

    Absent in the reference (DDP replicates params+Adam state on every
    GPU); TPU-native scaling lever: shard each large leaf's largest
    mesh-divisible dim across `axis`. XLA's SPMD partitioner then
    all-gathers params where used and reduce-scatters their gradients,
    while the AdamW update and EMA teacher stay fully local — param +
    optimizer + teacher memory drops ~N-fold, funding larger per-chip
    batches. Leaves smaller than `min_size` elements (or with no
    divisible dim) replicate: gather latency would beat the HBM win.

    Returns a sharding pytree matching `tree` (usable directly as
    `jax.device_put(state, shardings)` / jit in_shardings).
    """
    n = mesh.shape[axis]

    def spec_for(x):
        shape = tuple(getattr(x, "shape", ()))
        if int(np.prod(shape, dtype=np.int64)) < min_size:
            return NamedSharding(mesh, P())
        best_dim, best = None, 0
        for i, d in enumerate(shape):
            if d % n == 0 and d > best:
                best_dim, best = i, d
        if best_dim is None:
            return NamedSharding(mesh, P())
        axes = [None] * len(shape)
        axes[best_dim] = axis
        return NamedSharding(mesh, P(*axes))

    return jax.tree.map(spec_for, tree)


def tp_sharding(mesh: Mesh, tree, axis: str = "model", base=None):
    """Megatron-style tensor-parallel shardings for the transformer FFNs
    (encoder + decoder `linear1`/`linear2` pairs, the densest matmuls
    outside deform-attn). Absent in the reference (DDP-only); TPU-native
    scaling lever on a 2-D (data, model) mesh.

    The expansion kernel/bias shard their OUTPUT (d_ffn) dim and the
    contraction kernel its INPUT (d_ffn) dim over `axis`: XLA's SPMD
    partitioner then keeps the hidden activation `axis`-sharded between
    the two matmuls and inserts exactly one all-reduce after the
    contraction — the Megatron FFN recipe, derived automatically from
    the weight shardings. Everything else (deform-attn projections, the
    Pallas kernel's operands, norms, heads) takes `base`'s spec for that
    leaf (or replicates), so the rule composes with `fsdp_sharding`.

    Path-keyed, so it applies identically to params, the EMA teacher,
    and the Adam moments nested under opt_state. Works with the scanned
    encoder's stacked leaves (leading layer dim) since dims are counted
    from the END. Non-divisible dims fall back to `base`.
    """
    n = mesh.shape[axis]
    repl = NamedSharding(mesh, P())

    def spec_for(path, x, fallback):
        keys = [str(getattr(k, "key", getattr(k, "name", k)))
                for k in path]
        shape = tuple(getattr(x, "shape", ()))
        if not shape:
            return fallback
        if "linear1" in keys:                       # expansion: out dim
            dim = len(shape) - 1
        elif "linear2" in keys and keys[-1] == "kernel" and len(shape) >= 2:
            dim = len(shape) - 2                    # contraction: in dim
        else:
            return fallback
        if shape[dim] % n != 0:
            return fallback
        axes = [None] * len(shape)
        axes[dim] = axis
        return NamedSharding(mesh, P(*axes))

    if base is None or isinstance(base, NamedSharding):
        fb = base if base is not None else repl
        return jax.tree_util.tree_map_with_path(
            lambda p, x: spec_for(p, x, fb), tree)
    return jax.tree_util.tree_map_with_path(spec_for, tree, base)


def with_batch_constraint(tree, mesh: Mesh, axis: str = "data"):
    """Annotate intermediate activations as batch-sharded inside jit."""
    s = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, s), tree)
