from .mesh import (batch_sharding, fsdp_sharding, make_mesh,
                   maybe_initialize_distributed, replicate, shard_batch,
                   tp_sharding, with_batch_constraint)

__all__ = ["make_mesh", "batch_sharding", "fsdp_sharding",
           "maybe_initialize_distributed", "replicate", "shard_batch",
           "tp_sharding", "with_batch_constraint"]
