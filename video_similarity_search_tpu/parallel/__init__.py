from .mesh import (DATA_AXIS, batch_sharding, get_world_size,
                   initialize_distributed, is_master_proc, make_mesh,
                   maybe_auto_initialize, multihost_env,
                   microbatch_sharding, replicate, replicated, shard_batch)

__all__ = [
    "DATA_AXIS", "batch_sharding", "get_world_size", "initialize_distributed",
    "is_master_proc", "make_mesh", "maybe_auto_initialize",
    "microbatch_sharding", "multihost_env", "replicate",
    "replicated", "shard_batch",
]
