from .mesh import (
    make_mesh,
    make_mesh_for_batch,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    multihost_barrier,
    process_shard_info,
)

__all__ = [
    "make_mesh",
    "make_mesh_for_batch",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "multihost_barrier",
    "process_shard_info",
]
