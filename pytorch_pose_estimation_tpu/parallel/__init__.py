from .mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    select_devices,
    shard_host_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "select_devices",
    "shard_host_batch",
]
