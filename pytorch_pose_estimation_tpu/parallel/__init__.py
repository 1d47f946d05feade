from .mesh import (
    batch_sharding,
    make_mesh,
    maybe_init_distributed,
    replicated_sharding,
    select_devices,
    shard_host_batch,
    spatial_sharding,
)

__all__ = [
    "make_mesh",
    "maybe_init_distributed",
    "batch_sharding",
    "replicated_sharding",
    "select_devices",
    "shard_host_batch",
    "spatial_sharding",
]
