from ccnet_tpu.parallel.mesh import (
    make_mesh,
    replicated_sharding,
    batch_sharding,
    label_sharding,
    spatial_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "replicated_sharding",
    "batch_sharding",
    "label_sharding",
    "spatial_sharding",
    "shard_batch",
]
