from ccnet_tpu.parallel.distributed import is_primary_host, maybe_initialize_distributed
from ccnet_tpu.parallel.mesh import (
    make_mesh,
    replicated_sharding,
    batch_sharding,
    label_sharding,
    spatial_sharding,
    shard_batch,
)

__all__ = [
    "is_primary_host",
    "maybe_initialize_distributed",
    "make_mesh",
    "replicated_sharding",
    "batch_sharding",
    "label_sharding",
    "spatial_sharding",
    "shard_batch",
]
