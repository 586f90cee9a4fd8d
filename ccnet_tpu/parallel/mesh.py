"""Device mesh + sharding rules.

The TPU-native replacement for the reference's entire distributed runtime
(``engine.py``: NCCL process groups, apex DDP gradient hooks, per-rank batch
splitting, InPlaceABNSync BN-stat all-reduce — SURVEY §2.8/§2.10). Here all
of it is one mechanism: a ``jax.sharding.Mesh`` with the global batch sharded
over the ``data`` axis (and optionally image height over ``space``), and XLA
inserting every collective —

* gradient mean        → all-reduce from sharded-batch loss mean;
* sync-BN moments      → all-reduce inside the global batch-stat mean;
* loss / metric logging → same;
* halo exchange for spatially-sharded convs → XLA SPMD conv partitioning.

One process per host, all devices addressed by one ``jit`` — no rank logic,
no ``WORLD_SIZE`` env sniffing, no wrapper module.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(devices: Optional[Sequence] = None, space: int = 1) -> Mesh:
    """Create a (data, space) mesh over the given (default: all) devices.

    ``space > 1`` additionally partitions image height — used for
    whole-image 1024×2048 inference and as the model/spatial axis of the
    2-D mesh (the criss-cross factorisation is H/W-separable, SURVEY §5.7).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % space != 0:
        raise ValueError(f"{n} devices not divisible by space={space}")
    arr = np.asarray(devices).reshape(n // space, space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC training batch: pure DP — batch sharded over BOTH mesh axes.

    Training crops are 769² (odd), so spatial sharding cannot apply; the
    space axis folds into data parallelism instead.
    """
    return NamedSharding(mesh, P((DATA_AXIS, SPACE_AXIS), None, None, None))


def label_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W) int training labels: pure DP over both axes."""
    return NamedSharding(mesh, P((DATA_AXIS, SPACE_AXIS), None, None))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC eval batch: batch over data, image HEIGHT over space.

    For whole-image inference (1024×2048 divides evenly); XLA partitions the
    convs with halo exchange and all-gathers the criss-cross row/column
    attention over ICI automatically.
    """
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None, None))


def _put(array, sharding: NamedSharding):
    """Place a host array onto the mesh.

    Single process: plain ``device_put``. Multi-process (multi-host slice):
    the argument is this process's *local* shard of the global batch —
    assemble the global array from per-process data (the TPU equivalent of
    the reference's per-rank batch split, ``engine.py:85-97``).

    Multi-process placement takes HOST data only: handing a device array
    here would silently pull it back to host (``np.asarray``) before
    re-uploading — a device→host→device round-trip per step. Place the raw
    host batch FIRST and run augmentation/widening on the global array
    (``Trainer._place_raw``).
    """
    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    if isinstance(array, jax.Array):
        raise TypeError(
            "shard_batch/_put under multi-process execution takes host "
            "arrays (this process's local shard of the global batch); got a "
            "jax.Array, which would round-trip device->host->device. Place "
            "host data first, then compute on the global array."
        )
    return jax.make_array_from_process_local_data(sharding, np.asarray(array))


def shard_batch(mesh: Mesh, images, labels=None):
    """Place a host batch onto the mesh with the canonical shardings.

    Under multi-process execution each process passes its local portion
    (``global_batch / process_count`` samples); the returned arrays are
    global jax.Arrays spanning the whole mesh.
    """
    images = _put(images, batch_sharding(mesh))
    if labels is None:
        return images
    return images, _put(labels, label_sharding(mesh))
