"""Worker for the multi-process (multi-host simulation) test.

Launched N times by tests/test_multiprocess.py; each instance is one
``jax.distributed`` process with 2 local virtual CPU devices. Together they
exercise the real multi-host code paths:

* ``DataLoader`` per-process sharding (strided, DistributedSampler-style),
* ``ConfusionAccumulator.global_matrix`` cross-process sum
  (reference evaluate.py:267-268),
* ``shard_batch`` assembling a global batch from per-process local data
  (reference engine.py:85-97) feeding one mesh train step,
* both device-side augment backends (`device` / `host_u8` widen) running ON
  the placed global batch — the placement-first input path.

Usage: python _mp_worker.py <coordinator> <nproc> <pid> <outdir>
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, nproc, pid, outdir = sys.argv[1:5]
    nproc, pid = int(nproc), int(pid)
    jax.distributed.initialize(coordinator, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    import numpy as np
    import jax.numpy as jnp

    from ccnet_tpu.data import DataLoader, SyntheticDataset
    from ccnet_tpu.evaluation.metrics import ConfusionAccumulator
    from ccnet_tpu.losses import build_criterion
    from ccnet_tpu.models import CCNet
    from ccnet_tpu.parallel import make_mesh, shard_batch
    from ccnet_tpu.train import create_train_state, make_optimizer, make_train_step

    # ---- eval path: sharded loader + cross-process confusion sum ---------
    ds = SyntheticDataset(n=10, hw=(17, 17), num_classes=5, seed=3)
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=2)
    seen = []
    acc = ConfusionAccumulator(num_classes=5)
    for images, labels, names in loader:
        preds = (labels.astype(np.int64) * 3 + 1) % 5  # deterministic fake model
        acc.update(jnp.asarray(labels.astype(np.int32)),
                   jnp.asarray(preds.astype(np.int32)))
        seen.extend(names)
    cm = acc.global_matrix()

    # ---- train path: global batch assembled from per-process shards ------
    dst = SyntheticDataset(n=8, hw=(33, 33), num_classes=5, seed=11)
    per = 4 // nproc
    local = [dst[i] for i in range(pid * per, (pid + 1) * per)]  # contiguous
    images = np.stack([s[0] for s in local])
    labels = np.stack([s[1] for s in local])

    mesh = make_mesh(jax.devices(), space=2)
    model = CCNet(num_classes=5, layers=(1, 1, 1, 1), recurrence=2, impl="jnp")
    tx = make_optimizer(base_lr=1e-2, max_steps=100)
    criterion = build_criterion(ohem=False)
    state = create_train_state(model, tx, input_shape=(1, 33, 33, 3),
                               rng=jax.random.PRNGKey(0))
    step = make_train_step(model, criterion, tx, mesh=mesh)
    # placement-first input path: the HOST batch is placed once; every
    # device-side transform then runs on the global array (VERDICT r4 #3)
    im, lb = shard_batch(mesh, images, labels)
    assert im.shape[0] == 4 and lb.shape[0] == 4  # global batch, not local

    # the guard against the device->host->device round-trip: multi-process
    # placement must REFUSE device arrays (a regression here would silently
    # re-introduce a host pull of the augmented batch every step)
    try:
        shard_batch(mesh, jnp.asarray(images), jnp.asarray(labels))
        put_device_array_raised = False
    except TypeError:
        put_device_array_raised = True

    # on-device widen ON the placed global batch (the host_u8 tail): compute
    # follows the sharding — one jit over the global array, no re-placement
    from ccnet_tpu.data.preprocess import finish_u8_crops

    imgs_u8 = np.clip(images * 20 + 120, 0, 255).astype(np.uint8)
    lbls_u8 = labels.astype(np.uint8)
    gim, glb = shard_batch(mesh, imgs_u8, lbls_u8)
    fim, flb = finish_u8_crops(gim, glb)
    widen_checksum = float(jnp.float32(fim.sum()) + jnp.float32(flb.sum()))

    # the 'device' augment backend ON the placed global batch (the trainer's
    # _prepare_batch 'device' tail): eager vmap dispatch mixing the global
    # sharded batch with a process-local key — every process folds the SAME
    # key; per-sample draws come from the split over the GLOBAL batch
    from ccnet_tpu.data.preprocess import device_augment_batch

    akey = jax.random.fold_in(jax.random.PRNGKey(3), 7)
    aim, alb = device_augment_batch(gim, glb, akey, crop_hw=(25, 25),
                                    ignore_label=4)
    augment_checksum = float(jnp.float32(aim.sum()) + jnp.float32(alb.sum()))

    state, metrics = step(state, im, lb, jax.random.PRNGKey(7))
    loss = float(metrics["loss"])

    with open(os.path.join(outdir, f"out_{pid}.json"), "w") as f:
        json.dump({"pid": pid, "seen": sorted(seen), "cm": np.asarray(cm).tolist(),
                   "loss": loss, "n_local_devices": len(jax.local_devices()),
                   "n_global_devices": len(jax.devices()),
                   "put_device_array_raised": put_device_array_raised,
                   "widen_checksum": widen_checksum,
                   "augment_checksum": augment_checksum}, f)


if __name__ == "__main__":
    main()
