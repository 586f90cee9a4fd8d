"""Multi-host correctness on 2 real ``jax.distributed`` CPU processes.

The reference's multi-process behaviours under test (SURVEY §2.8, §2.15):
per-rank dataset sharding (``engine.py:85-117``), confusion-matrix
all-reduce at the end of eval (``evaluate.py:267-268``), and the per-rank
batch split feeding data-parallel training. Two subprocesses rendezvous via
``jax.distributed`` (2 local virtual CPU devices each → a 4-device global
mesh) and their results must match a single-process ground truth computed
here: the summed confusion matrix integer-exactly, the train-step loss to
float tolerance.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # spawns 2 real jax.distributed processes

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def mp_results(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mp"))
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)  # the worker forces cpu via jax.config
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(pid), outdir],
            env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se[-3000:]}"
    results = []
    for pid in range(2):
        with open(os.path.join(outdir, f"out_{pid}.json")) as f:
            results.append(json.load(f))
    return results


def test_workers_formed_a_global_mesh(mp_results):
    for r in mp_results:
        assert r["n_local_devices"] == 2
        assert r["n_global_devices"] == 4


def test_loader_shards_are_disjoint_and_complete(mp_results):
    a, b = (set(r["seen"]) for r in mp_results)
    assert not (a & b)
    assert len(a | b) == 10  # full synthetic val set covered, no duplicates


def test_cross_process_confusion_sum_matches_single_process(mp_results):
    from ccnet_tpu.data import SyntheticDataset
    from ccnet_tpu.evaluation.metrics import ConfusionAccumulator

    # single-process ground truth over the SAME 10 images + fake model
    ds = SyntheticDataset(n=10, hw=(17, 17), num_classes=5, seed=3)
    acc = ConfusionAccumulator(num_classes=5)
    for i in range(10):
        _, label, _ = ds[i]
        pred = (label.astype(np.int64) * 3 + 1) % 5
        acc.update(jnp.asarray(label.astype(np.int32))[None],
                   jnp.asarray(pred.astype(np.int32))[None])
    want = np.asarray(acc.cm)

    for r in mp_results:  # every process holds the identical global matrix
        np.testing.assert_array_equal(np.asarray(r["cm"]), want)


def test_put_refuses_device_arrays_under_multiprocess(mp_results):
    """The pod input path is host→device ONCE: multi-process placement must
    reject jax.Arrays (which would round-trip device→host→device every
    step, VERDICT r4 #3)."""
    for r in mp_results:
        assert r["put_device_array_raised"] is True


def test_on_device_widen_runs_on_the_placed_global_batch(mp_results):
    """finish_u8_crops on the globally-placed u8 batch: every process
    computes the identical global checksum (the host_u8 tail runs under the
    sharding, after the one placement)."""
    import numpy as np

    from ccnet_tpu.data import SyntheticDataset
    from ccnet_tpu.data.preprocess import finish_u8_crops

    dst = SyntheticDataset(n=8, hw=(33, 33), num_classes=5, seed=11)
    samples = [dst[i] for i in range(4)]
    images = np.stack([s[0] for s in samples])
    labels = np.stack([s[1] for s in samples])
    imgs_u8 = np.clip(images * 20 + 120, 0, 255).astype(np.uint8)
    lbls_u8 = labels.astype(np.uint8)
    fim, flb = finish_u8_crops(jnp.asarray(imgs_u8), jnp.asarray(lbls_u8))
    want = float(jnp.float32(fim.sum()) + jnp.float32(flb.sum()))
    for r in mp_results:
        # rel: f32 sum order differs between the sharded reduction (per-shard
        # partials) and this single-device sum — ~2e-5 on a 1.9e6 checksum
        assert r["widen_checksum"] == pytest.approx(want, rel=1e-4)


def test_device_augment_backend_runs_on_the_placed_global_batch(mp_results):
    """--augment-backend device under multi-controller execution: the eager
    vmap'd device_augment_batch on the globally-placed batch (with the
    per-process replicated key) dispatches cleanly and every process
    computes the identical global result."""
    from ccnet_tpu.data import SyntheticDataset
    from ccnet_tpu.data.preprocess import device_augment_batch

    dst = SyntheticDataset(n=8, hw=(33, 33), num_classes=5, seed=11)
    samples = [dst[i] for i in range(4)]
    images = np.stack([s[0] for s in samples])
    labels = np.stack([s[1] for s in samples])
    imgs_u8 = np.clip(images * 20 + 120, 0, 255).astype(np.uint8)
    lbls_u8 = labels.astype(np.uint8)
    akey = jax.random.fold_in(jax.random.PRNGKey(3), 7)
    aim, alb = device_augment_batch(jnp.asarray(imgs_u8), jnp.asarray(lbls_u8),
                                    akey, crop_hw=(25, 25), ignore_label=4)
    want = float(jnp.float32(aim.sum()) + jnp.float32(alb.sum()))
    for r in mp_results:
        assert r["augment_checksum"] == pytest.approx(want, rel=1e-4)


def test_multiprocess_train_step_matches_single_process(mp_results):
    from ccnet_tpu.data import SyntheticDataset
    from ccnet_tpu.losses import build_criterion
    from ccnet_tpu.models import CCNet
    from ccnet_tpu.train import create_train_state, make_optimizer, make_train_step

    dst = SyntheticDataset(n=8, hw=(33, 33), num_classes=5, seed=11)
    samples = [dst[i] for i in range(4)]  # the workers' shards, concatenated
    images = jnp.asarray(np.stack([s[0] for s in samples]))
    labels = jnp.asarray(np.stack([s[1] for s in samples]))

    model = CCNet(num_classes=5, layers=(1, 1, 1, 1), recurrence=2, impl="jnp")
    tx = make_optimizer(base_lr=1e-2, max_steps=100)
    criterion = build_criterion(ohem=False)
    state = create_train_state(model, tx, input_shape=(1, 33, 33, 3),
                               rng=jax.random.PRNGKey(0))
    step = make_train_step(model, criterion, tx, mesh=None)
    _, metrics = step(state, images, labels, jax.random.PRNGKey(7))
    want = float(metrics["loss"])

    for r in mp_results:
        assert r["loss"] == pytest.approx(want, abs=5e-5)
