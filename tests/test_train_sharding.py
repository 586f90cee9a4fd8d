"""Distributed-training correctness on the 8-device virtual CPU mesh.

The key invariant: a train step over a (data×space) mesh must produce
EXACTLY the same new state as the same step on one device — gradient
all-reduce, sync-BN moments and OHEM selection are all global under pjit.
The reference could never test this without a GPU cluster (SURVEY §4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccnet_tpu.losses import build_criterion
from ccnet_tpu.models import CCNet
from ccnet_tpu.parallel import make_mesh, shard_batch
from ccnet_tpu.train import create_train_state, make_optimizer, make_train_step, poly_schedule


def tiny_model():
    return CCNet(num_classes=7, layers=(1, 1, 1, 1), recurrence=2, impl="jnp")


def make_batch(seed=0, B=8, H=65, W=65):
    rng = np.random.RandomState(seed)
    images = rng.randn(B, H, W, 3).astype(np.float32)
    labels = rng.randint(0, 7, size=(B, H, W)).astype(np.int32)
    labels[rng.rand(B, H, W) < 0.1] = 255
    return jnp.asarray(images), jnp.asarray(labels)


def test_poly_schedule():
    s = poly_schedule(1e-2, 60000, 0.9)
    assert abs(float(s(0)) - 1e-2) < 1e-9
    assert abs(float(s(30000)) - 1e-2 * 0.5 ** 0.9) < 1e-9


@pytest.mark.slow
def test_mesh_step_matches_single_device():
    assert len(jax.devices()) == 8
    model = tiny_model()
    tx = make_optimizer(base_lr=1e-2, max_steps=100, weight_decay=5e-4)
    criterion = build_criterion(ohem=True, min_kept=500)
    state = create_train_state(model, tx, input_shape=(1, 65, 65, 3))
    images, labels = make_batch()
    rng = jax.random.PRNGKey(42)

    # single-device reference
    step1 = make_train_step(model, criterion, tx, mesh=None)
    s1, m1 = step1(state, images, labels, rng)

    # 4×2 (data × space) mesh
    state2 = create_train_state(model, tx, input_shape=(1, 65, 65, 3))
    mesh = make_mesh(space=2)
    stepN = make_train_step(model, criterion, tx, mesh=mesh)
    im, lb = shard_batch(mesh, images, labels)
    s2, m2 = stepN(state2, im, lb, rng)

    assert np.isfinite(float(m1["loss"]))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # params identical after the update => grads + BN stats were global
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.batch_stats), jax.tree_util.tree_leaves(s2.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_loss_decreases_over_steps():
    model = tiny_model()
    tx = make_optimizer(base_lr=1e-2, max_steps=50, weight_decay=1e-4)
    criterion = build_criterion(ohem=False)
    state = create_train_state(model, tx, input_shape=(1, 65, 65, 3))
    images, labels = make_batch(seed=1, B=2)
    step = make_train_step(model, criterion, tx)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(8):
        state, metrics = step(state, images, labels, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(l) for l in losses)


@pytest.mark.slow
def test_augment_on_mesh_placed_batch_matches_unplaced():
    """The placement-first input path (VERDICT r4 #3): raw u8 batch placed
    under the mesh batch sharding FIRST, then augmented on the global array —
    must produce exactly the crops the single-device augment produces, and
    the augmented output must stay sharded over the batch (the following
    train step consumes it without a reshard)."""
    from ccnet_tpu.data.preprocess import device_augment_batch

    rng = np.random.RandomState(7)
    images = rng.randint(0, 256, size=(8, 40, 56, 3)).astype(np.uint8)
    labels = rng.randint(0, 7, size=(8, 40, 56)).astype(np.uint8)
    key = jax.random.PRNGKey(11)
    kw = dict(crop_hw=(33, 33), scale_min=0.7, scale_steps=15)

    want_im, want_lb = device_augment_batch(
        jnp.asarray(images), jnp.asarray(labels), key, **kw)

    mesh = make_mesh(space=2)
    gim, glb = shard_batch(mesh, images, labels)
    got_im, got_lb = device_augment_batch(gim, glb, key, **kw)
    # atol: partitioned CPU executables fuse the bilinear lerp slightly
    # differently (last-ulp f32 deltas on ~±130-range pixels, measured 8e-6)
    np.testing.assert_allclose(np.asarray(got_im), np.asarray(want_im), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(got_lb), np.asarray(want_lb))
    # batch-dim sharding survived the augment: each of the 8 devices holds
    # its own sample's crop, not a replica of the whole batch
    assert not got_im.sharding.is_fully_replicated
    shard_shapes = {s.data.shape for s in got_im.addressable_shards}
    assert shard_shapes == {(1, 33, 33, 3)}, shard_shapes


@pytest.mark.slow
def test_spatially_sharded_forward_matches_single_device():
    """Whole-image eval with image HEIGHT over the `space` axis (SURVEY §5.7:
    XLA partitions the convs with halo exchange and all-gathers the
    criss-cross row/column attention) must equal the unsharded forward."""
    from ccnet_tpu.parallel import spatial_sharding

    model = tiny_model()
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 96, 3)), train=False)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 64, 96, 3).astype(np.float32))

    want = np.asarray(model.apply(variables, x, train=False)["main"])

    mesh = make_mesh(space=2)  # 4×2 (data × space)
    sh = spatial_sharding(mesh)
    fwd = jax.jit(lambda v, xx: model.apply(v, xx, train=False)["main"],
                  in_shardings=(None, sh))
    got = np.asarray(fwd(variables, jax.device_put(x, sh)))
    np.testing.assert_allclose(got, want, atol=1e-5)
