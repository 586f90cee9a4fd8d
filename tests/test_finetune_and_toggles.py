"""Fine-tune partial restore (reference --not-restore-last, train.py:80-81)
and augmentation on/off switches (--random-scale / --random-mirror,
train.py:92-95)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccnet_tpu.data.preprocess import device_augment_batch
from ccnet_tpu.models import CCNet
from ccnet_tpu.utils.checkpoint import load_pth, save_pth


def _tiny_vars(classes, seed=0):
    model = CCNet(num_classes=classes, layers=(1, 1, 1, 1), recurrence=1, impl="jnp")
    v = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 33, 33, 3)), train=False)
    return {"params": v["params"], "batch_stats": v["batch_stats"]}


def test_not_restore_last_loads_backbone_into_new_class_count(tmp_path):
    src = _tiny_vars(19, seed=1)
    pth = str(tmp_path / "w19.pth")
    save_pth(src, pth)

    tmpl = _tiny_vars(21, seed=2)
    loaded, missing, unexpected = load_pth(pth, tmpl, skip_mismatch=True,
                                           restore_last=False)
    # backbone weights transferred
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["backbone"]["conv1"]["weight"]),
        np.asarray(src["params"]["backbone"]["conv1"]["weight"]))
    # classifier kept at the 21-class template init (dropped from the ckpt)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["head"]["classifier"]["weight"]),
        np.asarray(tmpl["params"]["head"]["classifier"]["weight"]))
    assert any("head.bottleneck.3" in k for k in missing)
    assert not any("head.bottleneck.3" in k for k in unexpected)


def test_shape_mismatch_raises_without_skip(tmp_path):
    src = _tiny_vars(19, seed=1)
    pth = str(tmp_path / "w19.pth")
    save_pth(src, pth)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_pth(pth, _tiny_vars(21, seed=2))


def test_skip_mismatch_without_drop_loads_matching_classifier_bias_shape(tmp_path):
    # skip_mismatch alone: mismatched classifier weights are skipped, all
    # same-shaped keys still load
    src = _tiny_vars(19, seed=1)
    pth = str(tmp_path / "w19.pth")
    save_pth(src, pth)
    loaded, missing, _ = load_pth(pth, _tiny_vars(21, seed=2), skip_mismatch=True)
    assert any(k.startswith("head.bottleneck.3") for k in missing)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["backbone"]["bn1"]["weight"]),
        np.asarray(src["params"]["backbone"]["bn1"]["weight"]))


def test_augment_toggles_off_is_identity_crop():
    rng = np.random.RandomState(0)
    B, H = 2, 40
    images = rng.randint(0, 256, size=(B, H, H, 3)).astype(np.float32)
    labels = rng.randint(0, 19, size=(B, H, H)).astype(np.int32)
    mean = (10.0, 20.0, 30.0)
    img, lbl = device_augment_batch(
        jnp.asarray(images), jnp.asarray(labels), jax.random.PRNGKey(0),
        crop_hw=(H, H), mean=mean, scale=False, mirror=False)
    np.testing.assert_allclose(np.asarray(img),
                               images - np.asarray(mean, np.float32), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(lbl), labels)


def test_augment_scale_off_still_crops_and_mirrors():
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, size=(1, 64, 64, 3)).astype(np.float32)
    labels = rng.randint(0, 19, size=(1, 64, 64)).astype(np.int32)
    img, lbl = device_augment_batch(
        jnp.asarray(images), jnp.asarray(labels), jax.random.PRNGKey(1),
        crop_hw=(32, 32), mean=(0.0, 0.0, 0.0), scale=False, mirror=True)
    assert img.shape == (1, 32, 32, 3) and lbl.shape == (1, 32, 32)
    # scale off → the crop is an exact (possibly mirrored) window of the source
    crop = np.asarray(img[0]).astype(np.float32)
    found = False
    for flip in (False, True):
        s = images[0, :, ::-1] if flip else images[0]
        for oy in range(33):
            for ox in range(33):
                if np.allclose(s[oy:oy + 32, ox:ox + 32], crop, atol=1e-3):
                    found = True
    assert found
