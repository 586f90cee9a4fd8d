"""Native C++ augmentation kernel vs the (cv2-verified) device reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccnet_tpu import native
from ccnet_tpu.data.preprocess import CITYSCAPES_MEAN_BGR
import ccnet_tpu.data.preprocess as pp

pytestmark = pytest.mark.skipif(not native.available(), reason="no g++ toolchain")


def run_device_with_draws(image_f32, label, f, oy, ox, flip, crop):
    """device_augment with injected deterministic draws."""
    f_idx = int(round((f - 0.7) / 0.1))
    orig_randint, orig_bern = jax.random.randint, jax.random.bernoulli
    draws = iter([f_idx, oy, ox])
    jax.random.randint = lambda key, shape, lo, hi: jnp.asarray(next(draws), jnp.int32)
    jax.random.bernoulli = lambda key, p=0.5: jnp.asarray(bool(flip))
    try:
        img, lbl = pp.device_augment(
            jnp.asarray(image_f32), jnp.asarray(label), jax.random.PRNGKey(0), crop_hw=crop
        )
    finally:
        jax.random.randint, jax.random.bernoulli = orig_randint, orig_bern
    return np.asarray(img), np.asarray(lbl)


@pytest.mark.parametrize("f,flip", [(1.0, 0), (0.7, 1), (2.1, 0), (1.3, 1)])
def test_native_matches_device(f, flip):
    rng = np.random.RandomState(0)
    H0, W0, crop = 100, 120, (96, 96)
    image = rng.randint(0, 256, (1, H0, W0, 3)).astype(np.uint8)
    label = rng.randint(0, 19, (1, H0, W0)).astype(np.uint8)
    sH, sW = int(round(H0 * f)), int(round(W0 * f))
    oy = min(3, max(sH, crop[0]) - crop[0])
    ox = min(5, max(sW, crop[1]) - crop[1])

    lut = np.arange(256, dtype=np.uint8)  # identity (labels already trainIds)
    got_img, got_lbl = native.augment_batch(
        image, label, lut,
        np.array([f], np.float32), np.array([[oy, ox]], np.int32),
        np.array([flip], np.uint8), crop, CITYSCAPES_MEAN_BGR,
    )
    want_img, want_lbl = run_device_with_draws(
        image[0].astype(np.float32), label[0].astype(np.int32), f, oy, ox, flip, crop
    )
    np.testing.assert_array_equal(got_lbl[0], want_lbl)
    np.testing.assert_allclose(got_img[0], want_img, atol=1e-2)


def test_native_lut_and_padding():
    rng = np.random.RandomState(1)
    image = rng.randint(0, 256, (1, 40, 50, 3)).astype(np.uint8)
    label = np.full((1, 40, 50), 7, np.uint8)  # raw labelId 7 -> trainId 0
    from ccnet_tpu.data import trainid_lut

    got_img, got_lbl = native.augment_batch(
        image, label, trainid_lut(),
        np.array([1.0], np.float32), np.array([[0, 0]], np.int32),
        np.array([0], np.uint8), (64, 64), (0.0, 0.0, 0.0),
    )
    assert (got_lbl[0, :40, :50] == 0).all()      # mapped through LUT
    assert (got_lbl[0, 40:, :] == 255).all()      # bottom padding -> ignore
    assert (got_img[0, 40:, :, :] == 0).all()     # image padding -> 0


def test_draw_params_distributions():
    rng = np.random.RandomState(2)
    scales, offs, flips = native.draw_augment_params(rng, 64, (1024, 2048), (769, 769))
    assert scales.min() >= 0.7 - 1e-6 and scales.max() <= 2.1 + 1e-6
    assert set(np.unique(flips)) <= {0, 1}
    for b in range(64):
        sH = int(round(1024 * scales[b]))
        assert 0 <= offs[b, 0] <= max(sH, 769) - 769
