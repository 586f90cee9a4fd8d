"""Resize / pooling parity tests against torch + cv2 (the reference's backends)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ccnet_tpu.ops import (
    adaptive_avg_pool,
    max_pool_ceil,
    resize_bilinear_align_corners,
    resize_bilinear_cv2,
    resize_nearest_cv2,
)

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")


@pytest.mark.parametrize("in_hw,out_hw", [((97, 97), (769, 769)), ((13, 17), (40, 31)), ((32, 32), (8, 8))])
def test_bilinear_align_corners_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 5).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out_hw))
    want = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="bilinear", align_corners=True
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((30, 40), (21, 53)), ((100, 100), (70, 70)), ((50, 60), (105, 126))])
def test_bilinear_cv2(in_hw, out_hw):
    rng = np.random.RandomState(1)
    x = rng.rand(*in_hw, 3).astype(np.float32) * 255
    got = np.asarray(resize_bilinear_cv2(jnp.asarray(x)[None], out_hw))[0]
    want = cv2.resize(x, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, want, atol=1e-2)


@pytest.mark.parametrize("in_hw,out_hw", [((30, 40), (21, 53)), ((100, 100), (70, 70)), ((50, 60), (105, 126))])
def test_nearest_cv2(in_hw, out_hw):
    rng = np.random.RandomState(2)
    x = rng.randint(0, 255, size=in_hw).astype(np.uint8)
    got = np.asarray(resize_nearest_cv2(jnp.asarray(x), out_hw, h_axis=0))
    want = cv2.resize(x, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_NEAREST)
    mismatch = (got != want).mean()
    assert mismatch == 0.0, f"nearest mismatch frac {mismatch}"


@pytest.mark.parametrize("hw", [(385, 385), (384, 386), (97, 97), (33, 47)])
def test_max_pool_ceil_matches_torch(hw):
    rng = np.random.RandomState(3)
    x = rng.randn(2, *hw, 4).astype(np.float32)
    got = np.asarray(max_pool_ceil(jnp.asarray(x)))
    want = (
        torch.nn.MaxPool2d(kernel_size=3, stride=2, padding=1, ceil_mode=True)(
            torch.from_numpy(x).permute(0, 3, 1, 2)
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("hw,out", [((97, 97), (1, 1)), ((97, 97), (2, 2)), ((97, 97), (3, 3)), ((97, 97), (6, 6)), ((13, 29), (3, 6))])
def test_adaptive_avg_pool_matches_torch(hw, out):
    rng = np.random.RandomState(4)
    x = rng.randn(2, *hw, 4).astype(np.float32)
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), out))
    want = (
        torch.nn.AdaptiveAvgPool2d(out)(torch.from_numpy(x).permute(0, 3, 1, 2))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
