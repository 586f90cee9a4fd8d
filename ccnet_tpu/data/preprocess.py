"""Training augmentation with the reference's exact semantics — on device.

Reference recipe (``dataset/datasets.py:157-210``): random scale ∈
{0.7, 0.8, …, 2.1} (cv2 INTER_LINEAR image / INTER_NEAREST label), BGR mean
subtraction, pad to crop (image 0-after-mean, label 255), random 769² crop,
random horizontal mirror.

TPU-native twist: scale→pad→crop→mirror compose into ONE gather-based
bilinear sample per output pixel, so the whole augmentation is a jittable
static-shape program: output pixel (i, j) with crop offset (oy, ox) and scale
f reads the source at the cv2 half-pixel coordinate
``((i + oy) + 0.5) · H₀/round(H₀·f) − 0.5`` — no dynamic intermediate
"scaled image" ever exists. Coordinates past the scaled extent reproduce the
reference's padding (0 post-mean / ignore). Mean subtraction commutes with
bilinear interpolation, so sampling raw pixels then subtracting the mean is
exact. A host-side numpy twin (:func:`host_augment`) with identical
semantics serves variable-sized datasets (VOC) and acts as the test oracle's
subject.

Per-pixel label remap (labelId→trainId, reference ``datasets.py:146-151``)
is a 256-entry LUT gather, applied before scaling (nearest resize commutes
with per-pixel relabeling).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# reference train.py:30 (BGR order, matches cv2 imread)
CITYSCAPES_MEAN_BGR = (104.00698793, 116.66876762, 122.67891434)

SCALE_MIN, SCALE_STEPS, SCALE_STEP = 0.7, 15, 0.1  # 0.7 … 2.1


def _bilinear_sample_axis(img, src, axis):
    lo = jnp.clip(jnp.floor(src), 0, img.shape[axis] - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, img.shape[axis] - 1)
    w = (src - lo).astype(img.dtype)
    xlo = jnp.take(img, lo, axis=axis)
    xhi = jnp.take(img, hi, axis=axis)
    shape = [1] * img.ndim
    shape[axis] = -1
    w = w.reshape(shape)
    return xlo * (1 - w) + xhi * w


def _bilinear_weight_matrix(src: jnp.ndarray, in_size: int) -> jnp.ndarray:
    """(out, in) interpolation matrix: row i holds the two-tap lerp weights
    for clamped source coordinate src[i] — tent function max(0, 1-|src-j|)."""
    grid = jnp.arange(in_size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - grid[None, :]))


def _bilinear_sample_matmul(image: jnp.ndarray, src_y, src_x) -> jnp.ndarray:
    """Bilinear resample of (H0, W0, C) as two MXU matmuls.

    Alternative to the gather formulation: the separable interpolation as a
    pair of dense matmuls against tent-weight matrices. Measured equal to the
    gather path on v5e at Cityscapes shapes (~1.4 ms/image, HBM-bound either
    way) — kept selectable for chips/shapes where gathers lower poorly.
    HIGHEST precision keeps the two-tap sums f32-exact.
    """
    hp = jax.lax.Precision.HIGHEST
    w_h = _bilinear_weight_matrix(src_y, image.shape[0])  # (ch, H0)
    w_w = _bilinear_weight_matrix(src_x, image.shape[1])  # (cw, W0)
    out = jnp.einsum("oh,hwc->owc", w_h, image, precision=hp)
    return jnp.einsum("vw,owc->ovc", w_w, out, precision=hp)


def device_augment(
    image: jnp.ndarray,  # (H0, W0, 3) f32 raw BGR pixels
    label: jnp.ndarray,  # (H0, W0) int32 (already trainId-mapped)
    key: jax.Array,
    crop_hw: Tuple[int, int] = (769, 769),
    mean: Tuple[float, float, float] = CITYSCAPES_MEAN_BGR,
    ignore_label: int = 255,
    scale_min: float = SCALE_MIN,
    scale_steps: int = SCALE_STEPS,
    sampler: str = "gather",  # 'gather' | 'matmul' (MXU resample)
    scale: bool = True,   # reference --random-scale (train.py:92-95)
    mirror: bool = True,  # reference --random-mirror
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One sample's scale+pad+crop+mirror, fully jittable. Returns
    (crop_h, crop_w, 3) f32 mean-subtracted image and (crop_h, crop_w) label.

    ``image``/``label`` may arrive as uint8 (the wire-efficient host→device
    layout — 4× less transfer than f32; raw pixels are integers so the cast
    is exact) and are widened on device."""
    image = image.astype(jnp.float32)
    label = label.astype(jnp.int32)
    H0, W0 = image.shape[0], image.shape[1]
    ch, cw = crop_hw
    k_scale, k_oy, k_ox, k_flip = jax.random.split(key, 4)

    if scale:
        f = scale_min + SCALE_STEP * jax.random.randint(k_scale, (), 0, scale_steps)
    else:
        f = jnp.float32(1.0)
    sH = jnp.round(H0 * f).astype(jnp.int32)
    sW = jnp.round(W0 * f).astype(jnp.int32)

    # crop offset within the (padded) scaled canvas
    oy = jax.random.randint(k_oy, (), 0, jnp.maximum(sH, ch) - ch + 1)
    ox = jax.random.randint(k_ox, (), 0, jnp.maximum(sW, cw) - cw + 1)

    ys = jnp.arange(ch) + oy  # positions in scaled space
    xs = jnp.arange(cw) + ox
    valid_y = ys < sH
    valid_x = xs < sW

    # cv2 INTER_LINEAR: half-pixel centres
    src_y = jnp.clip((ys + 0.5) * (H0 / sH) - 0.5, 0.0, H0 - 1)
    src_x = jnp.clip((xs + 0.5) * (W0 / sW) - 0.5, 0.0, W0 - 1)
    if sampler == "matmul":
        img = _bilinear_sample_matmul(image, src_y, src_x)
    else:
        img = _bilinear_sample_axis(image, src_y, 0)
        img = _bilinear_sample_axis(img, src_x, 1)
    img = img - jnp.asarray(mean, img.dtype)
    valid = (valid_y[:, None] & valid_x[None, :])[..., None]
    img = jnp.where(valid, img, 0.0)  # pad AFTER mean-subtract == reference

    # cv2 INTER_NEAREST: floor(dst · 1/f). cv2 does this in float64; at
    # exact-integer tie points its double rounding may pick the previous
    # pixel where f32 picks the next — a one-pixel shift at <0.1% of
    # coordinates, irrelevant to the augmentation's selection semantics
    # (verified at tie-boundaries-only granularity in tests/test_data.py).
    ny = jnp.clip(jnp.floor(ys * (H0 / sH)), 0, H0 - 1).astype(jnp.int32)
    nx = jnp.clip(jnp.floor(xs * (W0 / sW)), 0, W0 - 1).astype(jnp.int32)
    lbl = label[ny][:, nx]
    lbl = jnp.where(valid[..., 0], lbl, ignore_label)

    if mirror:
        flip = jax.random.bernoulli(k_flip)
        img = jnp.where(flip, img[:, ::-1], img)
        lbl = jnp.where(flip, lbl[:, ::-1], lbl)
    return img, lbl


@functools.partial(
    jax.jit,
    static_argnames=("crop_hw", "mean", "ignore_label", "scale_min", "scale_steps",
                     "sampler", "scale", "mirror"),
)
def device_augment_batch(images, labels, key, crop_hw=(769, 769),
                         mean=CITYSCAPES_MEAN_BGR, ignore_label=255,
                         scale_min=SCALE_MIN, scale_steps=SCALE_STEPS,
                         sampler="gather", scale=True, mirror=True):
    """vmap'd augmentation: (B, H0, W0, 3) raw + (B, H0, W0) labels → crops."""
    keys = jax.random.split(key, images.shape[0])
    fn = functools.partial(
        device_augment, crop_hw=crop_hw, mean=tuple(mean), ignore_label=ignore_label,
        scale_min=scale_min, scale_steps=scale_steps, sampler=sampler,
        scale=scale, mirror=mirror,
    )
    return jax.vmap(fn)(images, labels, keys)


# ------------------------------------------------------------- host twin ---


def host_augment_u8(
    image: np.ndarray,  # (H0, W0, 3) uint8 BGR (decoded bytes)
    label: np.ndarray,  # (H0, W0) uint8 (trainId-mapped)
    rng: np.random.RandomState,
    crop_hw: Tuple[int, int] = (769, 769),
    mean=CITYSCAPES_MEAN_BGR,
    ignore_label: int = 255,
    scale: bool = True,
    mirror: bool = True,
    scale_min: float = SCALE_MIN,
    scale_steps: int = SCALE_STEPS,
):
    """Wire-minimal host augmentation: uint8 in, uint8 CROPS out.

    The mean-subtract/f32-widen happens on DEVICE (see
    :func:`finish_u8_crops`), so the host→device transfer is the 769² uint8
    crop (3.4× fewer bytes than a full-resolution uint8 image, 16× fewer
    than an f32 crop). Resizing runs on the uint8 image exactly like the
    reference (``dataset/datasets.py:157-161`` calls cv2.resize BEFORE the
    f32 conversion, rounding to uint8); the image pad value is the rounded
    mean so it lands at ≈0 after the on-device subtract (pad pixels carry
    label=ignore and no gradient either way).
    """
    import cv2

    ch, cw = crop_hw
    if scale:
        f = scale_min + SCALE_STEP * rng.randint(0, scale_steps)
        image = cv2.resize(image, None, fx=f, fy=f, interpolation=cv2.INTER_LINEAR)
        label = cv2.resize(label, None, fx=f, fy=f, interpolation=cv2.INTER_NEAREST)
    h, w = label.shape
    pad_h, pad_w = max(ch - h, 0), max(cw - w, 0)
    if pad_h or pad_w:
        pad_val = np.round(np.asarray(mean)).astype(np.uint8)
        image = np.stack(
            [np.pad(image[..., c], ((0, pad_h), (0, pad_w)),
                    constant_values=int(pad_val[c])) for c in range(3)], -1)
        label = np.pad(label, ((0, pad_h), (0, pad_w)),
                       constant_values=ignore_label)
    h, w = label.shape
    oy = rng.randint(0, h - ch + 1)
    ox = rng.randint(0, w - cw + 1)
    image = image[oy:oy + ch, ox:ox + cw]
    label = label[oy:oy + ch, ox:ox + cw]
    if mirror and rng.randint(0, 2):
        image = image[:, ::-1]
        label = label[:, ::-1]
    return np.ascontiguousarray(image), np.ascontiguousarray(label)


@functools.partial(jax.jit, static_argnames=("mean",))
def finish_u8_crops(images_u8, labels_u8, mean=CITYSCAPES_MEAN_BGR):
    """On-device tail of the u8-wire path: widen + mean-subtract."""
    imgs = images_u8.astype(jnp.float32) - jnp.asarray(mean, jnp.float32)
    return imgs, labels_u8.astype(jnp.int32)


def host_augment(
    image: np.ndarray,  # (H0, W0, 3) f32 BGR
    label: np.ndarray,  # (H0, W0) int
    rng: np.random.RandomState,
    crop_hw: Tuple[int, int] = (769, 769),
    mean=CITYSCAPES_MEAN_BGR,
    ignore_label: int = 255,
    scale: bool = True,
    mirror: bool = True,
    scale_min: float = SCALE_MIN,
    scale_steps: int = SCALE_STEPS,
):
    """Numpy/cv2 augmentation with the same semantics (for variable-size
    datasets like VOC, and as the comparison subject in tests)."""
    import cv2

    ch, cw = crop_hw
    if scale:
        f = scale_min + SCALE_STEP * rng.randint(0, scale_steps)
        image = cv2.resize(image, None, fx=f, fy=f, interpolation=cv2.INTER_LINEAR)
        label = cv2.resize(label.astype(np.uint8), None, fx=f, fy=f,
                           interpolation=cv2.INTER_NEAREST).astype(label.dtype)
    image = image.astype(np.float32) - np.asarray(mean, np.float32)
    h, w = label.shape
    pad_h, pad_w = max(ch - h, 0), max(cw - w, 0)
    if pad_h or pad_w:
        image = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)))
        label = np.pad(label, ((0, pad_h), (0, pad_w)), constant_values=ignore_label)
    h, w = label.shape
    oy = rng.randint(0, h - ch + 1)
    ox = rng.randint(0, w - cw + 1)
    image = image[oy:oy + ch, ox:ox + cw]
    label = label[oy:oy + ch, ox:ox + cw]
    if mirror and rng.randint(0, 2):
        image = image[:, ::-1]
        label = label[:, ::-1]
    return np.ascontiguousarray(image), np.ascontiguousarray(label)
