"""Resize ops with exact parity to the reference's interpolation semantics.

The reference uses two distinct resize conventions that we must reproduce:

* ``torch.nn.functional.interpolate(..., mode='bilinear', align_corners=True)``
  for upsampling logits to label resolution (reference ``loss/criterion.py:26``,
  ``evaluate.py:103``): source coordinate ``src = dst * (in-1)/(out-1)``.
* ``cv2.resize(..., INTER_LINEAR / INTER_NEAREST)`` for data augmentation
  (reference ``dataset/datasets.py:158-160``): half-pixel-centre convention
  ``src = (dst + 0.5) * in/out - 0.5`` (linear) and ``src = floor(dst * in/out)``
  … cv2 nearest actually uses ``src = floor((dst + 0.5) * in/out)`` clamped —
  see :func:`resize_nearest_cv2`.

Everything here is pure ``jnp``, static-shape, and jit/grad friendly. The
implementation is gather + lerp along one axis at a time (separable), which XLA
lowers to efficient dynamic-gathers; for the common exact-ratio cases (e.g.
97→769 logits upsample) the weights are compile-time constants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lerp_weights_align_corners(in_size: int, out_size: int):
    """Source indices and weights for align_corners=True bilinear (1 axis)."""
    if out_size == 1:
        lo = jnp.zeros((1,), jnp.int32)
        hi = jnp.zeros((1,), jnp.int32)
        w = jnp.zeros((1,), jnp.float32)
        return lo, hi, w
    scale = (in_size - 1) / (out_size - 1)
    src = jnp.arange(out_size, dtype=jnp.float32) * scale
    lo = jnp.clip(jnp.floor(src), 0, in_size - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    w = src - lo.astype(jnp.float32)
    return lo, hi, w


def _lerp_weights_half_pixel(in_size: int, out_size: int):
    """Source indices/weights for cv2 INTER_LINEAR (half-pixel centres)."""
    scale = in_size / out_size
    src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.clip(jnp.floor(src), 0, in_size - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    w = src - lo.astype(jnp.float32)
    return lo, hi, w


def _resize_axis(x: jnp.ndarray, axis: int, lo, hi, w) -> jnp.ndarray:
    """Linear resize of one axis as ONE dense two-tap matmul.

    Equivalent to two gathers + a lerp with identical f32 numerics (each
    output row of the weight matrix holds exactly the two tap weights; the
    remaining terms multiply by 0.0 and add exactly), but the contraction
    lowers to an MXU matmul with a sane layout. The gather lowering is a
    layout hazard on TPU: inside the one-jit multi-scale eval program XLA
    chose a channels-minor T(4,128) layout for the gathered (B, H, W, 3)
    image, padding 37 MB of temps to 6.25 GB (170×) and OOMing the chip.
    """
    in_size = x.shape[axis]
    M = (jax.nn.one_hot(lo, in_size, dtype=jnp.float32) * (1.0 - w)[:, None]
         + jax.nn.one_hot(hi, in_size, dtype=jnp.float32) * w[:, None])
    xt = jnp.moveaxis(x, axis, -1).astype(jnp.float32)
    y = jnp.einsum("oi,...i->...o", M, xt, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(y, -1, axis).astype(x.dtype)


def _upsample_axis_int_ratio(x: jnp.ndarray, axis: int, r: int) -> jnp.ndarray:
    """Align-corners upsample of one axis by an exact integer factor —
    n → (n−1)·r + 1 — using slices + reshape instead of gathers.

    This is the hot path of the loss (OS-8 logits → 769² labels: r = 8,
    (8, 97, 97, 19) → (8, 769, 769, 19) every step, forward AND backward).
    The gather formulation's backward is a scatter-add that costs ~280 ms on
    a v5e; slicing/reshape differentiate to pad/slice and cost ~nothing.
    """
    n = x.shape[axis]
    if n == 1:
        reps = [1] * x.ndim
        return x  # degenerate: output size is 1 too
    x_lo = jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)
    x_hi = jax.lax.slice_in_dim(x, 1, n, axis=axis)
    w_shape = [1] * (x.ndim + 1)
    w_shape[axis + 1] = r
    w = (jnp.arange(r, dtype=jnp.float32) / r).astype(x.dtype).reshape(w_shape)
    seg = jnp.expand_dims(x_lo, axis + 1) * (1 - w) + jnp.expand_dims(x_hi, axis + 1) * w
    new_shape = list(x.shape)
    new_shape[axis] = (n - 1) * r
    flat = seg.reshape(new_shape)
    last = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
    return jnp.concatenate([flat, last], axis=axis)


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw, h_axis: int = 1) -> jnp.ndarray:
    """Bilinear resize with torch's align_corners=True convention.

    Integer upsample ratios ((out−1) divisible by (in−1), the OS-8 logits
    case) take a strided slice/reshape path; everything else uses gathers.

    Args:
      x: array with spatial dims at ``(h_axis, h_axis+1)`` — e.g. NHWC with
        ``h_axis=1``.
      out_hw: (out_h, out_w) static ints.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    in_h, in_w = x.shape[h_axis], x.shape[h_axis + 1]
    if (in_h, in_w) == (out_h, out_w):
        return x

    def one_axis(x, axis, in_size, out_size):
        if out_size > in_size > 1 and (out_size - 1) % (in_size - 1) == 0:
            return _upsample_axis_int_ratio(x, axis, (out_size - 1) // (in_size - 1))
        lo, hi, w = _lerp_weights_align_corners(in_size, out_size)
        return _resize_axis(x, axis, lo, hi, w)

    if in_h != out_h:
        x = one_axis(x, h_axis, in_h, out_h)
    if in_w != out_w:
        x = one_axis(x, h_axis + 1, in_w, out_w)
    return x


def resize_bilinear_cv2(x: jnp.ndarray, out_hw, h_axis: int = 1) -> jnp.ndarray:
    """Bilinear resize with cv2.resize INTER_LINEAR (half-pixel) convention."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    in_h, in_w = x.shape[h_axis], x.shape[h_axis + 1]
    if (in_h, in_w) == (out_h, out_w):
        return x
    if in_h != out_h:
        lo, hi, w = _lerp_weights_half_pixel(in_h, out_h)
        x = _resize_axis(x, h_axis, lo, hi, w)
    if in_w != out_w:
        lo, hi, w = _lerp_weights_half_pixel(in_w, out_w)
        x = _resize_axis(x, h_axis + 1, lo, hi, w)
    return x


def resize_nearest_cv2(x: jnp.ndarray, out_hw, h_axis: int = 1) -> jnp.ndarray:
    """Nearest resize matching cv2.resize INTER_NEAREST.

    cv2's INTER_NEAREST picks ``src = floor(dst * in/out)`` (it truncates the
    half-pixel offset), which is what ``scipy.ndimage.zoom(order=0)`` does NOT
    do — we match cv2 because the reference's label augmentation used cv2
    (``dataset/datasets.py:160``).
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    in_h, in_w = x.shape[h_axis], x.shape[h_axis + 1]

    def idx(in_size, out_size):
        src = jnp.floor(jnp.arange(out_size, dtype=jnp.float32) * (in_size / out_size))
        return jnp.clip(src, 0, in_size - 1).astype(jnp.int32)

    if in_h != out_h:
        x = jnp.take(x, idx(in_h, out_h), axis=h_axis)
    if in_w != out_w:
        x = jnp.take(x, idx(in_w, out_w), axis=h_axis + 1)
    return x
