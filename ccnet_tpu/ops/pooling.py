"""Pooling ops matching the reference's torch semantics (NHWC).

* :func:`max_pool_ceil` — ``nn.MaxPool2d(3, 2, padding=1, ceil_mode=True)``
  (reference ``networks/ccnet.py:141``). ceil_mode may require one extra row /
  column of (ignored, -inf) padding on the bottom/right.
* :func:`adaptive_avg_pool` — ``nn.AdaptiveAvgPool2d((s, s))`` used by the PSP
  pyramid (reference ``networks/pspnet.py:79``) and the ASPP image branch.
  Torch's adaptive pooling averages over bin ``[floor(i*in/out),
  ceil((i+1)*in/out))`` — reproduced exactly with a matmul against
  precomputed (static-shape) bin-membership weights, which is also the
  MXU-friendly lowering.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def max_pool_ceil(x: jnp.ndarray, window: int = 3, stride: int = 2, padding: int = 1) -> jnp.ndarray:
    """Max pool with torch ceil_mode=True semantics, NHWC."""
    _, h, w, _ = x.shape

    def out_size(n):
        return int(math.ceil((n + 2 * padding - window) / stride)) + 1

    oh, ow = out_size(h), out_size(w)
    # padding needed on the trailing side so that reduce_window covers ceil bins
    pad_h_hi = (oh - 1) * stride + window - h - padding
    pad_w_hi = (ow - 1) * stride + window - w - padding
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, max(pad_h_hi, 0)), (padding, max(pad_w_hi, 0)), (0, 0)),
    )


def _adaptive_bin_weights(in_size: int, out_size: int) -> np.ndarray:
    """(in_size, out_size) averaging matrix for torch adaptive avg pooling."""
    w = np.zeros((in_size, out_size), np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = int(math.ceil((i + 1) * in_size / out_size))
        w[lo:hi, i] = 1.0 / (hi - lo)
    return w


def adaptive_avg_pool(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Adaptive average pool to (out_h, out_w), NHWC, exact torch binning."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    _, h, w, _ = x.shape
    wh = jnp.asarray(_adaptive_bin_weights(h, out_h), x.dtype)
    ww = jnp.asarray(_adaptive_bin_weights(w, out_w), x.dtype)
    x = jnp.einsum("bhwc,hk->bkwc", x, wh)
    x = jnp.einsum("bkwc,wl->bklc", x, ww)
    return x
