"""Pixel cross-entropy with an ignore label.

Matches ``torch.nn.CrossEntropyLoss(ignore_index=255, reduction='mean')`` as
used throughout the reference (``loss/criterion.py:18``): mean of per-pixel
NLL over non-ignored pixels. Fully on-device, static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``values`` over ``mask`` (0 if nothing is selected).

    The one masked-mean convention every loss in the package shares.
    """
    mask = mask.astype(jnp.float32)
    total = jnp.sum(values * mask)
    count = jnp.sum(mask)
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


def softmax_cross_entropy_ignore(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_label: int = 255,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean masked CE. logits: (..., C) float; labels: (...) int.

    Args:
      weights: optional extra per-pixel weight/mask multiplied into the
        validity mask (used by OHEM to drop non-selected pixels).
    Returns scalar f32 loss (0 if nothing is valid).
    """
    logits = logits.astype(jnp.float32)
    valid = (labels != ignore_label)
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot contraction instead of take_along_axis: the gather's backward
    # is a scatter-add over (pixels, C) which costs ~100s of ms at 769² on
    # TPU; the one-hot multiply differentiates to a broadcast.
    onehot = jax.nn.one_hot(safe, logits.shape[-1], dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    mask = valid.astype(jnp.float32)
    if weights is not None:
        mask = mask * weights.astype(jnp.float32)
    return masked_mean(nll, mask)
