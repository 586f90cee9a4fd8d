"""Lovász-softmax loss (multi-class Jaccard surrogate) in pure JAX.

Implements the Lovász extension of the Jaccard index from the defining math
(Berman et al., CVPR 2018): per class, sort pixel errors ``|fg - p_c|``
descending and take the dot product with the gradient of the extension,
``g_i = J(i) - J(i-1)`` where ``J(i) = 1 - intersection_i / union_i`` over
the first ``i`` sorted pixels. Capability parity with the reference's
``loss/lovasz_losses.py:153-222`` (``classes='present'``, ``per_image``
flag, ignore label) — but static-shape: ignored pixels are folded in as
zero-error/zero-fg entries that sort to the tail and contribute nothing,
instead of a dynamic boolean gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lovasz_grad_from_sorted(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted (descending) errors."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1.0)
    # g_1 = J_1; g_i = J_i - J_{i-1}
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def _lovasz_softmax_flat(probas: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """probas (P, C) softmax outputs, labels (P,) int, valid (P,) bool."""
    P, C = probas.shape
    validf = valid.astype(jnp.float32)

    def per_class(c):
        fg = ((labels == c) & valid).astype(jnp.float32)
        errors = jnp.abs(fg - probas[:, c]) * validf  # ignored pixels -> 0
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        gt_sorted = fg[order]
        grad = _lovasz_grad_from_sorted(gt_sorted)
        loss_c = jnp.dot(errors_sorted, grad)
        present = jnp.sum(fg) > 0
        return loss_c, present

    losses, present = jax.vmap(per_class)(jnp.arange(C))
    presentf = present.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(presentf), 1.0)
    return jnp.sum(losses * presentf) / denom


def lovasz_softmax(
    probas: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_label: int = 255,
    per_image: bool = False,
) -> jnp.ndarray:
    """Lovász-softmax over 'present' classes.

    Args:
      probas: (B, H, W, C) softmax probabilities (NHWC).
      labels: (B, H, W) int labels.
    """
    B, H, W, C = probas.shape
    valid = labels != ignore_label

    if per_image:
        def one(p, l, v):
            return _lovasz_softmax_flat(p.reshape(-1, C), l.ravel(), v.ravel())

        return jnp.mean(jax.vmap(one)(probas, labels, valid))
    return _lovasz_softmax_flat(probas.reshape(-1, C), labels.ravel(), valid.ravel())
