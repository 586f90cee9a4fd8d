"""Lovász losses (Jaccard surrogates) in pure JAX.

Implements the Lovász extension of the Jaccard index from the defining math
(Berman et al., CVPR 2018): sort pixel errors descending and take the dot
product with the gradient of the extension, ``g_i = J(i) - J(i-1)`` where
``J(i) = 1 - intersection_i / union_i`` over the first ``i`` sorted pixels.

Covers the reference's full ``loss/lovasz_losses.py`` public surface:
multi-class ``lovasz_softmax`` (``:153-222``; ``classes='present'``,
``per_image``, ignore label) and the binary family (``:18-150``):
``lovasz_hinge`` / ``lovasz_hinge_flat`` / ``flatten_binary_scores``,
stable ``binary_xloss``, and the ``iou_binary``/``iou`` metrics.

TPU twist — everything is static-shape: instead of dynamically gathering
valid pixels, ignored entries are folded in with sentinel errors that sort
to the tail and contribute nothing (exact, because only strictly-positive
errors contribute and prefix statistics are unaffected by tail entries).
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


# ------------------------------------------------------- binary (hinge) ---


def flatten_binary_scores(scores: jnp.ndarray, labels: jnp.ndarray,
                          ignore: int | None = None):
    """Flatten predictions + {0,1} labels, returning a validity mask instead
    of dynamically removing ignored pixels (static-shape equivalent of the
    reference ``loss/lovasz_losses.py:97-108``)."""
    scores = scores.reshape(-1)
    labels = labels.reshape(-1)
    valid = jnp.ones_like(labels, dtype=bool) if ignore is None else labels != ignore
    return scores, labels, valid


def lovasz_hinge_flat(logits: jnp.ndarray, labels: jnp.ndarray,
                      valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Binary Lovász hinge on flat (P,) logits / {0,1} labels.

    ``errors = 1 − logit·sign`` sorted descending, dotted with the Lovász
    gradient; only errors > 0 contribute (relu), so ignored pixels are given
    a −∞ sentinel error that sorts them to the tail exactly.
    """
    logits = logits.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones_like(logits, dtype=bool)
    signs = 2.0 * labels.astype(jnp.float32) - 1.0
    errors = 1.0 - logits * signs
    errors = jnp.where(valid, errors, -jnp.inf)
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    gt_sorted = (labels.astype(jnp.float32) * valid.astype(jnp.float32))[order]
    grad = _lovasz_grad_from_sorted(gt_sorted)
    # empty image (no valid pixel) -> 0, matching the reference's
    # `if len(labels)==0: return logits.sum()*0.` guard
    any_valid = jnp.any(valid)
    loss = jnp.dot(jnp.maximum(errors_sorted, 0.0)
                   * jnp.isfinite(errors_sorted).astype(jnp.float32), grad)
    return jnp.where(any_valid, loss, 0.0)


def lovasz_hinge(logits: jnp.ndarray, labels: jnp.ndarray,
                 per_image: bool = True, ignore: int | None = None) -> jnp.ndarray:
    """Binary Lovász hinge over (B, H, W) logits / {0,1} labels
    (reference ``loss/lovasz_losses.py:64-80``)."""
    if per_image:
        def one(lg, lb):
            return lovasz_hinge_flat(*flatten_binary_scores(lg, lb, ignore))

        return jnp.mean(jax.vmap(one)(logits, labels))
    return lovasz_hinge_flat(*flatten_binary_scores(logits, labels, ignore))


def binary_xloss(logits: jnp.ndarray, labels: jnp.ndarray,
                 ignore: int | None = None) -> jnp.ndarray:
    """Numerically-stable binary cross-entropy with logits over valid pixels
    (reference ``StableBCELoss``/``binary_xloss``, ``loss/lovasz_losses.py:111-132``)."""
    logits, labels, valid = flatten_binary_scores(logits, labels, ignore)
    x = logits.astype(jnp.float32)
    y = labels.astype(jnp.float32)
    per = jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    vf = valid.astype(jnp.float32)
    return jnp.sum(per * vf) / jnp.maximum(jnp.sum(vf), 1.0)


# ------------------------------------------------------------ IoU metrics ---


def iou_binary(preds, labels, EMPTY: float = 1.0, ignore: int | None = None,
               per_image: bool = True) -> float:
    """Binary IoU ×100 (reference ``loss/lovasz_losses.py:31-44``)."""
    import numpy as np

    preds = np.asarray(preds)
    labels = np.asarray(labels)
    if not per_image:
        preds, labels = preds[None], labels[None]
    ious = []
    for p, l in zip(preds, labels):
        v = np.ones(l.shape, bool) if ignore is None else l != ignore
        inter = np.sum((l == 1) & (p == 1) & v)
        union = np.sum(((l == 1) | (p == 1)) & v)
        ious.append(EMPTY if union == 0 else inter / union)
    return 100.0 * float(np.mean(ious))


def iou(preds, labels, C: int, EMPTY: float = 1.0, ignore: int | None = None,
        per_image: bool = False):
    """Mean per-class IoU ×100 (reference ``loss/lovasz_losses.py:46-60``)."""
    import numpy as np

    preds = np.asarray(preds)
    labels = np.asarray(labels)
    if not per_image:
        preds, labels = preds[None], labels[None]
    per = []
    for p, l in zip(preds, labels):
        v = np.ones(l.shape, bool) if ignore is None else l != ignore
        row = []
        for c in range(C):
            if ignore is not None and c == ignore:
                continue
            inter = np.sum((l == c) & (p == c) & v)
            union = np.sum(((l == c) | (p == c)) & v)
            row.append(EMPTY if union == 0 else inter / union)
        per.append(row)
    return [100.0 * float(x) for x in np.mean(np.asarray(per), axis=0)]
