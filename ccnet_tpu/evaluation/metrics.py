"""Segmentation metrics: confusion matrix and IoU.

Same math as the reference's bincount trick (``evaluate.py:177-195``) and
IoU formula ``tp / (pos + res − tp)`` (``evaluate.py:269-273``), on device.
``ConfusionAccumulator.result`` sums the per-process matrices with one
cross-process gather when ``jax.distributed`` is live — the TPU equivalent
of the reference's NCCL confusion-matrix all-reduce (``evaluate.py:267-268``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(labels, preds, num_classes: int, ignore_label: int = 255):
    """(C, C) confusion matrix [gt, pred] over non-ignored pixels (jnp)."""
    # int32 BEFORE the index arithmetic: uint8 labels (the wire-minimal
    # eval path) would overflow labels * num_classes + preds
    labels = labels.reshape(-1).astype(jnp.int32)
    preds = preds.reshape(-1).astype(jnp.int32)
    valid = labels != ignore_label
    idx = jnp.where(valid, labels * num_classes + preds, num_classes * num_classes)
    counts = jnp.bincount(idx, length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes)


def iou_from_confusion(cm: np.ndarray) -> Tuple[np.ndarray, float]:
    """Per-class IoU and mean IoU from a confusion matrix [gt, pred]."""
    cm = np.asarray(cm, np.float64)
    pos = cm.sum(1)
    res = cm.sum(0)
    tp = np.diag(cm)
    denom = np.maximum(pos + res - tp, 1.0)
    iu = tp / denom
    present = pos > 0
    mean_iu = float(iu[present].mean()) if present.any() else 0.0
    return iu, mean_iu


def cross_process_sum(cm: np.ndarray) -> np.ndarray:
    """Sum a host-local matrix over all ``jax.distributed`` processes.

    Every process must call this (it is a collective). Identity when a
    single process is running. Replaces the reference's NCCL all-reduce of
    the eval confusion matrix (``evaluate.py:267-268``).
    """
    if jax.process_count() == 1:
        return np.asarray(cm)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(cm))
    return np.asarray(gathered).sum(axis=0)


class ConfusionAccumulator:
    """Accumulates a confusion matrix across batches (on device)."""

    def __init__(self, num_classes: int, ignore_label: int = 255):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.cm = jnp.zeros((num_classes, num_classes), jnp.int32)
        self._update = jax.jit(
            lambda cm, labels, preds: cm
            + confusion_matrix(labels, preds, num_classes, ignore_label)
        )

    def update(self, labels, preds):
        self.cm = self._update(self.cm, labels, preds)

    def global_matrix(self) -> np.ndarray:
        """The confusion matrix summed over all processes (collective)."""
        return cross_process_sum(np.asarray(self.cm))

    def result(self, cross_process: bool = True) -> Tuple[np.ndarray, float]:
        cm = self.global_matrix() if cross_process else np.asarray(self.cm)
        return iou_from_confusion(cm)
