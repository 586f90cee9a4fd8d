"""DSN training criteria: main + 0.4·aux deep supervision.

Mirrors the reference's three criteria (``loss/criterion.py:11,37,59``); each
bilinearly upsamples the OS-8 logits to label resolution with
align_corners=True before the pixel loss (reference ``loss/criterion.py:26``).

The criterion is a pure function of (model outputs, labels) — it does NOT
live inside the model like the reference's (``networks/ccnet.py:188-189``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ccnet_tpu.losses.cross_entropy import softmax_cross_entropy_ignore
from ccnet_tpu.losses.lovasz import lovasz_softmax
from ccnet_tpu.losses.ohem import ohem_cross_entropy
from ccnet_tpu.ops.resize import resize_bilinear_align_corners


def _upsample(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return resize_bilinear_align_corners(
        logits.astype(jnp.float32), (labels.shape[1], labels.shape[2])
    )


def criterion_dsn(outputs: Dict[str, jnp.ndarray], labels: jnp.ndarray, ignore_label: int = 255) -> jnp.ndarray:
    """CE(main) + 0.4·CE(aux)."""
    loss1 = softmax_cross_entropy_ignore(_upsample(outputs["main"], labels), labels, ignore_label)
    loss2 = softmax_cross_entropy_ignore(_upsample(outputs["aux"], labels), labels, ignore_label)
    return loss1 + 0.4 * loss2


def criterion_ohem_dsn(
    outputs: Dict[str, jnp.ndarray],
    labels: jnp.ndarray,
    ignore_label: int = 255,
    thresh: float = 0.7,
    min_kept: int = 100000,
) -> jnp.ndarray:
    """OHEM-CE(main) + 0.4·CE(aux)."""
    loss1 = ohem_cross_entropy(_upsample(outputs["main"], labels), labels, ignore_label, thresh, min_kept)
    loss2 = softmax_cross_entropy_ignore(_upsample(outputs["aux"], labels), labels, ignore_label)
    return loss1 + 0.4 * loss2


def criterion_ohem_dsn2(
    outputs: Dict[str, jnp.ndarray],
    labels: jnp.ndarray,
    ignore_label: int = 255,
) -> jnp.ndarray:
    """CE(main) + Lovász-softmax(main)."""
    up = _upsample(outputs["main"], labels)
    loss1 = softmax_cross_entropy_ignore(up, labels, ignore_label)
    loss2 = lovasz_softmax(jax.nn.softmax(up, axis=-1), labels, ignore_label)
    return loss1 + loss2


def build_criterion(
    ohem: bool = False,
    use_lovasz: bool = False,
    ignore_label: int = 255,
    thresh: float = 0.7,
    min_kept: int = 100000,
) -> Callable:
    """Criterion factory matching the reference's train-time selection
    (``train.py:168-171``)."""
    if use_lovasz:
        return partial(criterion_ohem_dsn2, ignore_label=ignore_label)
    if ohem:
        return partial(
            criterion_ohem_dsn, ignore_label=ignore_label, thresh=thresh, min_kept=min_kept
        )
    return partial(criterion_dsn, ignore_label=ignore_label)
