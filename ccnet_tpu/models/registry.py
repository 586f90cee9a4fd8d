"""Model registry — explicit name→builder mapping.

Replaces the reference's ``eval('networks.' + args.model + '.Seg_Model')``
string-eval dispatch (reference ``train.py:175``) with a plain registry.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ccnet_tpu.models.ccnet import CCNet
from ccnet_tpu.models.deeplabv3 import DeepLabV3
from ccnet_tpu.models.pspnet import PSPNet

_DEPTH_LAYERS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def build_model(
    name: str,
    num_classes: int = 19,
    recurrence: int = 2,
    depth: int = 101,
    dtype: Any = jnp.float32,
    impl: str = "auto",
    remat: Any = False,
):
    """Build a segmentation model by name: 'ccnet' | 'pspnet' | 'deeplabv3'."""
    layers = _DEPTH_LAYERS[depth]
    if name == "ccnet":
        return CCNet(num_classes=num_classes, layers=layers, recurrence=recurrence,
                     impl=impl, dtype=dtype, remat=remat)
    if name == "pspnet":
        return PSPNet(num_classes=num_classes, layers=layers, dtype=dtype, remat=remat)
    if name == "deeplabv3":
        return DeepLabV3(num_classes=num_classes, layers=layers, dtype=dtype, remat=remat)
    raise ValueError(f"unknown model {name!r}; available: ccnet, pspnet, deeplabv3")
