"""PSPNet head variant: pyramid scene parsing pooling over the dilated trunk.

Spec (reference ``networks/pspnet.py:62-88,112-113``): adaptive-avg-pool
pyramid at sizes (1, 2, 3, 6), each stage 1×1 conv 2048→512 (no bias) +
ABN(leaky 0.01), bilinear align-corners upsample back to feature size,
concat with the trunk feature, 3×3 bottleneck 2048+4·512→512 + ABN +
Dropout(0.1), then a 1×1 classifier. Same DSN aux head as CCNet.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from ccnet_tpu.models.backbone import DilatedResNet
from ccnet_tpu.models.ccnet import DSNHead
from ccnet_tpu.nn.layers import ABN, Conv
from ccnet_tpu.ops.pooling import adaptive_avg_pool
from ccnet_tpu.ops.resize import resize_bilinear_align_corners


class PSPModule(nn.Module):
    out_features: int = 512
    sizes: tuple = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        dt = self.dtype
        priors = []
        for i, size in enumerate(self.sizes):
            p = adaptive_avg_pool(x, (size, size))
            p = Conv(self.out_features, (1, 1), use_bias=False, dtype=dt, name=f"stage{i}_conv")(p)
            p = ABN(self.out_features, "leaky_relu", dtype=dt, name=f"stage{i}_bn")(p, train)
            priors.append(resize_bilinear_align_corners(p, (h, w)))
        priors.append(x)
        out = jnp.concatenate(priors, axis=-1)
        out = Conv(self.out_features, (3, 3), padding=1, use_bias=False, dtype=dt, name="bottleneck_conv")(out)
        out = ABN(self.out_features, "leaky_relu", dtype=dt, name="bottleneck_bn")(out, train)
        out = nn.Dropout(0.1, deterministic=not train)(out)
        return out


class PSPNet(nn.Module):
    """ResNet-101 + PSP head. Returns {'main', 'aux'} logits at OS 8."""

    num_classes: int = 19
    layers: tuple = (3, 4, 23, 3)
    remat: Any = False  # see DilatedResNet.remat
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        x3, x4 = DilatedResNet(self.layers, remat=self.remat, dtype=self.dtype, name="backbone")(x, train)
        aux = DSNHead(self.num_classes, dtype=self.dtype, name="dsn")(x3, train)
        feat = PSPModule(dtype=self.dtype, name="psp")(x4, train)
        main = Conv(self.num_classes, (1, 1), use_bias=True, dtype=self.dtype, name="classifier")(feat)
        return {"main": main.astype(jnp.float32), "aux": aux.astype(jnp.float32)}
