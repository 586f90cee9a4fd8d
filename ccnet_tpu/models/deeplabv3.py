"""DeepLabv3 head variant: atrous spatial pyramid pooling (ASPP).

Spec (reference ``networks/deeplabv3.py:62-101,125-126``): image-pool branch
(global avg pool → 1×1 conv 2048→256 + ABN → align-corners upsample), a 1×1
branch, three 3×3 branches at dilations (12, 24, 36), all 2048→256 no-bias +
ABN(leaky 0.01); concat (5·256) → 1×1 bottleneck →512 + ABN + Dropout(0.1),
then a 1×1 classifier. Same DSN aux head as CCNet.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from ccnet_tpu.models.backbone import DilatedResNet
from ccnet_tpu.models.ccnet import DSNHead
from ccnet_tpu.nn.layers import ABN, Conv
from ccnet_tpu.ops.resize import resize_bilinear_align_corners


class ASPPModule(nn.Module):
    inner_features: int = 256
    out_features: int = 512
    dilations: tuple = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        dt, ic = self.dtype, self.inner_features

        pool = jnp.mean(x, axis=(1, 2), keepdims=True)
        pool = Conv(ic, (1, 1), use_bias=False, dtype=dt, name="image_pool_conv")(pool)
        pool = ABN(ic, "leaky_relu", dtype=dt, name="image_pool_bn")(pool, train)
        feat1 = resize_bilinear_align_corners(pool, (h, w))

        feat2 = ABN(ic, "leaky_relu", dtype=dt, name="conv1x1_bn")(
            Conv(ic, (1, 1), use_bias=False, dtype=dt, name="conv1x1")(x), train)
        branches = [feat1, feat2]
        for i, d in enumerate(self.dilations):
            b = Conv(ic, (3, 3), padding=d, dilation=d, use_bias=False, dtype=dt, name=f"atrous{i}_conv")(x)
            b = ABN(ic, "leaky_relu", dtype=dt, name=f"atrous{i}_bn")(b, train)
            branches.append(b)

        out = jnp.concatenate(branches, axis=-1)
        out = Conv(self.out_features, (1, 1), use_bias=False, dtype=dt, name="bottleneck_conv")(out)
        out = ABN(self.out_features, "leaky_relu", dtype=dt, name="bottleneck_bn")(out, train)
        out = nn.Dropout(0.1, deterministic=not train)(out)
        return out


class DeepLabV3(nn.Module):
    """ResNet-101 + ASPP head. Returns {'main', 'aux'} logits at OS 8."""

    num_classes: int = 19
    layers: tuple = (3, 4, 23, 3)
    remat: Any = False  # see DilatedResNet.remat
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        x3, x4 = DilatedResNet(self.layers, remat=self.remat, dtype=self.dtype, name="backbone")(x, train)
        aux = DSNHead(self.num_classes, dtype=self.dtype, name="dsn")(x3, train)
        feat = ASPPModule(dtype=self.dtype, name="aspp")(x4, train)
        main = Conv(self.num_classes, (1, 1), use_bias=True, dtype=self.dtype, name="classifier")(feat)
        return {"main": main.astype(jnp.float32), "aux": aux.astype(jnp.float32)}
