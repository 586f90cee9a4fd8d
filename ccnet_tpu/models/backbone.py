"""Deep-stem dilated ResNet backbone (output stride 8), NHWC.

Geometry matches the reference exactly so ImageNet/CCNet ``.pth`` weights
convert 1:1 (reference ``networks/ccnet.py:125-173``):

* deep stem: three 3×3 convs (3→64 s2, 64→64, 64→128), BN(identity)+ReLU
  each, then 3×3/s2 ceil-mode maxpool;
* layers [3, 4, 23, 3] of ``Bottleneck`` (expansion 4);
* layer3 at stride 1 / dilation 2, layer4 at stride 1 / dilation 4 with
  multi_grid (1, 1, 1) → output stride 8;
* exposes the layer3 feature for the DSN auxiliary head
  (reference ``networks/ccnet.py:149-154,183``).

Param tree names mirror torch attribute names (``conv1``, ``bn1``,
``layer1_0`` ↔ ``layer1.0``, ``downsample_conv`` ↔ ``downsample.0``) so the
checkpoint converter is a mechanical rename.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ccnet_tpu.nn.layers import ABN, Conv
from ccnet_tpu.ops.pooling import max_pool_ceil


def relu(x):
    return jnp.maximum(x, 0)


class Bottleneck(nn.Module):
    """ResNet bottleneck, expansion 4, optional dilation + multi-grid."""

    planes: int
    stride: int = 1
    dilation: int = 1
    multi_grid: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dilation * self.multi_grid
        out = Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        # named so a remat policy can pin the conv results (the FLOPs) in HBM
        # while still rematerialising the cheap BN/ReLU elementwise chain;
        # conv1/conv2 results are 4× smaller than conv3's, hence two names
        out = checkpoint_name(out, "conv12_out")
        out = relu(ABN(self.planes, "identity", dtype=self.dtype, name="bn1")(out, train))
        out = Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride), padding=d,
            dilation=d, use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = checkpoint_name(out, "conv12_out")
        out = relu(ABN(self.planes, "identity", dtype=self.dtype, name="bn2")(out, train))
        out = Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = checkpoint_name(out, "conv3_out")
        out = ABN(self.planes * 4, "identity", dtype=self.dtype, name="bn3")(out, train)

        residual = x
        if self.has_downsample:
            residual = Conv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = ABN(self.planes * 4, "identity", dtype=self.dtype, name="downsample_bn")(
                residual, train
            )
        return relu(out + residual)


class DilatedResNet(nn.Module):
    """Deep-stem dilated ResNet trunk; returns (layer3_out, layer4_out).

    ``remat`` checkpoints bottleneck blocks (recompute-in-backward), trading
    extra FLOPs for O(depth) less activation HBM — the TPU recipe for fitting
    769² × batch-8 training on a 16 GB chip. ``True`` remats the tuned
    default (layers 3–4 — they hold ~80% of saved activations; measured 2–6%
    faster than remat-everything); a tuple of layer indices remats exactly
    those; ``False`` disables. The string modes use a remat *policy* on
    layers 3–4 that keeps named conv results resident and rematerialises only
    the cheap BN/ReLU elementwise chain — the backward pass then skips the
    conv recompute (the FLOPs) at a modest activation-memory cost:
    ``"conv12"`` pins the 1×1-reduce and 3×3 conv results (¾ of the recompute
    FLOPs, ¼ of the full no-remat memory); ``"convs"`` additionally pins the
    4×-wider conv3 results (no conv recompute at all).
    """

    layers: Sequence[int] = (3, 4, 23, 3)  # ResNet-101
    remat: Any = False  # False | True (= layers 3,4) | 'conv12' | 'convs' | tuple
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        dt = self.dtype
        x = x.astype(dt)
        x = relu(ABN(64, "identity", dtype=dt, name="bn1")(
            Conv(64, (3, 3), strides=(2, 2), padding=1, use_bias=False, dtype=dt, name="conv1")(x), train))
        x = relu(ABN(64, "identity", dtype=dt, name="bn2")(
            Conv(64, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv2")(x), train))
        x = relu(ABN(128, "identity", dtype=dt, name="bn3")(
            Conv(128, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv3")(x), train))
        x = max_pool_ceil(x, 3, 2, 1)

        specs = [  # (planes, stride, dilation, multi_grid tuple)
            (64, 1, 1, None),
            (128, 2, 1, None),
            (256, 1, 2, None),
            (512, 1, 4, (1, 1, 1)),
        ]
        inplanes = 128
        feats = {}
        policy = None
        if self.remat is True:
            remat_layers = {3, 4}
        elif not self.remat:
            remat_layers = set()
        elif self.remat == "conv12":
            remat_layers = {3, 4}
            policy = jax.checkpoint_policies.save_only_these_names("conv12_out")
        elif self.remat == "convs":
            remat_layers = {3, 4}
            policy = jax.checkpoint_policies.save_only_these_names(
                "conv12_out", "conv3_out"
            )
        else:
            remat_layers = set(self.remat)
        remat_cls = nn.remat(Bottleneck, static_argnums=(2,), policy=policy)
        for li, ((planes, stride, dilation, grids), blocks) in enumerate(zip(specs, self.layers), start=1):
            block_cls = remat_cls if li in remat_layers else Bottleneck
            for bi in range(blocks):
                mg = grids[bi % len(grids)] if grids else 1
                has_ds = bi == 0 and (stride != 1 or inplanes != planes * 4)
                x = block_cls(
                    planes,
                    stride=stride if bi == 0 else 1,
                    dilation=dilation,
                    multi_grid=mg,
                    has_downsample=has_ds,
                    dtype=dt,
                    name=f"layer{li}_{bi}",
                )(x, train)
                inplanes = planes * 4
            feats[li] = x
        return feats[3], feats[4]
