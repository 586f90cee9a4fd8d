"""CCNet: dilated ResNet-101 + recurrent criss-cross attention (RCCA) head.

Behavioural spec from the reference:

* ``CrissCrossAttention`` module — 1×1 q/k convs to C/8, 1×1 v conv to C,
  joint row+column softmax attention, zero-initialised scalar ``gamma`` gate,
  residual add (reference ``cc_attention/functions.py:15-49``). At init the
  module is an identity.
* ``RCCAModule`` — 3×3 conv 2048→512 + ABN(leaky 0.01), CCA applied
  ``recurrence`` times with shared weights, 3×3 conv + ABN, then a bottleneck
  over ``concat([trunk, attended])`` (2560→512) + ABN + Dropout(0.1) + 1×1
  classifier (reference ``networks/ccnet.py:99-123``).
* DSN auxiliary head off layer3: 3×3 1024→512 (with bias) + ABN + Dropout +
  1×1 classifier (reference ``networks/ccnet.py:149-154``).

Unlike the reference, the loss criterion does NOT live inside the model — the
model returns logits, training composes the loss (fixes the layering quirk at
reference ``networks/ccnet.py:188-189``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ccnet_tpu.models.backbone import DilatedResNet
from ccnet_tpu.nn.layers import ABN, Conv, torch_conv_init
from ccnet_tpu.ops.cc_attention import criss_cross_attention as cca_jnp

# 'auto' switches to the fused Pallas kernel once the attended-axis length
# H+W reaches this. Routing is decided by IN-GRAPH measurements of the full
# product programs, not the standalone kernel microbench: at the flagship
# shapes the standalone kernel wins narrowly (97²: fwd+bwd 4.29 vs 4.58 ms,
# scripts/bench_cca.py) but the jnp route wins the programs that contain it
# — XLA fuses its elementwise/softmax chain with the surrounding convs and
# avoids layout transitions around the custom call (v5e, 2026-08-19,
# median-of-3: R101 train step 0.3200 vs 0.3320 s; sliding eval 0.0821 vs
# 0.0839 s/img; whole-image 1024×2048 fwd 0.0397 vs 0.0415 s — jnp wins all
# three; this 12 ms/step was the whole BENCH r03→r04 headline drift). At
# long-context shapes the kernel's margin is structural and decisive
# (513²: 28.7 vs 38.3 ms fwd+bwd standalone; 769²: 49.2 vs 103.4, where the
# jnp path also writes ~3.6 GB of HBM affinity temps per image that the
# kernel never materialises — and OOMs first), so those route to the
# kernel. 512 sits between the largest measured-jnp-faster product shape
# (whole-image 128+256=384) and the smallest measured-kernel-dominant one
# (513+513=1026).
_CCA_PALLAS_MIN_AXIS_SUM = 512


def choose_cca_impl(batch: int, height: int, width: int) -> str:
    """'auto' resolution: 'pallas' past the measured attended-axis crossover.

    Off-TPU the jnp path is the reference. On TPU the decision is the
    joint-softmax axis length H+W (batch-independent — measured at batch 1
    and 8). Under a mesh the kernel runs per-shard through its batch-dim
    ``custom_partitioning`` rule, so the choice needs no mesh awareness.
    """
    from ccnet_tpu.utils.platform import is_tpu_backend

    if not is_tpu_backend():
        return "jnp"
    return "pallas" if height + width >= _CCA_PALLAS_MIN_AXIS_SUM else "jnp"


class CrissCrossAttention(nn.Module):
    """Criss-cross attention with q/k/v projections and gamma-gated residual."""

    features: int
    impl: str = "auto"  # 'jnp' | 'pallas' | 'auto'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.features
        q = Conv(c // 8, (1, 1), dtype=self.dtype, name="query_conv")(x)
        k = Conv(c // 8, (1, 1), dtype=self.dtype, name="key_conv")(x)
        v = Conv(c, (1, 1), dtype=self.dtype, name="value_conv")(x)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)

        impl = self.impl
        if impl == "auto":
            impl = choose_cca_impl(q.shape[0], q.shape[1], q.shape[2])
            if impl == "pallas":
                try:
                    import ccnet_tpu.ops.cc_attention_pallas  # noqa: F401
                except ImportError:
                    impl = "jnp"
        if impl == "pallas":
            from ccnet_tpu.ops.cc_attention_pallas import criss_cross_attention_pallas

            # Honor strict-f32 runs (--fp32 sets jax_default_matmul_precision
            # = 'highest'): the kernel's dots need the explicit attribute —
            # the global config does not reach inside pallas_call, where
            # default precision multiplies even f32 operands as bf16.
            prec = ("highest"
                    if jax.config.jax_default_matmul_precision in ("highest", "float32")
                    else "default")
            out = criss_cross_attention_pallas(q, k, v, precision=prec)
        else:
            out = cca_jnp(q, k, v)
        return gamma.astype(x.dtype) * out + x


class _ConcatConv(nn.Module):
    """3×3 conv over the channel-concat of two inputs, without the concat.

    ``conv(cat([a, b]), W) == conv(a, W[:, :, :Ca]) + conv(b, W[:, :, Ca:])``
    exactly — splitting skips materialising the (B, H, W, Ca+Cb) tensor
    (385 MB at the bench shape; the concat fusion alone profiled at ~10 ms/
    step, ~10× off the HBM bound). The parameter keeps the reference's
    single fused shape/name (``head.bottleneck.0.weight``,
    reference ``networks/ccnet.py:109-111``) so ``.pth`` conversion is
    unchanged.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        ca, cb = a.shape[-1], b.shape[-1]
        kernel = self.param(
            "weight", torch_conv_init, (3, 3, ca + cb, self.features), jnp.float32
        )

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), k.astype(self.dtype), (1, 1),
                [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        return conv(a, kernel[:, :, :ca]) + conv(b, kernel[:, :, ca:])


class RCCAModule(nn.Module):
    """Recurrent criss-cross head: conva → CCA×R (shared) → convb → bottleneck."""

    num_classes: int
    in_channels: int = 2048
    out_channels: int = 512
    recurrence: int = 2
    impl: str = "auto"
    drop_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = self.in_channels // 4
        dt = self.dtype
        out = Conv(inter, (3, 3), padding=1, use_bias=False, dtype=dt, name="conva_conv")(x)
        out = ABN(inter, "leaky_relu", dtype=dt, name="conva_bn")(out, train)
        cca = CrissCrossAttention(inter, impl=self.impl, dtype=dt, name="cca")
        for _ in range(self.recurrence):
            out = cca(out)  # shared weights across recurrence steps
        out = Conv(inter, (3, 3), padding=1, use_bias=False, dtype=dt, name="convb_conv")(out)
        out = ABN(inter, "leaky_relu", dtype=dt, name="convb_bn")(out, train)

        out = _ConcatConv(self.out_channels, dtype=dt, name="bottleneck_conv")(x, out)
        out = ABN(self.out_channels, "leaky_relu", dtype=dt, name="bottleneck_bn")(out, train)
        out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        out = Conv(self.num_classes, (1, 1), use_bias=True, dtype=dt, name="classifier")(out)
        return out


class DSNHead(nn.Module):
    """Deeply-supervised auxiliary head off layer3."""

    num_classes: int
    drop_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        out = Conv(512, (3, 3), padding=1, use_bias=True, dtype=dt, name="conv")(x)
        out = ABN(512, "leaky_relu", dtype=dt, name="bn")(out, train)
        out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        out = Conv(self.num_classes, (1, 1), use_bias=True, dtype=dt, name="classifier")(out)
        return out


class CCNet(nn.Module):
    """Full CCNet segmentation model. Returns {'main', 'aux'} logits at OS 8."""

    num_classes: int = 19
    layers: tuple = (3, 4, 23, 3)
    remat: Any = False  # see DilatedResNet.remat
    recurrence: int = 2
    impl: str = "auto"
    drop_rate: float = 0.1  # head/DSN dropout (0 for deterministic parity runs)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        x3, x4 = DilatedResNet(self.layers, remat=self.remat, dtype=self.dtype, name="backbone")(x, train)
        aux = DSNHead(self.num_classes, drop_rate=self.drop_rate, dtype=self.dtype, name="dsn")(x3, train)
        main = RCCAModule(
            self.num_classes, recurrence=self.recurrence, impl=self.impl,
            drop_rate=self.drop_rate, dtype=self.dtype, name="head",
        )(x4, train)
        return {"main": main.astype(jnp.float32), "aux": aux.astype(jnp.float32)}
