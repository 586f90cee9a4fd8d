"""Core layers: activated batch norm (ABN) and conv wrappers.

The reference wraps every conv in Mapillary InPlace-ABN (fused CUDA
batchnorm+activation with cross-GPU stat sync; reference
``networks/ccnet.py:16-17``). The TPU-native equivalent needs no custom
kernel at all:

* *fusion* — XLA fuses the normalise+activate elementwise chain into
  neighbouring ops automatically;
* *memory* — InPlace-ABN's in-place trick is a CUDA allocator workaround;
  XLA's buffer assignment already reuses memory, and ``jax.checkpoint`` covers
  rematerialisation;
* *sync* — under ``jit`` with the batch axis sharded over the mesh,
  ``jnp.mean`` over the batch axis IS a cross-replica reduction: XLA inserts
  the ICI all-reduce. Sync-BN falls out of SPMD for free.

Parity-critical detail (reference ``networks/ccnet.py:104,107,111`` etc.):
backbone ABNs use ``activation='identity'`` (explicit ReLUs follow), while
every head ABN uses InPlace-ABN's *default* activation — leaky ReLU with
negative slope 0.01.

Running-stat semantics match torch: ``running = (1-m)*running + m*batch``
with m=0.1 and the *unbiased* batch variance for the running-var update
(normalisation itself uses the biased variance).
"""

from __future__ import annotations

from typing import Any, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) == uniform with
# bound sqrt(6 / ((1 + 5) * fan_in)) = sqrt(1/fan_in)
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _torch_bias_init(key, shape, dtype, fan_in):
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv(nn.Module):
    """2D conv, NHWC/HWIO, torch-like defaults (incl. default init).

    ``padding`` follows torch's symmetric-int convention; dilation composes
    the dilated ResNet trunk (reference ``networks/ccnet.py:142-145``).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[int, Tuple[int, int]] = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding if isinstance(self.padding, tuple) else (self.padding, self.padding)
        kh, kw = self.kernel_size
        fan_in = x.shape[-1] * kh * kw
        kernel = self.param(
            "weight", torch_conv_init, (kh, kw, x.shape[-1], self.features), jnp.float32
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=self.strides,
            padding=[(pad[0], pad[0]), (pad[1], pad[1])],
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", lambda k, s, d: _torch_bias_init(k, s, d, fan_in), (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class ABN(nn.Module):
    """Activated batch norm: BN followed by identity / leaky-ReLU(0.01).

    Cross-replica stat sync is implicit: under pjit with the batch dimension
    sharded, the means below are global means (XLA all-reduces over ICI).
    """

    features: int
    activation: str = "leaky_relu"  # InPlace-ABN default
    slope: float = 0.01
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        weight = self.param("weight", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        ra_mean = self.variable("batch_stats", "running_mean", lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable("batch_stats", "running_var", lambda: jnp.ones((f,), jnp.float32))

        if train:
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=(0, 1, 2))
            mean2 = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]  # global under pjit
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        scale = weight * jax.lax.rsqrt(var + self.eps)
        shift = bias - mean * scale
        y = x * scale.astype(x.dtype) + shift.astype(x.dtype)
        if self.activation == "leaky_relu":
            y = jnp.where(y >= 0, y, y * jnp.asarray(self.slope, y.dtype))
        elif self.activation != "identity":
            raise ValueError(f"unknown ABN activation {self.activation!r}")
        return y
