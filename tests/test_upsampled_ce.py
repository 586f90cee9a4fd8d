"""Fused upsample+CE kernel (ops/upsampled_ce.py) vs the jnp oracle.

The oracle (`upsampled_nll_reference`) IS the reference semantics: bilinear
align-corners upsample (reference ``loss/criterion.py:26``) then per-pixel
log-softmax NLL. The Pallas kernel must reproduce it for any integer
align-corners ratio; ignore labels (>= C) carry no gradient and are masked
by the caller, so the forward is compared under the valid mask.

Also checks that the rewired criteria (losses/criterion.py) are numerically
identical to the original materialised formulas.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccnet_tpu.losses import (
    criterion_dsn,
    criterion_ohem_dsn,
    ohem_cross_entropy,
    softmax_cross_entropy_ignore,
)
from ccnet_tpu.ops.resize import resize_bilinear_align_corners
from ccnet_tpu.ops.upsampled_ce import (
    integer_upsample_ratio,
    upsampled_nll,
    upsampled_nll_reference,
)

SHAPES = [
    (2, 5, 7, 4, 3),   # rectangular, odd ratio
    (1, 9, 9, 6, 4),   # H pad path (segs boundary)
    (1, 7, 5, 19, 8),  # OS-8 ratio, 19 classes
]


def _case(B, h, w, C, r, seed):
    rng = np.random.RandomState(seed)
    H, W = (h - 1) * r + 1, (w - 1) * r + 1
    logits = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
    labels = rng.randint(0, C, (B, H, W)).astype(np.int32)
    labels[rng.rand(B, H, W) < 0.15] = 255  # ignore pixels
    return logits, jnp.asarray(labels)


def test_integer_upsample_ratio():
    assert integer_upsample_ratio(97, 769) == 8
    assert integer_upsample_ratio(65, 513) == 8
    assert integer_upsample_ratio(97, 770) is None
    assert integer_upsample_ratio(1, 9) is None


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_oracle(shape):
    B, h, w, C, r = shape
    logits, labels = _case(B, h, w, C, r, 0)
    ref = upsampled_nll_reference(logits, labels)
    # partitioned=False: the bare interpret-mode KERNEL (the partitioned
    # wrapper's interpret body is the oracle itself and would be vacuous)
    got = upsampled_nll(logits, labels, True, False)
    # unmasked: ignore pixels (255) must yield nll 0 exactly like the oracle
    err = jnp.max(jnp.abs(ref - got))
    assert float(err) < 1e-5


@pytest.mark.parametrize("shape", SHAPES[:2])
def test_backward_matches_oracle(shape):
    B, h, w, C, r = shape
    logits, labels = _case(B, h, w, C, r, 1)
    mask = (labels != 255).astype(jnp.float32)

    def loss(fn, L):
        return jnp.sum(fn(L) * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    gref = jax.grad(lambda L: loss(lambda x: upsampled_nll_reference(x, labels), L))(logits)
    ggot = jax.grad(lambda L: loss(lambda x: upsampled_nll(x, labels, True, False), L))(logits)
    scale = float(jnp.max(jnp.abs(gref))) + 1e-12
    assert float(jnp.max(jnp.abs(gref - ggot))) / scale < 1e-4


def _materialised_dsn(outputs, labels):
    """The original (pre-fusion) formulas, as the equivalence oracle."""
    H, W = labels.shape[1], labels.shape[2]

    def up(l):
        return resize_bilinear_align_corners(l.astype(jnp.float32), (H, W))

    ce = softmax_cross_entropy_ignore
    return {
        "dsn": ce(up(outputs["main"]), labels, 255)
        + 0.4 * ce(up(outputs["aux"]), labels, 255),
        "ohem": ohem_cross_entropy(up(outputs["main"]), labels, 255, 0.7, 17)
        + 0.4 * ce(up(outputs["aux"]), labels, 255),
    }


def test_criteria_match_materialised_path():
    rng = np.random.RandomState(2)
    B, h, w, C, r = 2, 7, 7, 6, 4
    H, W = (h - 1) * r + 1, (w - 1) * r + 1
    outputs = {
        "main": jnp.asarray(rng.randn(B, h, w, C).astype(np.float32)),
        "aux": jnp.asarray(rng.randn(B, h, w, C).astype(np.float32)),
    }
    labels = rng.randint(0, C, (B, H, W)).astype(np.int32)
    labels[rng.rand(B, H, W) < 0.1] = 255
    labels = jnp.asarray(labels)

    oracle = _materialised_dsn(outputs, labels)
    np.testing.assert_allclose(
        float(criterion_dsn(outputs, labels)), float(oracle["dsn"]), rtol=1e-5
    )
    # min_kept below num_valid so the k-th statistic path is exercised
    np.testing.assert_allclose(
        float(criterion_ohem_dsn(outputs, labels, min_kept=17)),
        float(oracle["ohem"]),
        rtol=1e-5,
    )


def _data_mesh():
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()).reshape(len(jax.devices())), ("data",))


def test_partitioned_forward_no_allgather_on_mesh():
    """With >1 device, upsampled_nll routes through a batch-dim
    custom_partitioning rule: output keeps the batch sharding and the
    compiled program contains NO all-gather (each shard runs locally)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _data_mesh()
    B, h, w, C, r = 8, 5, 7, 4, 3
    logits, labels = _case(B, h, w, C, r, 3)
    logits = jax.device_put(logits, NamedSharding(mesh, P("data", None, None, None)))
    labels = jax.device_put(labels, NamedSharding(mesh, P("data", None, None)))

    f = jax.jit(lambda l, lab: upsampled_nll(l, lab, True))
    out = f(logits, labels)
    ref = upsampled_nll_reference(logits, labels)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5
    assert out.sharding.spec[0] == "data"
    hlo = f.lower(logits, labels).compile().as_text()
    assert "all-gather" not in hlo


def test_partitioned_backward_matches_oracle_on_mesh():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _data_mesh()
    B, h, w, C, r = 8, 5, 5, 6, 4
    logits, labels = _case(B, h, w, C, r, 4)
    mask = (labels != 255).astype(jnp.float32)
    logits_s = jax.device_put(logits, NamedSharding(mesh, P("data", None, None, None)))
    labels_s = jax.device_put(labels, NamedSharding(mesh, P("data", None, None)))

    g = jax.jit(jax.grad(
        lambda l: jnp.sum(upsampled_nll(l, labels_s, True) * mask)
    ))(logits_s)
    gref = jax.grad(
        lambda l: jnp.sum(upsampled_nll_reference(l, labels) * mask)
    )(logits)
    scale = float(jnp.max(jnp.abs(gref))) + 1e-12
    assert float(jnp.max(jnp.abs(g - gref))) / scale < 1e-4
