"""Binary Lovász family vs an independent numpy oracle (dynamic filtering,
straight from the Berman et al. math — the semantics of reference
``loss/lovasz_losses.py:18-150``), plus torch-checked stable BCE."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccnet_tpu.losses import (binary_xloss, iou, iou_binary, lovasz_hinge,
                              lovasz_hinge_flat)


def np_lovasz_grad(gt_sorted):
    gts = gt_sorted.sum()
    intersection = gts - np.cumsum(gt_sorted)
    union = gts + np.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / np.maximum(union, 1.0)
    out = jaccard.copy()
    out[1:] = jaccard[1:] - jaccard[:-1]
    return out


def np_lovasz_hinge_flat(logits, labels):
    """Oracle: dynamic shapes, ignored pixels already removed."""
    if len(labels) == 0:
        return 0.0
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    order = np.argsort(-errors, kind="stable")
    errors_sorted = errors[order]
    gt_sorted = labels[order].astype(np.float64)
    grad = np_lovasz_grad(gt_sorted)
    return float(np.dot(np.maximum(errors_sorted, 0.0), grad))


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("with_ignore", [False, True])
def test_lovasz_hinge_flat_matches_oracle(seed, with_ignore):
    rng = np.random.RandomState(seed)
    P = 97
    logits = rng.randn(P).astype(np.float32) * 2
    labels = rng.randint(0, 2, size=P)
    if with_ignore:
        labels[rng.rand(P) < 0.3] = 255
    valid = labels != 255
    want = np_lovasz_hinge_flat(logits[valid].astype(np.float64),
                                labels[valid].astype(np.float64))
    got = float(lovasz_hinge_flat(jnp.asarray(logits), jnp.asarray(labels),
                                  jnp.asarray(valid)))
    assert got == pytest.approx(want, abs=1e-5)


def test_lovasz_hinge_per_image_and_batch():
    rng = np.random.RandomState(3)
    B, H, W = 3, 9, 11
    logits = rng.randn(B, H, W).astype(np.float32)
    labels = rng.randint(0, 2, size=(B, H, W))
    labels[rng.rand(B, H, W) < 0.2] = 255

    want_pi = np.mean([
        np_lovasz_hinge_flat(logits[b][labels[b] != 255].astype(np.float64),
                             labels[b][labels[b] != 255].astype(np.float64))
        for b in range(B)])
    got_pi = float(lovasz_hinge(jnp.asarray(logits), jnp.asarray(labels),
                                per_image=True, ignore=255))
    assert got_pi == pytest.approx(want_pi, abs=1e-5)

    v = labels != 255
    want_flat = np_lovasz_hinge_flat(logits[v].astype(np.float64),
                                     labels[v].astype(np.float64))
    got_flat = float(lovasz_hinge(jnp.asarray(logits), jnp.asarray(labels),
                                  per_image=False, ignore=255))
    assert got_flat == pytest.approx(want_flat, abs=1e-5)


def test_lovasz_hinge_perfect_prediction_is_zero():
    labels = np.array([[0, 1, 1, 0]])
    logits = (2.0 * labels - 1.0) * 10.0  # confident & correct
    assert float(lovasz_hinge(jnp.asarray(logits, jnp.float32),
                              jnp.asarray(labels))) == pytest.approx(0.0, abs=1e-6)


def test_lovasz_hinge_empty_image_is_zero():
    labels = np.full((1, 4), 255)
    logits = np.random.RandomState(0).randn(1, 4).astype(np.float32)
    assert float(lovasz_hinge(jnp.asarray(logits), jnp.asarray(labels),
                              ignore=255)) == 0.0


def test_lovasz_hinge_is_differentiable():
    rng = np.random.RandomState(4)
    logits = jnp.asarray(rng.randn(2, 5, 5).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 2, size=(2, 5, 5)))
    g = jax.grad(lambda x: lovasz_hinge(x, labels))(logits)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).sum() > 0


def test_binary_xloss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(5)
    logits = rng.randn(200).astype(np.float32) * 3
    labels = rng.randint(0, 2, size=200)
    labels[rng.rand(200) < 0.25] = 255
    v = labels != 255
    want = float(torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits[v]), torch.from_numpy(labels[v].astype(np.float32))))
    got = float(binary_xloss(jnp.asarray(logits), jnp.asarray(labels), ignore=255))
    assert got == pytest.approx(want, abs=1e-5)


def test_iou_metrics():
    preds = np.array([[0, 1, 1, 0], [1, 1, 0, 0]])
    labels = np.array([[0, 1, 0, 255], [1, 0, 0, 0]])
    # image 0: inter {1}, union {1,2} -> 1/2 ; image 1: inter 1, union 2 -> 1/2
    assert iou_binary(preds, labels, ignore=255) == pytest.approx(50.0)
    per_class = iou(preds.ravel(), labels.ravel(), C=2, ignore=255)
    assert len(per_class) == 2
    assert all(0.0 <= x <= 100.0 for x in per_class)
