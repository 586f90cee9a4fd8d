"""Loss parity tests: torch CE oracle, OHEM numpy oracle (reference
selection semantics at full resolution), Lovász against an independent
brute-force of the Jaccard-extension definition."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccnet_tpu.losses import (
    criterion_dsn,
    lovasz_softmax,
    ohem_cross_entropy,
    softmax_cross_entropy_ignore,
)
from ccnet_tpu.losses.ohem import ohem_mask

torch = pytest.importorskip("torch")


def rand_case(seed, B=2, H=17, W=13, C=5, ignore_frac=0.3):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, H, W, C).astype(np.float32)
    labels = rng.randint(0, C, size=(B, H, W))
    labels[rng.rand(B, H, W) < ignore_frac] = 255
    return logits, labels


@pytest.mark.parametrize("seed", [0, 1])
def test_ce_matches_torch(seed):
    logits, labels = rand_case(seed)
    got = float(softmax_cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(labels)))
    want = torch.nn.CrossEntropyLoss(ignore_index=255)(
        torch.from_numpy(logits).permute(0, 3, 1, 2), torch.from_numpy(labels).long()
    ).item()
    assert abs(got - want) < 1e-5


def test_ce_all_ignored_is_zero_and_grad_finite():
    logits = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 3).astype(np.float32))
    labels = jnp.full((1, 4, 4), 255)
    loss, grad = jax.value_and_grad(lambda l: softmax_cross_entropy_ignore(l, labels))(logits)
    assert float(loss) == 0.0
    assert np.all(np.isfinite(np.asarray(grad)))


def oracle_ohem_keep(logits, labels, thresh, min_kept, ignore=255):
    """Reference selection semantics (loss/loss.py:20-78) at full res."""
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    valid = labels != ignore
    safe = np.where(valid, labels, 0)
    p = np.take_along_axis(probs, safe[..., None], axis=-1)[..., 0]
    pv = p[valid]
    num_valid = valid.sum()
    if min_kept >= num_valid:
        threshold = 1.0
    else:
        kth = np.partition(pv, min_kept - 1)[min_kept - 1]
        threshold = max(thresh, kth)
    return valid & (p <= threshold)


@pytest.mark.parametrize("min_kept,thresh", [(50, 0.7), (10000, 0.7), (5, 0.1), (0, 0.7)])
def test_ohem_mask_matches_oracle(min_kept, thresh):
    logits, labels = rand_case(3)
    got = np.asarray(ohem_mask(jnp.asarray(logits), jnp.asarray(labels), 255, thresh, min_kept))
    if min_kept > 0:
        want = oracle_ohem_keep(logits, labels, thresh, min_kept)
    else:
        valid = labels != 255
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        p = np.take_along_axis(probs, np.where(valid, labels, 0)[..., None], -1)[..., 0]
        want = valid & (p <= thresh)
    np.testing.assert_array_equal(got, want)


def test_ohem_loss_grad_finite():
    logits, labels = rand_case(4)
    g = jax.grad(lambda l: ohem_cross_entropy(l, jnp.asarray(labels), min_kept=50))(
        jnp.asarray(logits)
    )
    assert np.all(np.isfinite(np.asarray(g)))


def oracle_lovasz(probas, labels, ignore=255):
    """Brute-force Lovász-softmax from the paper definition, classes present."""
    C = probas.shape[-1]
    p = probas.reshape(-1, C)
    l = labels.ravel()
    keep = l != ignore
    p, l = p[keep], l[keep]
    losses = []
    for c in range(C):
        fg = (l == c).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - p[:, c])
        order = np.argsort(-errors, kind="stable")
        e, g = errors[order], fg[order]
        gts = g.sum()
        inter = gts - np.cumsum(g)
        union = gts + np.cumsum(1 - g)
        jacc = 1.0 - inter / union
        grad = np.concatenate([jacc[:1], jacc[1:] - jacc[:-1]])
        losses.append((e * grad).sum())
    return float(np.mean(losses))


@pytest.mark.parametrize("seed", [5, 6])
def test_lovasz_matches_oracle(seed):
    logits, labels = rand_case(seed, B=1, H=11, W=9, C=4)
    probas = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
    got = float(lovasz_softmax(jnp.asarray(probas), jnp.asarray(labels)))
    want = oracle_lovasz(probas, labels)
    assert abs(got - want) < 1e-5


def test_criterion_dsn_combines():
    logits, labels = rand_case(7, H=16, W=16)
    out = {"main": jnp.asarray(logits[:, ::2, ::2]), "aux": jnp.asarray(logits[:, ::2, ::2])}
    loss = criterion_dsn(out, jnp.asarray(labels))
    assert np.isfinite(float(loss)) and float(loss) > 0
