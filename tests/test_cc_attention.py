"""Criss-cross attention numerics: jnp reference vs. an independent
brute-force per-pixel oracle, plus structural properties.

The oracle below is written directly from the op's mathematical definition
(per-pixel softmax over the union of row+column neighbourhoods with the
column-path self slot masked), NOT from any implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccnet_tpu.ops import criss_cross_attention, cca_logits_reference


def oracle_cca(q, k, v):
    """Brute-force per-pixel criss-cross attention in numpy."""
    B, H, W, _ = q.shape
    Cv = v.shape[-1]
    out = np.zeros((B, H, W, Cv), np.float64)
    q, k, v = q.astype(np.float64), k.astype(np.float64), v.astype(np.float64)
    for b in range(B):
        for h in range(H):
            for w in range(W):
                # neighbourhood: all (h', w) then all (h, w')
                keys = np.concatenate([k[b, :, w], k[b, h, :]], 0)  # (H+W, C)
                vals = np.concatenate([v[b, :, w], v[b, h, :]], 0)  # (H+W, Cv)
                logits = keys @ q[b, h, w]
                logits[h] = -np.inf  # mask column-path self slot
                a = np.exp(logits - logits.max())
                a /= a.sum()
                out[b, h, w] = a @ vals
    return out


@pytest.mark.parametrize("shape", [(2, 5, 6, 8), (1, 7, 3, 4)])
def test_cca_matches_bruteforce(shape):
    rng = np.random.RandomState(0)
    B, H, W, C = shape
    q = rng.randn(B, H, W, C).astype(np.float32)
    k = rng.randn(B, H, W, C).astype(np.float32)
    v = rng.randn(B, H, W, 2 * C).astype(np.float32)
    got = np.asarray(criss_cross_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    want = oracle_cca(q, k, v)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_joint_softmax_normalises():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 5, 6, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 5, 6, 4).astype(np.float32))
    att = jax.nn.softmax(cca_logits_reference(q, k), axis=-1)
    np.testing.assert_allclose(np.asarray(att.sum(-1)), 1.0, atol=1e-5)
    # self slot in the column path carries zero probability
    H = 5
    for h in range(H):
        assert np.all(np.asarray(att[0, h, :, h]) < 1e-12)


def test_constant_value_recovered():
    # if v is constant, attention output must equal that constant
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(2, 4, 5, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 4, 5, 3).astype(np.float32))
    v = jnp.full((2, 4, 5, 7), 3.25, jnp.float32)
    out = criss_cross_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), 3.25, atol=1e-5)


def test_grads_finite():
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(1, 5, 6, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 5, 6, 4).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 5, 6, 8).astype(np.float32))

    def f(q, k, v):
        return jnp.sum(criss_cross_attention(q, k, v) ** 2)

    grads = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
