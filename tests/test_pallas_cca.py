"""Pallas criss-cross kernel vs. the pure-jnp reference: forward + VJP.

Runs in interpreter mode on CPU (kernel logic); the same code path compiles
on real TPU (exercised by bench.py / model forward with impl='pallas').
Kernel-logic tests pin ``partitioned=False`` (the bare single-device path —
the default under pytest's 8 virtual devices would be the partitioned
wrapper, whose interpret-mode body is the jnp oracle); the partitioned
route gets its own mesh tests at the bottom.

precision='highest' (f32 MXU operands) checks exact math at tight tolerance;
precision='default' (bf16 operands, f32 accumulation — the training config)
is checked at bf16-scale tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccnet_tpu.ops.cc_attention import criss_cross_attention as cca_jnp
from ccnet_tpu.ops.cc_attention_pallas import criss_cross_attention_pallas as cca_pl


def case(seed, B, H, W, Cq, Cv):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(B, H, W, Cq).astype(np.float32)),
        jnp.asarray(rng.randn(B, H, W, Cq).astype(np.float32)),
        jnp.asarray(rng.randn(B, H, W, Cv).astype(np.float32)),
    )


SHAPES = [
    (1, 5, 6, 4, 8),     # tiny, W not divisible by tile
    (2, 9, 8, 8, 16),    # H != W
    (1, 97, 97, 16, 32), # real aspect (small channels for CPU speed)
    (1, 1, 7, 4, 8),     # H=1: column path fully masked
    (1, 7, 1, 4, 8),     # W=1
]


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_jnp_highest(shape):
    q, k, v = case(0, *shape)
    want = np.asarray(cca_jnp(q, k, v))
    got = np.asarray(cca_pl(q, k, v, interpret=True, precision="highest", partitioned=False))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_forward_default_precision_close():
    q, k, v = case(4, 1, 13, 17, 8, 16)
    want = np.asarray(cca_jnp(q, k, v))
    got = np.asarray(cca_pl(q, k, v, interpret=True, precision="default", partitioned=False))
    np.testing.assert_allclose(got, want, atol=0.03, rtol=0.03)


@pytest.mark.parametrize("shape", SHAPES[:3])
def test_vjp_matches_jnp(shape):
    q, k, v = case(1, *shape)
    g = jnp.asarray(np.random.RandomState(2).randn(*v.shape).astype(np.float32))

    def f_ref(q, k, v):
        return jnp.vdot(cca_jnp(q, k, v), g)

    def f_pl(q, k, v):
        return jnp.vdot(cca_pl(q, k, v, interpret=True, precision="highest", partitioned=False), g)

    want = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(f_pl, argnums=(0, 1, 2))(q, k, v)
    for gw, gg, name in zip(want, got, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), atol=3e-5,
            err_msg=f"grad mismatch for {name}",
        )


def test_bf16_inputs():
    q, k, v = case(3, 1, 9, 11, 8, 16)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    got = np.asarray(cca_pl(q, k, v, interpret=True, partitioned=False)).astype(np.float32)
    want = np.asarray(cca_jnp(q, k, v)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_large_n_small_tile_stats4():
    """N past the VMEM knee: the tile picker drops below 8 lines and the
    kernel switches to 4-D (1, T, N, 1) stat blocks — fwd + VJP must still
    match the jnp oracle (row path N=441 -> T<8; column path N=9 -> T=16,
    so both layouts run in one call)."""
    q, k, v = case(9, 1, 9, 441, 4, 8)
    from ccnet_tpu.ops.cc_attention_pallas import _legacy_pick_tile, _pick_tile
    # the premise: N=441 highest-precision forces the legacy transposed route
    # (natural tile < 8) AND the legacy picker lands below 8 lines -> stats4
    assert _pick_tile(441, 4, 8, 4, 4, "fwd_row", highp=True) < 8
    assert _legacy_pick_tile(441, 4, 8, 4, bwd=False, highp=True) < 8

    want = np.asarray(cca_jnp(q, k, v))
    got = np.asarray(cca_pl(q, k, v, interpret=True, precision="highest",
                            partitioned=False))
    np.testing.assert_allclose(got, want, atol=3e-5)

    g = jnp.asarray(np.random.RandomState(10).randn(*v.shape).astype(np.float32))
    want_g = jax.grad(lambda *a: jnp.vdot(cca_jnp(*a), g), argnums=(0, 1, 2))(q, k, v)
    got_g = jax.grad(
        lambda *a: jnp.vdot(cca_pl(*a, interpret=True, precision="highest",
                                   partitioned=False), g),
        argnums=(0, 1, 2))(q, k, v)
    for gw, gg, name in zip(want_g, got_g, "qkv"):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw), atol=5e-5,
                                   err_msg=f"stats4 grad mismatch for {name}")

# ------------------------------------------------------- partitioned route ---


def _data_mesh():
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()).reshape(len(jax.devices())), ("data",))


def test_partitioned_forward_keeps_batch_sharding_no_allgather():
    """Batch-sharded q/k/v through the partitioned CCA: output keeps the
    batch sharding and the compiled program contains no all-gather."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _data_mesh()
    q, k, v = case(5, 8, 7, 9, 4, 8)
    sh4 = NamedSharding(mesh, P("data", None, None, None))
    q, k, v = (jax.device_put(a, sh4) for a in (q, k, v))

    f = jax.jit(lambda q, k, v: cca_pl(q, k, v, interpret=True, partitioned=True))
    out = f(q, k, v)
    want = np.asarray(cca_jnp(q, k, v))
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-5)
    assert out.sharding.spec[0] == "data"
    hlo = f.lower(q, k, v).compile().as_text()
    assert "all-gather" not in hlo


def test_partitioned_vjp_matches_jnp_on_mesh():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _data_mesh()
    q, k, v = case(6, 8, 6, 5, 4, 8)
    g = jnp.asarray(np.random.RandomState(7).randn(*v.shape).astype(np.float32))
    sh4 = NamedSharding(mesh, P("data", None, None, None))
    qs, ks, vs = (jax.device_put(a, sh4) for a in (q, k, v))

    want = jax.grad(lambda *a: jnp.vdot(cca_jnp(*a), g), argnums=(0, 1, 2))(q, k, v)
    got = jax.jit(jax.grad(
        lambda *a: jnp.vdot(cca_pl(*a, interpret=True, partitioned=True), g),
        argnums=(0, 1, 2),
    ))(qs, ks, vs)
    for gw, gg, name in zip(want, got, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), atol=3e-5,
            err_msg=f"partitioned grad mismatch for {name}")


def test_partitioned_replicated_inputs_still_correct():
    """Replicated (uncommitted) inputs through the partitioned route must
    give the same answer — the partition rule reshards operands from the
    first operand's spec instead of mispairing shards."""
    q, k, v = case(8, 8, 5, 6, 4, 8)
    got = jax.jit(lambda q, k, v: cca_pl(q, k, v, interpret=True, partitioned=True))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(cca_jnp(q, k, v)), atol=2e-5)
