"""Execute the custom_partitioning-wrapped Pallas bodies on real TPU.

The CPU test suite exercises the partitioning logic with the jnp oracle as
the per-shard body (the pallas interpreter cannot lower inside a partitioned
computation), and the single-device path exercises the real kernels — but a
real multi-chip TPU run executes the COMBINATION: the compiled pallas body
inside the custom_partitioning wrapper. Multi-chip hardware is unavailable
here; the closest obtainable evidence is a 1-device `jax.sharding.Mesh` on
the real chip with explicit batch shardings, `partitioned=True`,
`interpret=False` — the partition machinery lowers the same wrapped body it
would on a pod, just with a trivial shard count. This script runs fwd+bwd of
both partitioned kernels that way and checks them against the jnp oracles
(reference semantics: loss/criterion.py upsample+CE chain and
cc_attention/functions.py:27-49).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/check_partitioned_tpu.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def check_upsampled_nll(mesh):
    from ccnet_tpu.ops.upsampled_ce import upsampled_nll, upsampled_nll_reference

    rng = np.random.RandomState(0)
    B, h, w, C, r = 4, 25, 25, 19, 8
    H = W = (h - 1) * r + 1
    logits = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
    labels = jnp.asarray(
        np.where(rng.rand(B, H, W) < 0.1, 255, rng.randint(0, C, (B, H, W)))
        .astype(np.int32))
    g = jnp.asarray(rng.randn(B, H, W).astype(np.float32))

    bsh = NamedSharding(mesh, P("data"))
    logits = jax.device_put(logits, bsh)
    labels = jax.device_put(labels, bsh)
    g = jax.device_put(g, bsh)

    def loss(lg, lb, gg):
        return jnp.sum(upsampled_nll(lg, lb, False, True) * gg)

    fb = jax.jit(jax.value_and_grad(loss), in_shardings=(bsh, bsh, bsh))
    val, grad = fb(logits, labels, g)

    ref_val, ref_vjp = jax.vjp(
        lambda lg: jnp.sum(upsampled_nll_reference(lg, labels) * g), logits)
    ref_grad = ref_vjp(1.0)[0]
    dv = abs(float(val) - float(ref_val)) / max(1.0, abs(float(ref_val)))
    dg = float(jnp.max(jnp.abs(grad - ref_grad)))
    print(f"upsampled_nll partitioned+pallas on TPU: "
          f"rel dval={dv:.2e} max dgrad={dg:.2e}")
    assert dv < 1e-4 and dg < 1e-3, (dv, dg)


def check_cca(mesh):
    from ccnet_tpu.ops.cc_attention import criss_cross_attention as cca_jnp
    from ccnet_tpu.ops.cc_attention_pallas import criss_cross_attention_pallas

    rng = np.random.RandomState(1)
    B, H, W, cq, cv = 4, 97, 97, 64, 512
    q = jnp.asarray(rng.randn(B, H, W, cq).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, W, cq).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, W, cv).astype(np.float32))
    g = jnp.asarray(rng.randn(B, H, W, cv).astype(np.float32))

    bsh = NamedSharding(mesh, P("data"))
    q, k, v, g = (jax.device_put(x, bsh) for x in (q, k, v, g))

    def loss(impl, q, k, v):
        return jnp.sum(impl(q, k, v).astype(jnp.float32) * g)

    fb = jax.jit(
        jax.value_and_grad(
            lambda q, k, v: loss(
                lambda *a: criss_cross_attention_pallas(
                    *a, interpret=False, precision="highest", partitioned=True),
                q, k, v),
            argnums=(0, 1, 2)),
        in_shardings=(bsh, bsh, bsh))
    val, grads = fb(q, k, v)

    # the jnp oracle must also run f32 matmuls — TPU default is bf16 operands
    # (~1e-2 error at 512-channel sums), which would swamp the comparison
    with jax.default_matmul_precision("highest"):
        rval, rvjp = jax.vjp(lambda q, k, v: loss(cca_jnp, q, k, v), q, k, v)
        rgrads = rvjp(1.0)
    dv = abs(float(val) - float(rval)) / max(1.0, abs(float(rval)))
    dg = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(grads, rgrads))
    print(f"cca_pallas partitioned on TPU: rel dval={dv:.2e} max dgrad={dg:.2e}")
    assert dv < 1e-4 and dg < 2e-3, (dv, dg)


def main():
    assert jax.default_backend() == "tpu" or jax.devices()[0].platform == "tpu", (
        "this check must run on the real TPU backend")
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    check_upsampled_nll(mesh)
    check_cca(mesh)
    print("PARTITIONED-PALLAS-ON-TPU OK")


if __name__ == "__main__":
    main()
