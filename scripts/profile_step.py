"""Decompose the train-step time budget on the real chip.

Times, at the flagship config (R101, R=2, bf16, batch 8, 769²):
  - full train step (as bench.py)
  - forward+loss only (train mode)
  - value_and_grad without the optimizer update
  - criterion alone (fwd and fwd+grad) on random OS-8 logits
  - OHEM bisection at several iteration counts
  - Pallas vs jnp CCA fwd / fwd+bwd at the head shape
  - remat variants of the full step

Run: python scripts/profile_step.py [--quick]
axon timing rule: force a host read of a scalar chained through the outputs
(block_until_ready is unreliable here — see .claude/skills/verify/SKILL.md).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, *args, n=5, warmup=2, reader=None):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _force(out, reader)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _force(out, reader)
    return (time.perf_counter() - t0) / n


def _force(out, reader=None):
    import jax

    if reader is not None:
        reader(out)
        return
    leaves = jax.tree_util.tree_leaves(out)
    # read one scalar derived from the last leaf to force the chain
    float(leaves[-1].reshape(-1)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    n = 3 if args.quick else 5

    import jax
    import jax.numpy as jnp

    from ccnet_tpu.losses import build_criterion
    from ccnet_tpu.models import build_model
    from ccnet_tpu.train import create_train_state, make_optimizer, make_train_step

    rng = np.random.RandomState(0)
    B, H, W = 8, 769, 769
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 30.0)
    labels = jnp.asarray(rng.randint(0, 19, size=(B, H, W)).astype(np.int32))
    key = jax.random.PRNGKey(0)

    criterion = build_criterion(ohem=True, thresh=0.7, min_kept=100000)
    tx = make_optimizer(base_lr=1e-2, max_steps=60000, weight_decay=1e-4)

    # ---- criterion alone ----
    logits_main = jnp.asarray(rng.randn(B, 97, 97, 19).astype(np.float32))
    logits_aux = jnp.asarray(rng.randn(B, 97, 97, 19).astype(np.float32))
    outs = {"main": logits_main, "aux": logits_aux}

    crit_fwd = jax.jit(lambda o, l: criterion(o, l))
    t = timed(crit_fwd, outs, labels, n=n)
    print(f"criterion fwd: {t*1e3:.1f} ms")

    crit_grad = jax.jit(lambda o, l: jax.grad(lambda oo: criterion(oo, l))(o))
    t = timed(crit_grad, outs, labels, n=n)
    print(f"criterion fwd+grad: {t*1e3:.1f} ms")

    from ccnet_tpu.losses.ohem import kth_smallest_bisect

    flat = jnp.asarray(rng.rand(B * H * W).astype(np.float32))
    for iters in (50, 30, 20):
        f = jax.jit(lambda x, it=iters: kth_smallest_bisect(x, 100000, iters=it))
        t = timed(f, flat, n=n)
        print(f"ohem bisect iters={iters}: {t*1e3:.2f} ms")

    # ---- CCA at head shape ----
    from ccnet_tpu.ops.cc_attention import criss_cross_attention
    from ccnet_tpu.ops.cc_attention_pallas import criss_cross_attention_pallas

    q = jnp.asarray(rng.randn(B, 97, 97, 64).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, 97, 97, 64).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, 97, 97, 512).astype(np.float32)).astype(jnp.bfloat16)
    for name, fn in (("jnp", criss_cross_attention), ("pallas", criss_cross_attention_pallas)):
        f = jax.jit(fn)
        t = timed(f, q, k, v, n=n)
        g = jax.jit(lambda q, k, v, fn=fn: jax.grad(
            lambda q, k, v: fn(q, k, v).astype(jnp.float32).sum(), argnums=(0, 1, 2)
        )(q, k, v))
        tg = timed(g, q, k, v, n=n)
        print(f"CCA {name}: fwd {t*1e3:.2f} ms, fwd+bwd {tg*1e3:.2f} ms")

    # ---- full step, remat variants ----
    variants = [
        ("remat=True(3,4)", True),
        ("remat='conv12'", "conv12"),
        ("remat='convs'", "convs"),
        ("remat=(3,)", (3,)),
        ("remat=False", False),
    ]
    for vname, remat in variants:
        try:
            model = build_model(
                "ccnet", num_classes=19, recurrence=2, depth=101,
                dtype=jnp.bfloat16, impl="auto", remat=remat,
            )
            state = create_train_state(model, tx, input_shape=(1, H, W, 3))
            step = make_train_step(model, criterion, tx)

            def run(state):
                s, m = step(state, images, labels, key)
                return s, m

            s = state
            for _ in range(2):
                s, m = run(s)
            _ = float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(n):
                s, m = run(s)
            _ = float(m["loss"])
            t = (time.perf_counter() - t0) / n
            print(f"full step {vname}: {t*1e3:.0f} ms  ({B/t:.1f} crops/s)")

            # fwd+loss only
            def fwd_loss(params, bs):
                out, _ = model.apply(
                    {"params": params, "batch_stats": bs}, images, train=True,
                    rngs={"dropout": key}, mutable=["batch_stats"],
                )
                return criterion(out, labels)

            f = jax.jit(fwd_loss)
            t = timed(f, s.params, s.batch_stats, n=n, reader=lambda o: float(o))
            print(f"  fwd+loss only: {t*1e3:.0f} ms")

            g = jax.jit(lambda p, bs: jax.grad(fwd_loss)(p, bs))
            t = timed(g, s.params, s.batch_stats, n=n)
            print(f"  fwd+loss+grad (no opt): {t*1e3:.0f} ms")
            del state, s, step, f, g
        except Exception as e:  # OOM etc.
            print(f"full step {vname}: FAILED ({type(e).__name__}: {str(e)[:200]})")


if __name__ == "__main__":
    main()
