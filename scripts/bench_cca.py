"""On-hardware A/B: jnp (XLA batched-matmul) vs fused Pallas criss-cross
attention, fwd and fwd+bwd, at escalating shapes.

Sets the `auto` crossover (`ccnet_tpu.models.ccnet._CCA_PALLAS_MIN_AXIS_SUM`)
from measurement instead of guesswork; results are recorded in PARITY.md.
Run on the real TPU: `python scripts/bench_cca.py`.

The jnp path materialises the (B, H, W, H+W) f32 affinity tensor plus
softmax/backward temps in HBM; the kernel never writes it. Past ~513² the
jnp path simply OOMs — reported as `null`.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ccnet_tpu.ops.cc_attention import criss_cross_attention as cca_jnp  # noqa: E402
from ccnet_tpu.ops.cc_attention_pallas import criss_cross_attention_pallas  # noqa: E402


def cca_pl(q, k, v):
    return criss_cross_attention_pallas(q, k, v, partitioned=False)


SHAPES = [  # (B, H, W) with Cq=64, Cv=512 (the RCCA head's geometry)
    (8, 97, 97),     # train crop (769² OS-8)
    (1, 129, 257),   # whole-image 1024×2048 OS-8
    (8, 129, 257),   # batched whole-image
    (1, 257, 257),
    (1, 385, 385),
    (1, 513, 513),
    (1, 769, 769),
]
CQ, CV = 64, 512


def _time(fn, args, iters):
    try:
        out = fn(*args)
        _ = float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
        return (time.perf_counter() - t0) / iters
    except Exception as e:  # noqa: BLE001 - OOM / lowering failure at scale
        print(f"    FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None


def main():
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")
    results = []
    for B, H, W in SHAPES:
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, H, W, CQ).astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, H, W, CQ).astype(np.float32)).astype(jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, H, W, CV).astype(np.float32)).astype(jnp.bfloat16)
        g = jnp.asarray(rng.randn(B, H, W, CV).astype(np.float32)).astype(jnp.bfloat16)
        aff_mb = B * H * W * (H + W) * 4 / 1e6
        iters = max(3, min(20, int(2e9 / (aff_mb * 1e6 + 1))))
        row = {"B": B, "H": H, "W": W, "aff_MB": round(aff_mb, 1)}
        print(f"shape B={B} {H}x{W}  affinity {aff_mb:.0f} MB  iters={iters}")

        for name, impl in (("jnp", cca_jnp), ("pallas", cca_pl)):
            fwd = jax.jit(impl)
            t_f = _time(fwd, (q, k, v), iters)

            # g is an ARGUMENT, not a closure capture: captured arrays become
            # HLO constants serialized into the (size-limited) remote-compile
            # request on tunneled platforms
            def loss(q, k, v, g, impl=impl):
                return jnp.sum(impl(q, k, v).astype(jnp.float32) * g.astype(jnp.float32))

            fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            t_fb = _time(fb, (q, k, v, g), iters)
            row[f"{name}_fwd_ms"] = None if t_f is None else round(t_f * 1e3, 2)
            row[f"{name}_fwdbwd_ms"] = None if t_fb is None else round(t_fb * 1e3, 2)
            print(f"    {name:6s} fwd {row[f'{name}_fwd_ms']} ms   fwd+bwd {row[f'{name}_fwdbwd_ms']} ms")
        results.append(row)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
