"""Force the natural-layout CCA backward onto T=8 tiles at the flagship
training shape (8, 97, 97, 64/512 bf16) and measure it against the legacy
transposed backward and the jnp route.

The VMEM accounting in `_pick_tile` currently lands just under T=8 for
`bwd_col` at this shape; this probe answers empirically whether the real
compiled kernel fits (Mosaic hard-errors on VMEM overflow) and what it buys.

Run on the real chip: python scripts/probe_bwd_t8.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import time
from unittest import mock

import numpy as np

import jax
import jax.numpy as jnp

import ccnet_tpu.ops.cc_attention_pallas as ccp
from ccnet_tpu.ops.cc_attention import criss_cross_attention as cca_jnp


B, H, W, CQ, CV = 8, 97, 97, 64, 512


def make_args():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, W, CQ).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, W, CQ).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, W, CV).astype(np.float32)).astype(jnp.bfloat16)
    g = jnp.asarray(rng.randn(B, H, W, CV).astype(np.float32)).astype(jnp.bfloat16)
    return q, k, v, g


def timed(fn, args, iters=30):
    out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters


def grads(impl, q, k, v, g):
    def loss(q, k, v):
        return jnp.sum(impl(q, k, v).astype(jnp.float32) * g.astype(jnp.float32))
    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


def main():
    print(f"backend={jax.default_backend()} device={jax.devices()[0].device_kind}")
    q, k, v, g = make_args()

    def pallas(qq, kk, vv):
        return ccp.criss_cross_attention_pallas(qq, kk, vv, partitioned=False)

    real_pick = ccp._pick_tile
    print("tile picks today:", {
        kind: real_pick(97, CQ, CV, 2, 2, kind) for kind in
        ("fwd_col", "fwd_row", "bwd_col", "bwd_row")})

    # reference grads from the jnp route (f32 einsum path)
    ref = grads(cca_jnp, q, k, v, g)
    ref = [np.asarray(r.astype(jnp.float32)) for r in ref]

    results = {}
    for name, forced in (("current", None), ("forced_T8", 8), ("forced_T16", 16)):
        if forced is None:
            picker = real_pick
        else:
            def picker(n, cq, cv, isz, osz, kind, highp=False, _f=forced):
                if kind.startswith("bwd"):
                    return _f
                return real_pick(n, cq, cv, isz, osz, kind, highp)
        with mock.patch.object(ccp, "_pick_tile", picker):
            try:
                fb = jax.jit(lambda q, k, v, g: grads(pallas, q, k, v, g))
                got = fb(q, k, v, g)
                for r, o, nm in zip(ref, got, "qkv"):
                    err = np.abs(np.asarray(o.astype(jnp.float32)) - r).max()
                    scale = np.abs(r).max()
                    assert err / scale < 3e-2, f"d{nm} rel err {err/scale:.3e}"
                t = timed(fb, (q, k, v, g))
                results[name] = round(t * 1e3, 3)
                print(f"{name:12s} fwd+bwd {t*1e3:.2f} ms   (numerics OK)")
            except Exception as e:  # noqa: BLE001
                results[name] = None
                print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # jnp baseline
    fb_jnp = jax.jit(lambda q, k, v, g: grads(cca_jnp, q, k, v, g))
    t = timed(fb_jnp, (q, k, v, g))
    print(f"{'jnp':12s} fwd+bwd {t*1e3:.2f} ms")
    results["jnp"] = round(t * 1e3, 3)
    print(results)


if __name__ == "__main__":
    main()
