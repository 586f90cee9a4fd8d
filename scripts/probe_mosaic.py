"""Probe Mosaic/Pallas-TPU capabilities the fused CCA kernel redesign needs.

(a) dot_general with a NON-LEADING batch dim inside a kernel
(b) jnp.swapaxes of the two leading (sublane/major) dims of a 3-D VMEM value
(c) non-divisible grid tiling: tail-block load padding + masked stores

Run on the real chip: python scripts/probe_mosaic.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        fn()
        print(f"PASS  {name}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}")
        return False


# ---------------------------------------------------------------- (a) middle batch dot
def _mid_batch_kernel(q_ref, k_ref, o_ref):
    q = q_ref[:]  # (H, T, C)
    k = k_ref[:]
    e = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((1,), (1,))), preferred_element_type=jnp.float32
    )  # (T, H, H)
    o_ref[:] = e


def test_mid_batch():
    H, T, C = 96, 16, 64
    q = jnp.array(np.random.randn(H, T, C), jnp.bfloat16)
    k = jnp.array(np.random.randn(H, T, C), jnp.bfloat16)
    out = pl.pallas_call(
        _mid_batch_kernel,
        out_shape=jax.ShapeDtypeStruct((T, H, H), jnp.float32),
    )(q, k)
    ref = jnp.einsum("htc,gtc->thg", q.astype(jnp.float32), k.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=1e-2)


# ---------------------------------------------------------------- (b) leading swapaxes
def _swap_kernel(x_ref, o_ref):
    o_ref[:] = jnp.swapaxes(x_ref[:], 0, 1)


def test_swapaxes():
    H, T, C = 96, 16, 128
    x = jnp.array(np.random.randn(H, T, C), jnp.bfloat16)
    out = pl.pallas_call(
        _swap_kernel,
        out_shape=jax.ShapeDtypeStruct((T, H, C), jnp.bfloat16),
    )(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(jnp.swapaxes(x, 0, 1)))


# ------------------------------------------------------- (c) non-divisible tiling
def _tile_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


def test_ragged_grid():
    M, N = 97, 256  # M=97 not divisible by T=16 -> 7 tiles, tail masked
    T = 16
    x = jnp.array(np.random.randn(M, N), jnp.float32)
    out = pl.pallas_call(
        _tile_kernel,
        grid=(pl.cdiv(M, T),),
        in_specs=[pl.BlockSpec((T, N), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0, rtol=1e-6)


# ------------------------------------------------- (d) 4D block with middle-batch dot
def _mid_batch4_kernel(q_ref, k_ref, o_ref):
    q = q_ref[0]  # (H, T, C)
    k = k_ref[0]
    o_ref[:] = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((1,), (1,))), preferred_element_type=jnp.float32
    )[None]


def test_mid_batch_4d_grid():
    B, H, W, C = 2, 96, 33, 64  # W=33, T=16 -> ragged too
    T = 16
    q = jnp.array(np.random.randn(B, H, W, C), jnp.bfloat16)
    k = jnp.array(np.random.randn(B, H, W, C), jnp.bfloat16)
    out = pl.pallas_call(
        _mid_batch4_kernel,
        grid=(B, pl.cdiv(W, T)),
        in_specs=[
            pl.BlockSpec((1, H, T, C), lambda b, j: (b, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, T, C), lambda b, j: (b, 0, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, H, H), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, -(-W // T) * T, H, H), jnp.float32),
    )(q, k)
    ref = jnp.einsum("bhtc,bgtc->bthg", q.astype(jnp.float32), k.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out)[:, :W], np.asarray(ref), rtol=2e-2, atol=1e-2
    )


# ------------------------------------------- (e) store with in-kernel leading transpose
def _store_transposed_kernel(x_ref, o_ref):
    x = x_ref[0]  # (H, T, C)
    o_ref[0] = jnp.swapaxes(x, 0, 1)  # (T, H, C)


def test_transposed_store():
    B, H, W, C = 2, 96, 33, 512
    T = 16
    x = jnp.array(np.random.randn(B, H, W, C), jnp.bfloat16)
    out = pl.pallas_call(
        _store_transposed_kernel,
        grid=(B, pl.cdiv(W, T)),
        in_specs=[
            pl.BlockSpec((1, H, T, C), lambda b, j: (b, 0, j, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, T, H, C), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, -(-W // T) * T, H, C), jnp.bfloat16),
    )(x)
    ref = jnp.swapaxes(x, 1, 2)  # (B, W, H, C)
    np.testing.assert_array_equal(np.asarray(out)[:, :W], np.asarray(ref))


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    probe("(a) middle-batch dot_general", test_mid_batch)
    probe("(b) leading-dim swapaxes", test_swapaxes)
    probe("(c) ragged grid (masked tail stores)", test_ragged_grid)
    probe("(d) middle-batch dot + 4D ragged grid", test_mid_batch_4d_grid)
    probe("(e) in-kernel transposed store", test_transposed_store)
