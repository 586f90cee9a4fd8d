"""Fused Pallas TPU kernel for criss-cross attention (forward + custom VJP).

This is the TPU-native equivalent of the reference's historical CUDA pair
``CA_Weight`` (affinity) + ``CA_Map`` (aggregation) and of its batched-matmul
Python rewrite (``cc_attention/functions.py:27-49``) — same math, fully fused:
the (B, H, W, H+W) affinity tensor never touches HBM.

Decomposition — flash-attention-style decoupled softmax over the two paths:

* **column kernel** (grid over batch × column-tiles, layout (B, W, H, C)):
  for every pixel, attention logits against its column (h′, w), self slot
  masked; emits per-path running stats ``m_col, l_col`` and the unnormalised
  aggregate ``o_col = exp(e−m)·V``.
* **row kernel** (grid over batch × row-tiles, natural NHWC layout): same
  against the row (h, w′), no mask.
* **combine** (tiny elementwise, fused by XLA): joint softmax via
  ``m = max(m_col, m_row)``, ``L = l_col·e^{m_col−m} + l_row·e^{m_row−m}``,
  ``out = (o_col·e^{m_col−m} + o_row·e^{m_row−m}) / L`` — exactly the joint
  softmax over the concatenated H+W axis.

Backward recomputes each path's probabilities from (q, k, m, L) inside the
same two grids (O(HW) residual memory instead of O(HW·(H+W))) and forms
``de = p · (dpᵀ − δ)`` with ``δ = Σ_c out·d_out``, yielding per-path
dq/dk/dv that are summed.

Each path is embarrassingly parallel over the other axis, so tiles of
TW(/TH) pixels-lines per grid step keep everything in VMEM; affinity blocks
are (H, H)/(W, W) f32 scratch that never leave the chip.

The self-mask uses a finite −1e9 (not −inf): when H == 1 the whole column
path is masked and ``exp(−1e9 − m)`` underflows to exactly 0 in the combine,
instead of the NaN that (−inf) − (−inf) would produce.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _pick_tile(n_attend: int, cv: int, itemsize: int, budget_bytes: int = 3_000_000) -> int:
    """Tile size (pixel-lines per grid step) keeping v/o blocks under budget.

    The grid is DMA-bound (~24 µs/step floor measured on v5e), so bigger
    tiles and narrower dtypes directly cut wall-clock."""
    per_line = n_attend * cv * itemsize
    t = max(1, min(16, budget_bytes // max(per_line, 1)))
    return 16 if t >= 16 else 8  # sublane rule: tile dim must divide by 8


# ---------------------------------------------------------------- forward ---


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, *, tile: int, masked: bool,
                mxu_dtype):
    """One path's forward. Blocks: q/k (1, T, N, Cq), v (1, T, N, Cv);
    outputs o (1, T, N, Cv) f32, m/l (1, T, N) f32. N = attended axis.

    All T lines of the tile go through ONE batched dot_general (batch dim =
    line): better MXU occupancy than a per-line loop. Operands are fed to the
    MXU in bf16 (XLA's own default matmul precision on TPU) with f32
    accumulation.
    """
    q_b = q_ref[0].astype(mxu_dtype)  # (T, N, Cq)
    k_b = k_ref[0].astype(mxu_dtype)
    v_b = v_ref[0].astype(mxu_dtype)
    e = jax.lax.dot_general(
        q_b, k_b, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (T, N, N): e[t, i, j] = q_ti · k_tj
    if masked:
        n = e.shape[1]
        ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        e = jnp.where((ii == jj)[None], NEG_INF, e)
    m = jnp.max(e, axis=2)  # (T, N)
    p = jnp.exp(e - m[:, :, None])
    l = jnp.sum(p, axis=2)
    o = jax.lax.dot_general(
        p.astype(mxu_dtype), v_b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (T, N, Cv)
    o_ref[0] = o.astype(o_ref.dtype)
    m_ref[0] = m
    l_ref[0] = l


def _run_path_fwd(q, k, v, masked: bool, interpret: bool, mxu_dtype):
    """q/k: (B, M, N, Cq), v: (B, M, N, Cv) — attention along N for each of
    the M independent lines. Returns o (f32), m, l."""
    B, M, N, Cq = q.shape
    Cv = v.shape[-1]
    T = _pick_tile(N, Cv, v.dtype.itemsize)
    Mp = -(-M // T) * T
    if Mp != M:
        pad = [(0, 0), (0, Mp - M), (0, 0), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    grid = (B, Mp // T)

    def im4(b, j):
        return (b, j, 0, 0)

    def im3(b, j):
        return (b, j, 0)

    o, m, l = pl.pallas_call(
        functools.partial(_fwd_kernel, tile=T, masked=masked, mxu_dtype=mxu_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, N, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N, Cv), im4, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, N, Cv), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), im3, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            # DMA-bound grid: write the unnormalised aggregate in the value
            # dtype (bf16 in training) to halve traffic; keep f32 under
            # 'highest' precision for strict parity.
            jax.ShapeDtypeStruct(
                (B, Mp, N, Cv),
                jnp.float32 if mxu_dtype == jnp.float32 else v.dtype,
            ),
            jax.ShapeDtypeStruct((B, Mp, N), jnp.float32),
            jax.ShapeDtypeStruct((B, Mp, N), jnp.float32),
        ),
        # both grid dims are embarrassingly parallel -> split across the
        # chip's two megacores (the grid is launch/DMA bound, not compute)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(q, k, v)
    if Mp != M:
        o, m, l = o[:, :M], m[:, :M], l[:, :M]
    return o, m, l


# --------------------------------------------------------------- backward ---


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, m_ref, L_ref, d_ref,
                dq_ref, dk_ref, dv_ref, *, tile: int, masked: bool, mxu_dtype):
    """One path's backward. g = d_out (1,T,N,Cv) f32; m/L joint stats; d = δ.

    Recomputes this path's joint-softmax probabilities from (q, k, m, L) and
    emits de = p·(dp − δ), then dq/dk/dv via batched dots (batch dim = line).
    """
    q_b = q_ref[0].astype(mxu_dtype)  # (T, N, Cq)
    k_b = k_ref[0].astype(mxu_dtype)
    v_b = v_ref[0].astype(mxu_dtype)
    g_b = g_ref[0].astype(jnp.float32)  # (T, N, Cv)
    e = jax.lax.dot_general(
        q_b, k_b, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (T, N, N)
    if masked:
        n = e.shape[1]
        ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        e = jnp.where((ii == jj)[None], NEG_INF, e)
    p = jnp.exp(e - m_ref[0][:, :, None]) / L_ref[0][:, :, None]  # (T, N, N)
    dp = jax.lax.dot_general(
        g_b.astype(mxu_dtype), v_b, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (T, N, N): dp[t, i, j] = g_ti · v_tj
    de = (p * (dp - d_ref[0][:, :, None])).astype(mxu_dtype)  # (T, N, N)
    dq_ref[0] = jax.lax.dot_general(
        de, k_b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dk_ref[0] = jax.lax.dot_general(
        de, q_b, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dv_ref[0] = jax.lax.dot_general(
        p.astype(mxu_dtype), g_b.astype(mxu_dtype),
        (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    )


def _run_path_bwd(q, k, v, g, m, L, delta, masked: bool, interpret: bool, mxu_dtype):
    B, M, N, Cq = q.shape
    Cv = v.shape[-1]
    T = _pick_tile(N, Cv, v.dtype.itemsize, budget_bytes=1_000_000)
    Mp = -(-M // T) * T
    if Mp != M:
        pad4 = [(0, 0), (0, Mp - M), (0, 0), (0, 0)]
        pad3 = [(0, 0), (0, Mp - M), (0, 0)]
        q, k, v, g = (jnp.pad(a, pad4) for a in (q, k, v, g))
        # pad L with ones to avoid 0/0 in the padded region
        m, delta = jnp.pad(m, pad3), jnp.pad(delta, pad3)
        L = jnp.pad(L, pad3, constant_values=1.0)
    grid = (B, Mp // T)

    def im4(b, j):
        return (b, j, 0, 0)

    def im3(b, j):
        return (b, j, 0)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, tile=T, masked=masked, mxu_dtype=mxu_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, N, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N, Cv), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N, Cv), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), im3, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, N, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N, Cv), im4, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Mp, N, Cq), jnp.float32),
            jax.ShapeDtypeStruct((B, Mp, N, Cq), jnp.float32),
            jax.ShapeDtypeStruct((B, Mp, N, Cv), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(q, k, v, g, m, L, delta)
    if Mp != M:
        dq, dk, dv = dq[:, :M], dk[:, :M], dv[:, :M]
    return dq, dk, dv


# -------------------------------------------------------------- public op ---


def _to_col(x):  # NHWC -> (B, W, H, C): column attention lines are columns
    return jnp.swapaxes(x, 1, 2)


def _mxu_dtype(precision: str):
    return jnp.float32 if precision == "highest" else jnp.bfloat16


def _fwd_impl(q, k, v, interpret: bool, precision: str):
    md = _mxu_dtype(precision)
    # column path in (B, W, H, C); row path in natural (B, H, W, C)
    o_c, m_c, l_c = _run_path_fwd(_to_col(q), _to_col(k), _to_col(v), True, interpret, md)
    o_r, m_r, l_r = _run_path_fwd(q, k, v, False, interpret, md)
    o_c, m_c, l_c = _to_col(o_c), jnp.swapaxes(m_c, 1, 2), jnp.swapaxes(l_c, 1, 2)

    m = jnp.maximum(m_c, m_r)
    a_c = jnp.exp(m_c - m)
    a_r = jnp.exp(m_r - m)
    L = l_c * a_c + l_r * a_r
    out = (o_c.astype(jnp.float32) * a_c[..., None]
           + o_r.astype(jnp.float32) * a_r[..., None]) / L[..., None]
    return out, m, L


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _cca_pallas(q, k, v, interpret: bool, precision: str):
    out, _, _ = _fwd_impl(q, k, v, interpret, precision)
    return out.astype(v.dtype)


def _cca_fwd(q, k, v, interpret: bool, precision: str):
    out, m, L = _fwd_impl(q, k, v, interpret, precision)
    return out.astype(v.dtype), (q, k, v, out, m, L)


def _cca_bwd(interpret: bool, precision: str, res, g):
    q, k, v, out, m, L = res
    delta = jnp.sum(g.astype(jnp.float32) * out, axis=-1)  # (B, H, W)
    # d_out rides through the kernels in the value dtype under default
    # precision (DMA-bound grid); f32 under 'highest'.
    g = g.astype(jnp.float32 if precision == "highest" else v.dtype)

    md = _mxu_dtype(precision)
    dq_c, dk_c, dv_c = _run_path_bwd(
        _to_col(q), _to_col(k), _to_col(v), _to_col(g),
        jnp.swapaxes(m, 1, 2), jnp.swapaxes(L, 1, 2), jnp.swapaxes(delta, 1, 2),
        True, interpret, md,
    )
    dq_r, dk_r, dv_r = _run_path_bwd(q, k, v, g, m, L, delta, False, interpret, md)

    dq = _to_col(dq_c) + dq_r
    dk = _to_col(dk_c) + dk_r
    dv = _to_col(dv_c) + dv_r
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_cca_pallas.defvjp(_cca_fwd, _cca_bwd)


def criss_cross_attention_pallas(q, k, v, interpret: bool | None = None,
                                 precision: str = "default"):
    """Fused criss-cross attention (joint row+column softmax, self masked).

    Same semantics as :func:`ccnet_tpu.ops.cc_attention.criss_cross_attention`.
    q, k: (B, H, W, Cq); v: (B, H, W, Cv). Returns (B, H, W, Cv) in v.dtype.
    ``interpret`` defaults to True off-TPU (so the kernel logic is testable on
    CPU), False on TPU. ``precision``: 'default' feeds the MXU bf16 operands
    with f32 accumulation (XLA's default matmul precision); 'highest' keeps
    operands f32.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _cca_pallas(q, k, v, interpret, precision)
