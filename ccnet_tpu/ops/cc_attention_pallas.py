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


def _dot_precision(mxu_dtype):
    """Dot precision matching the operand cast: f32 operands need an explicit
    HIGHEST attribute or Mosaic still runs a single bf16 MXU pass."""
    return jax.lax.Precision.HIGHEST if mxu_dtype == jnp.float32 else None


def _pick_tile(n: int, cq: int, cv: int, isz: int, bwd: bool,
               highp: bool = False) -> int:
    """Tile size (pixel-lines per grid step) fitting the whole working set in
    VMEM (~16 MB/core on v5e).

    Accounts for ALL live buffers per grid step, not just the v/o blocks:
    the (T, N, N) f32 intermediates (affinity/softmax slabs — 2 live in the
    forward, 3 in the backward with e→p and dp→de buffer reuse), the
    double-buffered input blocks, and the outputs. At crop-scale N (~97)
    this still picks T=16; at long-context N the (T, N, N) slabs dominate
    and T drops to a few lines — the grid is compute-bound there (O(N²)
    MXU work per line), so small T costs nothing. T < 8 switches the
    per-line stats to 4-D (1, T, N, 1) blocks (see ``stats4``) to satisfy
    Mosaic's (sublane, lane) divisibility rule.

    ``highp``: HIGHEST-precision dots make Mosaic stage multi-pass f32
    operand splits on the VMEM stack — measured ~25% over the plain-budget
    estimate at crop shapes — so the budget drops to leave headroom."""
    if bwd:
        per_line = (3 * n * n * 4                      # e/p, dp→de slabs
                    + 2 * n * 2 * (cq + cv) * isz      # q,k,v,g dbl-buffered
                    + 2 * n * (2 * cq + cv) * isz)     # dq,dk,dv (value dtype) dbl
    else:
        per_line = (2 * n * n * 4                      # e, p slabs
                    + 2 * n * (2 * cq + cv) * isz      # q,k,v dbl-buffered
                    + 2 * n * cv * isz)                # o (value dtype) dbl
    budget = (8 if highp else 12) * 1024 * 1024
    t = int(budget // max(per_line, 1))
    if t >= 16:
        return 16
    if t >= 8:
        return 8
    # below 8: power-of-two tiles only (4/2/1) — odd tile counts tickle
    # Mosaic layout corner cases and buy no bandwidth
    return max(1, 1 << (max(t, 1).bit_length() - 1))


# ---------------------------------------------------------------- forward ---


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, *, tile: int, masked: bool,
                mxu_dtype, stats4: bool):
    """One path's forward. Blocks: q/k (1, T, N, Cq), v (1, T, N, Cv);
    outputs o (1, T, N, Cv) f32, m/l (1, T, N) f32. N = attended axis.

    All T lines of the tile go through ONE batched dot_general (batch dim =
    line): better MXU occupancy than a per-line loop. Operands are fed to the
    MXU in bf16 (XLA's own default matmul precision on TPU) with f32
    accumulation. Under 'highest' precision the dots must carry an explicit
    HIGHEST attribute: Mosaic's default still multiplies f32 operands as a
    single bf16 MXU pass (casting to f32 alone buys nothing on hardware —
    only interpret mode would compute true f32).
    """
    prec = _dot_precision(mxu_dtype)
    q_b = q_ref[0].astype(mxu_dtype)  # (T, N, Cq)
    k_b = k_ref[0].astype(mxu_dtype)
    v_b = v_ref[0].astype(mxu_dtype)
    e = jax.lax.dot_general(
        q_b, k_b, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=prec,
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
        preferred_element_type=jnp.float32, precision=prec,
    )  # (T, N, Cv)
    o_ref[0] = o.astype(o_ref.dtype)
    if stats4:  # (1, T, N, 1) stat blocks (T < 8: see _pick_tile)
        m_ref[0, :, :, 0] = m
        l_ref[0, :, :, 0] = l
    else:
        m_ref[0] = m
        l_ref[0] = l


def _run_path_fwd(q, k, v, masked: bool, interpret: bool, mxu_dtype):
    """q/k: (B, M, N, Cq), v: (B, M, N, Cv) — attention along N for each of
    the M independent lines. Returns o (f32), m, l."""
    B, M, N, Cq = q.shape
    Cv = v.shape[-1]
    T = _pick_tile(N, Cq, Cv, v.dtype.itemsize, bwd=False,
                   highp=mxu_dtype == jnp.float32)
    stats4 = T % 8 != 0  # Mosaic needs block dims (-2,-1) divisible-or-full
    Mp = -(-M // T) * T
    if Mp != M:
        pad = [(0, 0), (0, Mp - M), (0, 0), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    grid = (B, Mp // T)

    def im4(b, j):
        return (b, j, 0, 0)

    def im3(b, j):
        return (b, j, 0)

    stat_spec = (pl.BlockSpec((1, T, N, 1), im4, memory_space=pltpu.VMEM)
                 if stats4 else
                 pl.BlockSpec((1, T, N), im3, memory_space=pltpu.VMEM))
    stat_shape = jax.ShapeDtypeStruct((B, Mp, N, 1) if stats4 else (B, Mp, N),
                                      jnp.float32)
    o, m, l = pl.pallas_call(
        functools.partial(_fwd_kernel, tile=T, masked=masked, mxu_dtype=mxu_dtype,
                          stats4=stats4),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, N, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N, Cv), im4, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, N, Cv), im4, memory_space=pltpu.VMEM),
            stat_spec,
            stat_spec,
        ),
        out_shape=(
            # DMA-bound grid: write the unnormalised aggregate in the value
            # dtype (bf16 in training) to halve traffic; keep f32 under
            # 'highest' precision for strict parity.
            jax.ShapeDtypeStruct(
                (B, Mp, N, Cv),
                jnp.float32 if mxu_dtype == jnp.float32 else v.dtype,
            ),
            stat_shape,
            stat_shape,
        ),
        # both grid dims are embarrassingly parallel -> split across the
        # chip's two megacores (the grid is launch/DMA bound, not compute)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(q, k, v)
    if stats4:
        m, l = m[..., 0], l[..., 0]
    if Mp != M:
        o, m, l = o[:, :M], m[:, :M], l[:, :M]
    return o, m, l


# --------------------------------------------------------------- backward ---


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, m_ref, L_ref, d_ref,
                dq_ref, dk_ref, dv_ref, *, tile: int, masked: bool, mxu_dtype,
                stats4: bool):
    """One path's backward. g = d_out (1,T,N,Cv) f32; m/L joint stats; d = δ.

    Recomputes this path's joint-softmax probabilities from (q, k, m, L) and
    emits de = p·(dp − δ), then dq/dk/dv via batched dots (batch dim = line).
    """
    prec = _dot_precision(mxu_dtype)
    q_b = q_ref[0].astype(mxu_dtype)  # (T, N, Cq)
    k_b = k_ref[0].astype(mxu_dtype)
    v_b = v_ref[0].astype(mxu_dtype)
    g_b = g_ref[0].astype(jnp.float32)  # (T, N, Cv)
    if stats4:  # (1, T, N, 1) stat blocks (T < 8: see _pick_tile)
        m_b, L_b, d_b = m_ref[0, :, :, 0], L_ref[0, :, :, 0], d_ref[0, :, :, 0]
    else:
        m_b, L_b, d_b = m_ref[0], L_ref[0], d_ref[0]
    e = jax.lax.dot_general(
        q_b, k_b, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=prec,
    )  # (T, N, N)
    if masked:
        n = e.shape[1]
        ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        e = jnp.where((ii == jj)[None], NEG_INF, e)
    p = jnp.exp(e - m_b[:, :, None]) / L_b[:, :, None]  # (T, N, N)
    dp = jax.lax.dot_general(
        g_b.astype(mxu_dtype), v_b, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (T, N, N): dp[t, i, j] = g_ti · v_tj
    de = (p * (dp - d_b[:, :, None])).astype(mxu_dtype)  # (T, N, N)
    dq_ref[0] = jax.lax.dot_general(
        de, k_b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        de, q_b, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(dk_ref.dtype)
    dv_ref[0] = jax.lax.dot_general(
        p.astype(mxu_dtype), g_b.astype(mxu_dtype),
        (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(dv_ref.dtype)


def _run_path_bwd(q, k, v, g, m, L, delta, masked: bool, interpret: bool, mxu_dtype):
    B, M, N, Cq = q.shape
    Cv = v.shape[-1]
    T = _pick_tile(N, Cq, Cv, v.dtype.itemsize, bwd=True,
                   highp=mxu_dtype == jnp.float32)
    stats4 = T % 8 != 0
    Mp = -(-M // T) * T
    if Mp != M:
        pad4 = [(0, 0), (0, Mp - M), (0, 0), (0, 0)]
        pad3 = [(0, 0), (0, Mp - M), (0, 0)]
        q, k, v, g = (jnp.pad(a, pad4) for a in (q, k, v, g))
        # pad L with ones to avoid 0/0 in the padded region
        m, delta = jnp.pad(m, pad3), jnp.pad(delta, pad3)
        L = jnp.pad(L, pad3, constant_values=1.0)
    if stats4:
        m, L, delta = m[..., None], L[..., None], delta[..., None]
    grid = (B, Mp // T)

    def im4(b, j):
        return (b, j, 0, 0)

    def im3(b, j):
        return (b, j, 0)

    stat_spec = (pl.BlockSpec((1, T, N, 1), im4, memory_space=pltpu.VMEM)
                 if stats4 else
                 pl.BlockSpec((1, T, N), im3, memory_space=pltpu.VMEM))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, tile=T, masked=masked, mxu_dtype=mxu_dtype,
                          stats4=stats4),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, N, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N, Cv), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N, Cv), im4, memory_space=pltpu.VMEM),
            stat_spec,
            stat_spec,
            stat_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, T, N, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N, Cv), im4, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            # grads ride in the value dtype under default precision (they are
            # summed across the two paths then cast to the input dtype anyway
            # — ~halves the output buffers, which decides whether the 769²
            # working set fits VMEM); f32 under 'highest'.
            jax.ShapeDtypeStruct(
                (B, Mp, N, Cq),
                jnp.float32 if mxu_dtype == jnp.float32 else q.dtype),
            jax.ShapeDtypeStruct(
                (B, Mp, N, Cq),
                jnp.float32 if mxu_dtype == jnp.float32 else q.dtype),
            jax.ShapeDtypeStruct(
                (B, Mp, N, Cv),
                jnp.float32 if mxu_dtype == jnp.float32 else v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(q, k, v, g, m, L, delta)
    if Mp != M:
        dq, dk, dv = dq[:, :M], dk[:, :M], dv[:, :M]
    return dq, dk, dv


# ------------------------------------------------------------ partitioning ---
#
# pallas_call has no SPMD rule, so inside a multi-device jit the kernels
# would force an all-gather of the global batch. Both paths are
# embarrassingly parallel over images, so (like ops/upsampled_ce.py) the
# multi-device route goes through a batch-dim ``custom_partitioning``: the
# batch sharding (data-parallel training's layout) is kept, H/W/C are
# replicated per shard, and each shard runs the fused kernel on its local
# images. Under ``interpret`` (CPU mesh tests) the per-shard body is the
# equivalent jnp math — the pallas interpreter cannot lower inside a
# partitioned computation; the kernels themselves are oracle-tested via the
# single-device path (tests/test_pallas_cca.py), the mesh tests validate the
# partitioning.


def _fwd_jnp_stats(q, k, v):
    """jnp mirror of :func:`_fwd_impl`: (out f32, joint-softmax m, L)."""
    from ccnet_tpu.ops.cc_attention import cca_logits_reference

    H = q.shape[1]
    logits = cca_logits_reference(q, k)  # (B, H, W, H+W) f32
    m = jnp.max(logits, axis=-1)
    p = jnp.exp(logits - m[..., None])
    L = jnp.sum(p, axis=-1)
    att = p / L[..., None]
    out_col = jnp.einsum("bhwk,bkwc->bhwc", att[..., :H], v.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
    out_row = jnp.einsum("bhwv,bhvc->bhwc", att[..., H:], v.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
    return out_col + out_row, m, L


def _bwd_both_paths(q, k, v, g, m, L, delta, interpret: bool, precision: str):
    """Full backward (both paths summed) from saved joint stats."""
    md = _mxu_dtype(precision)
    g = g.astype(jnp.float32 if precision == "highest" else v.dtype)
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


_CCA_FWD_RULE = "b h w c, b h w c, b h w d -> b h w d, b h w, b h w"
_CCA_BWD_RULE = ("b h w c, b h w c, b h w d, b h w d, b h w, b h w, b h w "
                 "-> b h w c, b h w c, b h w d")
_CCA_REPL = ("h", "w", "c", "d")


@functools.lru_cache(maxsize=None)
def _partitioned_cca_fwd(interpret: bool, precision: str):
    from ccnet_tpu.ops.upsampled_ce import _def_batch_partition

    if interpret:
        body = _fwd_jnp_stats
    else:
        def body(q, k, v):
            return _fwd_impl(q, k, v, False, precision)
    return _def_batch_partition(body, _CCA_FWD_RULE, _CCA_REPL)


@functools.lru_cache(maxsize=None)
def _partitioned_cca_bwd(interpret: bool, precision: str):
    from ccnet_tpu.ops.upsampled_ce import _def_batch_partition

    if interpret:
        def body(q, k, v, g, m, L, delta):
            _, vjp = jax.vjp(lambda q_, k_, v_: _fwd_jnp_stats(q_, k_, v_)[0], q, k, v)
            dq, dk, dv = vjp(g.astype(jnp.float32))
            return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)
    else:
        def body(q, k, v, g, m, L, delta):
            return _bwd_both_paths(q, k, v, g, m, L, delta, False, precision)
    return _def_batch_partition(body, _CCA_BWD_RULE, _CCA_REPL)


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


def _fwd_dispatch(q, k, v, interpret: bool, precision: str, partitioned: bool):
    """Bare kernels, or the batch-partitioned wrapper for multi-device jits."""
    if partitioned:
        return _partitioned_cca_fwd(bool(interpret), precision)(q, k, v)
    return _fwd_impl(q, k, v, interpret, precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _cca_pallas(q, k, v, interpret: bool, precision: str, partitioned: bool):
    out, _, _ = _fwd_dispatch(q, k, v, interpret, precision, partitioned)
    return out.astype(v.dtype)


def _cca_fwd(q, k, v, interpret: bool, precision: str, partitioned: bool):
    out, m, L = _fwd_dispatch(q, k, v, interpret, precision, partitioned)
    return out.astype(v.dtype), (q, k, v, out, m, L)


def _cca_bwd(interpret: bool, precision: str, partitioned: bool, res, g):
    q, k, v, out, m, L = res
    # delta (= Σ_c out·d_out) is plain jnp — GSPMD shards it natively; the
    # kernel-bound part (both path backwards) goes through the partitioned
    # wrapper under a mesh. d_out rides through the kernels in the value
    # dtype under default precision (DMA-bound grid); f32 under 'highest'.
    delta = jnp.sum(g.astype(jnp.float32) * out, axis=-1)  # (B, H, W)
    if partitioned:
        return _partitioned_cca_bwd(bool(interpret), precision)(
            q, k, v, g.astype(jnp.float32), m, L, delta
        )
    return _bwd_both_paths(q, k, v, g, m, L, delta, interpret, precision)


_cca_pallas.defvjp(_cca_fwd, _cca_bwd)


def criss_cross_attention_pallas(q, k, v, interpret: bool | None = None,
                                 precision: str = "default",
                                 partitioned: bool | None = None):
    """Fused criss-cross attention (joint row+column softmax, self masked).

    Same semantics as :func:`ccnet_tpu.ops.cc_attention.criss_cross_attention`.
    q, k: (B, H, W, Cq); v: (B, H, W, Cv). Returns (B, H, W, Cv) in v.dtype.
    ``interpret`` defaults to True off-TPU (so the kernel logic is testable on
    CPU), False on TPU. ``precision``: 'default' feeds the MXU bf16 operands
    with f32 accumulation (XLA's default matmul precision); 'highest' keeps
    operands f32. ``partitioned`` routes through the batch-dim
    ``custom_partitioning`` wrapper (defaults to True iff >1 device is
    visible, which lets batch-sharded multi-device jits keep their sharding).
    """
    if interpret is None:
        from ccnet_tpu.utils.platform import pallas_interpret_default

        interpret = pallas_interpret_default()
    if partitioned is None:
        partitioned = jax.device_count() > 1
    return _cca_pallas(q, k, v, interpret, precision, bool(partitioned))
