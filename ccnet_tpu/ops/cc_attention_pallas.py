"""Fused Pallas TPU kernel for criss-cross attention (forward + custom VJP).

This is the TPU-native equivalent of the reference's historical CUDA pair
``CA_Weight`` (affinity) + ``CA_Map`` (aggregation) and of its batched-matmul
Python rewrite (``cc_attention/functions.py:27-49``) — same math, fully fused:
the (B, H, W, H+W) affinity tensor never touches HBM.

Decomposition — flash-attention-style decoupled softmax over the two paths,
with ALL tensors in natural NHWC layout (no XLA transposes of q/k/v/o and no
padding glue; the grids are ragged and Mosaic masks the tail stores):

* **column kernel** (grid over batch × column-tiles): loads (1, H, T, C)
  blocks straight from NHWC, transposes to line-major in-register (a
  sublane shuffle — the lane/channel dim is untouched), computes the
  column-path logits against the full column (self slot masked at −1e9)
  and emits the unnormalised aggregate ``o_col = exp(e−m)·V`` back in
  NHWC plus per-path running stats ``m_col, l_col`` (stored (B, W, H) so
  their lane dim stays full; one O(BHW) XLA transpose rides between the
  calls).
* **row kernel** (grid over batch × row-tiles, everything natural): computes
  the row path AND fuses the joint-softmax combine in-kernel:
  ``m = max(m_col, m_row)``, ``L = l_col·e^{m_col−m} + l_row·e^{m_row−m}``,
  ``out = (o_col·e^{m_col−m} + o_row·e^{m_row−m}) / L`` — exactly the joint
  softmax over the concatenated H+W axis — so the per-path aggregates make
  one HBM round-trip total.

Backward recomputes each path's probabilities from (q, k, m, L) inside the
same two grids (O(HW) residual memory instead of O(HW·(H+W))) and forms
``de = p · (dpᵀ − δ)`` with ``δ = Σ_c out·d_out``. The column grid writes its
dq/dk/dv in NHWC; the row grid computes its own and fuses the two-path sum
in-kernel, so the gradients also make one round-trip.

Each path is embarrassingly parallel over the other axis, so tiles of
T pixel-lines per grid step keep everything in VMEM; affinity blocks
are (T, H, H)/(T, W, W) f32 working sets that never leave the chip.

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


def _pick_tile(n: int, cq: int, cv: int, isz: int, osz: int, kind: str,
               highp: bool = False) -> int:
    """Tile size (pixel-lines per grid step) fitting the whole working set in
    VMEM (~16 MB/core on v5e). ``n`` is the attended-axis length.

    Accounts for ALL live buffers per grid step: the (T, n, n) f32
    intermediates (2 slabs forward — e reused as p; 3 backward), the
    double-buffered NHWC input blocks plus their in-register transposed
    copies (column kernels), the f32 compute aggregates, and the
    double-buffered outputs. At crop-scale n (~97) this picks T=8; at
    long-context n the (T, n, n) slabs dominate and T drops to a few
    lines — the grid is compute-bound there (O(n²) MXU work per line), so
    small T costs nothing.

    ``highp``: HIGHEST-precision dots make Mosaic stage multi-pass f32
    operand splits on the VMEM stack — measured ~25% over the plain-budget
    estimate at crop shapes — so the budget drops to leave headroom."""
    if kind == "fwd_col":
        # dbl in (3 tensors) + transposed copies + o f32 (+transposed) + dbl out
        per_line = (2 * n * n * 4
                    + 3 * n * (2 * cq + cv) * isz
                    + 2 * n * cv * 4
                    + 2 * n * cv * osz)
    elif kind == "fwd_row":
        # dbl in q,k,v,o_col + o_row/out f32 + dbl out
        per_line = (2 * n * n * 4
                    + 2 * n * (2 * cq * isz + cv * isz + cv * osz)
                    + 2 * n * cv * 4
                    + 2 * n * cv * osz)
    elif kind == "bwd_col":
        # 3 slabs + dbl in q,k,v,g + transposed copies (g rides at MXU dtype,
        # not f32) + f32 dot-result grads + their swapped STORE copies at the
        # output dtype (the pre-store transpose casts, so it is osz not 4)
        # + dbl out. Measured on-chip at the flagship (8, 97, 97, 64/512)
        # bf16 shape: T=8 compiles and runs (T=16 overflows VMEM), 3.89 ms
        # fwd+bwd vs 5.39 ms via the legacy fallback this estimate used to
        # force (scripts/probe_bwd_t8.py).
        per_line = (3 * n * n * 4
                    + 3 * n * 2 * (cq + cv) * isz
                    + n * (2 * cq + cv) * (4 + osz)
                    + 2 * n * (2 * cq + cv) * osz)
    elif kind == "bwd_row":
        # 3 slabs + dbl in q,k,v,g + col grads + f32 grads + dbl out
        per_line = (3 * n * n * 4
                    + 2 * n * (2 * (cq + cv) * isz + (2 * cq + cv) * osz)
                    + n * (2 * cq + cv) * 4
                    + 2 * n * (2 * cq + cv) * osz)
    else:  # pragma: no cover
        raise ValueError(kind)
    budget = (8 if highp else 11) * 1024 * 1024
    t = int(budget // max(per_line, 1))
    if t >= 16:
        return 16
    if t >= 8:
        return 8
    # below 8: power-of-two tiles only (4/2/1) — odd tile counts tickle
    # Mosaic layout corner cases and buy no bandwidth
    return max(1, 1 << (max(t, 1).bit_length() - 1))


# ---------------------------------------------------------------- forward ---


def _fwd_col_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, *, mxu_dtype):
    """Column path. Blocks: q/k (1, H, T, Cq), v (1, H, T, Cv) — T columns in
    natural NHWC; outputs o_col (1, H, T, Cv), stats (1, T, H) in the
    (B, W, H) stats layout (lane dim = full H). The in-register swapaxes is a
    sublane shuffle (channel lane dim untouched).

    All T lines go through ONE batched dot_general (batch dim = line): better
    MXU occupancy than a per-line loop. Operands are fed to the MXU in bf16
    (XLA's own default matmul precision on TPU) with f32 accumulation. Under
    'highest' precision the dots must carry an explicit HIGHEST attribute:
    Mosaic's default still multiplies f32 operands as a single bf16 MXU pass.
    """
    prec = _dot_precision(mxu_dtype)
    q_b = jnp.swapaxes(q_ref[0], 0, 1).astype(mxu_dtype)  # (T, H, Cq)
    k_b = jnp.swapaxes(k_ref[0], 0, 1).astype(mxu_dtype)
    v_b = jnp.swapaxes(v_ref[0], 0, 1).astype(mxu_dtype)  # (T, H, Cv)
    e = jax.lax.dot_general(
        q_b, k_b, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=prec,
    )  # (T, H, H): e[t, i, j] = q_ti · k_tj (pixels (i, t) vs (j, t))
    n = e.shape[1]
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    e = jnp.where((ii == jj)[None], NEG_INF, e)
    m = jnp.max(e, axis=2)  # (T, H)
    p = jnp.exp(e - m[:, :, None])
    l = jnp.sum(p, axis=2)
    o = jax.lax.dot_general(
        p.astype(mxu_dtype), v_b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (T, H, Cv)
    o_ref[0] = jnp.swapaxes(o, 0, 1).astype(o_ref.dtype)  # (H, T, Cv) — NHWC
    m_ref[0] = m
    l_ref[0] = l


def _fwd_row_kernel(q_ref, k_ref, v_ref, oc_ref, mc_ref, lc_ref,
                    out_ref, m_ref, l_ref, *, mxu_dtype):
    """Row path + in-kernel joint-softmax combine. Blocks: (1, T, W, *) rows,
    all natural NHWC; stats (1, T, W). Emits the FINAL normalised output and
    the joint (m, L) residuals."""
    prec = _dot_precision(mxu_dtype)
    q_b = q_ref[0].astype(mxu_dtype)  # (T, W, Cq)
    k_b = k_ref[0].astype(mxu_dtype)
    v_b = v_ref[0].astype(mxu_dtype)
    e = jax.lax.dot_general(
        q_b, k_b, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=prec,
    )  # (T, W, W) — no self mask on the row path (reference semantics)
    m_r = jnp.max(e, axis=2)  # (T, W)
    p = jnp.exp(e - m_r[:, :, None])
    l_r = jnp.sum(p, axis=2)
    o_r = jax.lax.dot_general(
        p.astype(mxu_dtype), v_b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (T, W, Cv) f32

    m_c = mc_ref[0]  # (T, W) f32
    l_c = lc_ref[0]
    o_c = oc_ref[0].astype(jnp.float32)  # (T, W, Cv)
    m = jnp.maximum(m_c, m_r)
    a_c = jnp.exp(m_c - m)
    a_r = jnp.exp(m_r - m)
    L = l_c * a_c + l_r * a_r
    out = (o_c * a_c[:, :, None] + o_r * a_r[:, :, None]) / L[:, :, None]
    out_ref[0] = out.astype(out_ref.dtype)
    m_ref[0] = m
    l_ref[0] = L


def _fwd_impl(q, k, v, interpret: bool, precision: str):
    """q/k: (B, H, W, Cq), v: (B, H, W, Cv) NHWC. Returns (out, m, L) with the
    joint-softmax stats as (B, H, W) f32 residuals.

    Route dispatch: the fused natural-layout kernels need their line tile at
    block dim -2, which Mosaic requires to be a multiple of 8 — fine whenever
    the (8, N, N) f32 slabs fit VMEM (every crop/whole-image shape), not at
    extreme long-context N, where the transposed legacy route (tile at dim
    -3, any T ≥ 1) takes over. Both routes share the (q, k, v, out, m, L)
    residual format, so forward/backward may resolve independently."""
    md = _mxu_dtype(precision)
    B, H, W, Cq = q.shape
    Cv = v.shape[-1]
    o_dtype = jnp.float32 if md == jnp.float32 else v.dtype
    osz = jnp.dtype(o_dtype).itemsize
    highp = md == jnp.float32
    isz = v.dtype.itemsize
    if (_pick_tile(H, Cq, Cv, isz, osz, "fwd_col", highp) >= 8
            and _pick_tile(W, Cq, Cv, isz, osz, "fwd_row", highp) >= 8):
        return _fwd_impl_natural(q, k, v, interpret, precision)
    return _legacy_fwd_impl(q, k, v, interpret, precision)


def _fwd_impl_natural(q, k, v, interpret: bool, precision: str):
    """Fused natural-layout forward: two pallas_calls, zero full-tensor XLA
    glue (no transposes of q/k/v/o, no padding, combine in-kernel)."""
    md = _mxu_dtype(precision)
    B, H, W, Cq = q.shape
    Cv = v.shape[-1]
    o_dtype = jnp.float32 if md == jnp.float32 else v.dtype
    osz = jnp.dtype(o_dtype).itemsize
    highp = md == jnp.float32

    def im4(b, j):
        return (b, 0, j, 0)

    def im4r(b, i):
        return (b, i, 0, 0)

    def im3(b, j):
        return (b, j, 0)

    # ---- column path: grid over column tiles, blocks straight from NHWC
    Tc = _pick_tile(H, Cq, Cv, v.dtype.itemsize, osz, "fwd_col", highp)
    o_c, m_c, l_c = pl.pallas_call(
        functools.partial(_fwd_col_kernel, mxu_dtype=md),
        grid=(B, pl.cdiv(W, Tc)),
        in_specs=[
            pl.BlockSpec((1, H, Tc, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Tc, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Tc, Cv), im4, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, H, Tc, Cv), im4, memory_space=pltpu.VMEM),
            # stats in (B, W, H) layout: lane dim = full H
            pl.BlockSpec((1, Tc, H), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tc, H), im3, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            # DMA-bound grid: write the unnormalised aggregate in the value
            # dtype (bf16 in training) to halve traffic; keep f32 under
            # 'highest' precision for strict parity.
            jax.ShapeDtypeStruct((B, H, W, Cv), o_dtype),
            jax.ShapeDtypeStruct((B, W, H), jnp.float32),
            jax.ShapeDtypeStruct((B, W, H), jnp.float32),
        ),
        # both grid dims are embarrassingly parallel -> split across the
        # chip's two megacores (the grid is launch/DMA bound, not compute)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(q, k, v)
    # the only XLA glue left: O(BHW) stat transposes into row-major
    m_c = jnp.swapaxes(m_c, 1, 2)  # (B, H, W)
    l_c = jnp.swapaxes(l_c, 1, 2)

    # ---- row path + combine: everything natural, final output in one pass
    Tr = _pick_tile(W, Cq, Cv, v.dtype.itemsize, osz, "fwd_row", highp)
    out, m, L = pl.pallas_call(
        functools.partial(_fwd_row_kernel, mxu_dtype=md),
        grid=(B, pl.cdiv(H, Tr)),
        in_specs=[
            pl.BlockSpec((1, Tr, W, Cq), im4r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W, Cq), im4r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W, Cv), im4r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W, Cv), im4r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W), im3, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Tr, W, Cv), im4r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W), im3, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, Cv), o_dtype),
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(q, k, v, o_c, m_c, l_c)
    return out, m, L


# --------------------------------------------------------------- backward ---


def _bwd_col_kernel(q_ref, k_ref, v_ref, g_ref, m_ref, L_ref, d_ref,
                    dq_ref, dk_ref, dv_ref, *, mxu_dtype):
    """Column-path backward. Blocks (1, H, T, *) NHWC; joint stats (1, T, H)
    in the (B, W, H) layout. Recomputes the column share of the joint softmax
    from (q, k, m, L), emits de = p·(dp − δ) and this path's dq/dk/dv back in
    NHWC."""
    prec = _dot_precision(mxu_dtype)
    q_b = jnp.swapaxes(q_ref[0], 0, 1).astype(mxu_dtype)  # (T, H, Cq)
    k_b = jnp.swapaxes(k_ref[0], 0, 1).astype(mxu_dtype)
    v_b = jnp.swapaxes(v_ref[0], 0, 1).astype(mxu_dtype)
    # g rides at MXU dtype end to end: every consumer is a dot operand, so an
    # f32 staging copy would only burn a (T, H, Cv) VMEM slab
    g_b = jnp.swapaxes(g_ref[0], 0, 1).astype(mxu_dtype)  # (T, H, Cv)
    m_b, L_b, d_b = m_ref[0], L_ref[0], d_ref[0]  # (T, H)
    e = jax.lax.dot_general(
        q_b, k_b, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=prec,
    )  # (T, H, H)
    n = e.shape[1]
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    e = jnp.where((ii == jj)[None], NEG_INF, e)
    p = jnp.exp(e - m_b[:, :, None]) / L_b[:, :, None]  # (T, H, H)
    dp = jax.lax.dot_general(
        g_b, v_b, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (T, H, H): dp[t, i, j] = g_ti · v_tj
    de = (p * (dp - d_b[:, :, None])).astype(mxu_dtype)  # (T, H, H)
    dq = jax.lax.dot_general(
        de, k_b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=prec,
    )
    dk = jax.lax.dot_general(
        de, q_b, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=prec,
    )
    dv = jax.lax.dot_general(
        p.astype(mxu_dtype), g_b,
        (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=prec,
    )
    dq_ref[0] = jnp.swapaxes(dq, 0, 1).astype(dq_ref.dtype)  # (H, T, Cq)
    dk_ref[0] = jnp.swapaxes(dk, 0, 1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.swapaxes(dv, 0, 1).astype(dv_ref.dtype)


def _bwd_row_kernel(q_ref, k_ref, v_ref, g_ref, m_ref, L_ref, d_ref,
                    dqc_ref, dkc_ref, dvc_ref,
                    dq_ref, dk_ref, dv_ref, *, mxu_dtype):
    """Row-path backward + in-kernel two-path gradient sum. Blocks
    (1, T, W, *) rows, natural; stats (1, T, W). Emits the FINAL
    dq/dk/dv = column + row, so the gradients make one HBM round-trip."""
    prec = _dot_precision(mxu_dtype)
    q_b = q_ref[0].astype(mxu_dtype)  # (T, W, Cq)
    k_b = k_ref[0].astype(mxu_dtype)
    v_b = v_ref[0].astype(mxu_dtype)
    g_b = g_ref[0].astype(mxu_dtype)  # (T, W, Cv) — dot operand only
    m_b, L_b, d_b = m_ref[0], L_ref[0], d_ref[0]  # (T, W)
    e = jax.lax.dot_general(
        q_b, k_b, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=prec,
    )  # (T, W, W) — unmasked row path
    p = jnp.exp(e - m_b[:, :, None]) / L_b[:, :, None]
    dp = jax.lax.dot_general(
        g_b, v_b, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )
    de = (p * (dp - d_b[:, :, None])).astype(mxu_dtype)
    dq = jax.lax.dot_general(
        de, k_b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=prec,
    )
    dk = jax.lax.dot_general(
        de, q_b, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=prec,
    )
    dv = jax.lax.dot_general(
        p.astype(mxu_dtype), g_b,
        (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=prec,
    )
    dq_ref[0] = (dq + dqc_ref[0].astype(jnp.float32)).astype(dq_ref.dtype)
    dk_ref[0] = (dk + dkc_ref[0].astype(jnp.float32)).astype(dk_ref.dtype)
    dv_ref[0] = (dv + dvc_ref[0].astype(jnp.float32)).astype(dv_ref.dtype)


def _bwd_both_paths(q, k, v, g, m, L, delta, interpret: bool, precision: str):
    """Full backward from saved joint stats, route-dispatched like the
    forward (see :func:`_fwd_impl`)."""
    md = _mxu_dtype(precision)
    B, H, W, Cq = q.shape
    Cv = v.shape[-1]
    gv_dtype = jnp.float32 if md == jnp.float32 else v.dtype
    osz = jnp.dtype(gv_dtype).itemsize
    highp = md == jnp.float32
    isz = v.dtype.itemsize
    if (_pick_tile(H, Cq, Cv, isz, osz, "bwd_col", highp) >= 8
            and _pick_tile(W, Cq, Cv, isz, osz, "bwd_row", highp) >= 8):
        return _bwd_natural(q, k, v, g, m, L, delta, interpret, precision)
    return _legacy_bwd_both_paths(q, k, v, g, m, L, delta, interpret, precision)


def _bwd_natural(q, k, v, g, m, L, delta, interpret: bool, precision: str):
    """Fused natural-layout backward (both paths, summed in the row kernel).
    g/m/L/delta are (B, H, W, Cv)/(B, H, W) in natural layout."""
    md = _mxu_dtype(precision)
    B, H, W, Cq = q.shape
    Cv = v.shape[-1]
    g = g.astype(jnp.float32 if precision == "highest" else v.dtype)
    # grads ride in the value dtype under default precision (they are
    # summed in-kernel then cast to the input dtype anyway — ~halves the
    # buffers); f32 under 'highest'.
    gq_dtype = jnp.float32 if md == jnp.float32 else q.dtype
    gv_dtype = jnp.float32 if md == jnp.float32 else v.dtype
    osz = jnp.dtype(gv_dtype).itemsize
    highp = md == jnp.float32

    def im4(b, j):
        return (b, 0, j, 0)

    def im4r(b, i):
        return (b, i, 0, 0)

    def im3(b, j):
        return (b, j, 0)

    # joint stats into the (B, W, H) layout for the column grid (tiny)
    m_t = jnp.swapaxes(m, 1, 2)
    L_t = jnp.swapaxes(L, 1, 2)
    d_t = jnp.swapaxes(delta, 1, 2)

    Tc = _pick_tile(H, Cq, Cv, v.dtype.itemsize, osz, "bwd_col", highp)
    dq_c, dk_c, dv_c = pl.pallas_call(
        functools.partial(_bwd_col_kernel, mxu_dtype=md),
        grid=(B, pl.cdiv(W, Tc)),
        in_specs=[
            pl.BlockSpec((1, H, Tc, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Tc, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Tc, Cv), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Tc, Cv), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tc, H), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tc, H), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tc, H), im3, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, H, Tc, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Tc, Cq), im4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Tc, Cv), im4, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, Cq), gq_dtype),
            jax.ShapeDtypeStruct((B, H, W, Cq), gq_dtype),
            jax.ShapeDtypeStruct((B, H, W, Cv), gv_dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(q, k, v, g, m_t, L_t, d_t)

    Tr = _pick_tile(W, Cq, Cv, v.dtype.itemsize, osz, "bwd_row", highp)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_row_kernel, mxu_dtype=md),
        grid=(B, pl.cdiv(H, Tr)),
        in_specs=[
            pl.BlockSpec((1, Tr, W, Cq), im4r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W, Cq), im4r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W, Cv), im4r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W, Cv), im4r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W, Cq), im4r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W, Cq), im4r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W, Cv), im4r, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Tr, W, Cq), im4r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W, Cq), im4r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W, Cv), im4r, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, Cq), gq_dtype),
            jax.ShapeDtypeStruct((B, H, W, Cq), gq_dtype),
            jax.ShapeDtypeStruct((B, H, W, Cv), gv_dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(q, k, v, g, m, L, delta, dq_c, dk_c, dv_c)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# ------------------------------------------------------------ legacy route ---


def _to_col(x):  # NHWC -> (B, W, H, C): column attention lines are columns
    return jnp.swapaxes(x, 1, 2)


#
# Transposed-layout route for shapes whose (8, N, N) f32 slabs exceed VMEM
# (long-context N, where T must drop below 8 — legal here because the tile
# sits at block dim -3). Each path runs over pre-transposed (B, M, N, C)
# arrays with XLA providing the transposes, padding and the two-path
# combine. At such N the grids are compute-bound (O(N^2) MXU work per
# line), so the glue is a small fraction of the op.


def _legacy_pick_tile(n: int, cq: int, cv: int, isz: int, bwd: bool,
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



def _legacy_fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, *, tile: int, masked: bool,
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


def _legacy_run_path_fwd(q, k, v, masked: bool, interpret: bool, mxu_dtype):
    """q/k: (B, M, N, Cq), v: (B, M, N, Cv) — attention along N for each of
    the M independent lines. Returns o (f32), m, l."""
    B, M, N, Cq = q.shape
    Cv = v.shape[-1]
    T = _legacy_pick_tile(N, Cq, Cv, v.dtype.itemsize, bwd=False,
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
        functools.partial(_legacy_fwd_kernel, tile=T, masked=masked, mxu_dtype=mxu_dtype,
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


def _legacy_bwd_kernel(q_ref, k_ref, v_ref, g_ref, m_ref, L_ref, d_ref,
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


def _legacy_run_path_bwd(q, k, v, g, m, L, delta, masked: bool, interpret: bool, mxu_dtype):
    B, M, N, Cq = q.shape
    Cv = v.shape[-1]
    T = _legacy_pick_tile(N, Cq, Cv, v.dtype.itemsize, bwd=True,
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
        functools.partial(_legacy_bwd_kernel, tile=T, masked=masked, mxu_dtype=mxu_dtype,
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



def _legacy_fwd_impl(q, k, v, interpret: bool, precision: str):
    md = _mxu_dtype(precision)
    # column path in (B, W, H, C); row path in natural (B, H, W, C)
    o_c, m_c, l_c = _legacy_run_path_fwd(_to_col(q), _to_col(k), _to_col(v), True, interpret, md)
    o_r, m_r, l_r = _legacy_run_path_fwd(q, k, v, False, interpret, md)
    o_c, m_c, l_c = _to_col(o_c), jnp.swapaxes(m_c, 1, 2), jnp.swapaxes(l_c, 1, 2)

    m = jnp.maximum(m_c, m_r)
    a_c = jnp.exp(m_c - m)
    a_r = jnp.exp(m_r - m)
    L = l_c * a_c + l_r * a_r
    out = (o_c.astype(jnp.float32) * a_c[..., None]
           + o_r.astype(jnp.float32) * a_r[..., None]) / L[..., None]
    return out, m, L



def _legacy_bwd_both_paths(q, k, v, g, m, L, delta, interpret: bool, precision: str):
    """Full backward (both paths summed) from saved joint stats."""
    md = _mxu_dtype(precision)
    g = g.astype(jnp.float32 if precision == "highest" else v.dtype)
    dq_c, dk_c, dv_c = _legacy_run_path_bwd(
        _to_col(q), _to_col(k), _to_col(v), _to_col(g),
        jnp.swapaxes(m, 1, 2), jnp.swapaxes(L, 1, 2), jnp.swapaxes(delta, 1, 2),
        True, interpret, md,
    )
    dq_r, dk_r, dv_r = _legacy_run_path_bwd(q, k, v, g, m, L, delta, False, interpret, md)

    dq = _to_col(dq_c) + dq_r
    dk = _to_col(dk_c) + dk_r
    dv = _to_col(dv_c) + dv_r
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)




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


def _mxu_dtype(precision: str):
    return jnp.float32 if precision == "highest" else jnp.bfloat16


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
