"""Criss-cross attention — pure-``jnp`` reference implementation (NHWC).

Semantics match the reference's ``cc_attention/functions.py:27-49``: for every
pixel ``(h, w)`` attention runs over the union of its column (``H`` slots) and
its row (``W`` slots) with one joint softmax over the concatenated ``H + W``
axis; the *column-path* self slot ``(h'=h)`` is masked to −inf so the self
pixel is counted exactly once (it remains present via the row path). The
output is gated by a zero-initialised learnable scalar ``gamma`` and added
residually: ``out = gamma * (out_col + out_row) + x``.

This module is the numerics oracle for the fused Pallas kernel in
:mod:`ccnet_tpu.ops.cc_attention_pallas`; it is also a perfectly good XLA
program on its own (everything lowers to batched matmuls on the MXU).

Layout note: the reference is NCHW; we are NHWC end-to-end (TPU lane dim =
channels). The einsums below are the NHWC transcription of the reference's
six permute/reshape + four bmm dance — no ``.contiguous()`` copies exist here,
XLA fuses the transposes into the matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # finite −inf stand-in: keeps softmax/grads NaN-free in bf16/f32


def cca_logits_reference(q: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Criss-cross affinity logits, joint (H+W) axis last.

    Args:
      q, k: (B, H, W, Cqk) query/key features.
    Returns:
      (B, H, W, H + W) logits; slots [0, H) are the column path (attending to
      (h', w)) with the h'==h diagonal masked to −inf, slots [H, H+W) are the
      row path (attending to (h, w')).
    """
    B, H, W, _ = q.shape
    # column path: e[b,h,w,h'] = q[b,h,w]·k[b,h',w]
    e_col = jnp.einsum("bhwc,bkwc->bhwk", q, k, preferred_element_type=jnp.float32)
    diag = jnp.eye(H, dtype=bool)[:, None, :]  # (H, 1, H) broadcast over w
    e_col = jnp.where(diag[None], NEG_INF, e_col)
    # row path: e[b,h,w,w'] = q[b,h,w]·k[b,h,w']
    e_row = jnp.einsum("bhwc,bhvc->bhwv", q, k, preferred_element_type=jnp.float32)
    return jnp.concatenate([e_col, e_row], axis=-1)


def criss_cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Criss-cross attention core (no projections, no residual).

    Args:
      q, k: (B, H, W, Cqk); v: (B, H, W, Cv).
    Returns:
      (B, H, W, Cv) = att_col @ v_column + att_row @ v_row with the joint
      softmax over the concatenated column+row axis.
    """
    B, H, W, _ = q.shape
    logits = cca_logits_reference(q, k)  # (B,H,W,H+W) f32
    att = jax.nn.softmax(logits, axis=-1)
    att_col, att_row = att[..., :H], att[..., H:]
    att_col = att_col.astype(v.dtype)
    att_row = att_row.astype(v.dtype)
    out_col = jnp.einsum("bhwk,bkwc->bhwc", att_col, v, preferred_element_type=jnp.float32)
    out_row = jnp.einsum("bhwv,bhvc->bhwc", att_row, v, preferred_element_type=jnp.float32)
    return (out_col + out_row).astype(v.dtype)
