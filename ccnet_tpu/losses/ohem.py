"""Online hard example mining (OHEM) cross-entropy — fully on-device.

Selection semantics of the reference (``loss/loss.py:20-78``): keep the
pixels whose predicted probability for their *correct* class is ≤
``max(thresh, p_k)`` where ``p_k`` is the k-th smallest correct-class
probability among valid pixels, k = min_kept; if fewer than ``min_kept``
valid pixels exist, keep everything. Non-kept pixels are relabelled to
ignore before the CE.

TPU-native deviation (deliberate, SURVEY §7c): the reference computed the
threshold on a 1/8-``scipy.ndimage.zoom``-ed CPU copy with ``min_kept/64``
(a host-sync speed hack costing a device→CPU round trip *every step*,
reference ``loss/loss.py:52-76``). Here the k-th statistic is exact, at full
resolution, via on-device count-bisection (:func:`kth_smallest_bisect`) — no
host sync, no sort, same selection rule.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ccnet_tpu.losses.cross_entropy import masked_mean


def kth_smallest_bisect(x: jnp.ndarray, k: int, iters: int = 25,
                        lo: float = 0.0, hi: float = 1.0) -> jnp.ndarray:
    """k-th smallest of flat ``x`` values in [0, 1] via count-bisection.

    A full ``jnp.sort`` of the ~4.7M-pixel probability map costs ~84 ms/step
    on a v5e. Quaternary bisection instead: each pass tests THREE interior
    thresholds with one read of ``x`` (XLA multi-output-fuses the three
    comparison+sum reductions into a single loop), narrowing the interval 4×
    per pass — 25 passes reach width 4⁻²⁵ = 2⁻⁵⁰, below f32 resolution, at
    half the HBM traffic of 50 binary passes. Values > 1 (e.g. +inf padding
    for invalid pixels) sort after everything and never win.
    """

    def body(_, lohi):
        lo, hi = lohi
        d = hi - lo
        m1 = lo + 0.25 * d
        m2 = lo + 0.5 * d
        m3 = lo + 0.75 * d
        c1 = jnp.sum(x <= m1)
        c2 = jnp.sum(x <= m2)
        c3 = jnp.sum(x <= m3)
        # smallest quarter [q_lo, q_hi] whose upper edge still has >= k values
        new_lo = jnp.where(c1 >= k, lo, jnp.where(c2 >= k, m1, jnp.where(c3 >= k, m2, m3)))
        new_hi = jnp.where(c1 >= k, m1, jnp.where(c2 >= k, m2, jnp.where(c3 >= k, m3, hi)))
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(
        0, iters, body, (jnp.float32(lo), jnp.float32(hi))
    )
    return hi


def ohem_threshold(flat: jnp.ndarray, k: int, thresh: float,
                   num_valid: jnp.ndarray, min_kept: int) -> jnp.ndarray:
    """The reference's OHEM keep-threshold ``max(thresh, p_k)``, exactly.

    The k-th statistic only matters when it EXCEEDS ``thresh`` (otherwise the
    max collapses to ``thresh``), so one counting pass decides which case
    holds and the bisection brackets ``(thresh, 1]`` only — and it can stop as
    soon as the bracket is narrower than one f32 ulp at ``thresh`` (then at
    most one representable value lies inside, so ``p <= hi`` and ``p <= p_k``
    select identical pixel sets). For thresh 0.7 that is 13 quaternary passes
    (⌈log₄(0.3 / 2⁻²⁴)⌉ + 1 rounding margin) instead of 25.
    """
    t = jnp.float32(thresh)
    if thresh <= 0.0:
        kth = kth_smallest_bisect(flat, k)
    else:
        c_t = jnp.sum(flat <= t)
        width = 1.0 - thresh
        ulp = 2.0 ** (math.floor(math.log2(thresh)) - 23)
        iters = max(1, min(25, math.ceil(math.log(max(width, 1e-9) / ulp, 4)) + 1))
        kth = kth_smallest_bisect(flat, k, iters=iters, lo=thresh, hi=1.0)
        kth = jnp.where(c_t >= k, t, kth)
    return jnp.where(
        num_valid <= min_kept,
        jnp.float32(1.0),  # keep all valid pixels
        jnp.maximum(t, kth),
    )


def ohem_keep_mask(
    p_correct: jnp.ndarray,
    valid: jnp.ndarray,
    thresh: float,
    min_kept: int,
) -> jnp.ndarray:
    """The reference's selection rule on precomputed correct-class probs.

    Keep valid pixels with ``p ≤ max(thresh, p_k)``, k = min_kept (all valid
    pixels if fewer than min_kept are valid). The ONE implementation of the
    selection tail, shared by :func:`ohem_mask`, :func:`ohem_cross_entropy`
    and the fused criterion.
    """
    flat = jnp.where(valid, p_correct, jnp.inf).ravel()
    num_valid = jnp.sum(valid)
    k = min(min_kept, flat.shape[0])
    if k <= 0:
        threshold = jnp.float32(thresh)
    else:
        threshold = ohem_threshold(flat, k, thresh, num_valid, min_kept)
    return valid & (p_correct <= threshold)


def ohem_mask(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_label: int = 255,
    thresh: float = 0.7,
    min_kept: int = 100000,
) -> jnp.ndarray:
    """Boolean keep-mask over pixels. logits (..., C), labels (...)."""
    # selection is not differentiated (reference computes it on numpy copies)
    logits = jax.lax.stop_gradient(logits.astype(jnp.float32))
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(safe, logits.shape[-1], dtype=probs.dtype)
    p_correct = jnp.sum(probs * onehot, axis=-1)
    return ohem_keep_mask(p_correct, valid, thresh, min_kept)


def ohem_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_label: int = 255,
    thresh: float = 0.7,
    min_kept: int = 100000,
) -> jnp.ndarray:
    """OHEM-masked mean CE (scalar f32).

    Selection and loss share ONE ``log_softmax`` over the (full-resolution,
    f32) logits: the correct-class probability the reference thresholds on
    (``loss/loss.py:38-41``) is recovered as ``exp(−nll)`` instead of running
    a second softmax pass — at 8×769²×19 that second pass is ~0.7 GB of HBM
    traffic per step. Equal to the two-pass form up to one f32 rounding of
    ``exp``; selection semantics are unchanged (see :func:`ohem_mask`, which
    stays the reference two-pass formulation for oracle tests).
    """
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(safe, logits.shape[-1], dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)

    # selection is not differentiated (reference computes it on numpy copies)
    p_correct = jnp.exp(-jax.lax.stop_gradient(nll))
    return masked_mean(nll, ohem_keep_mask(p_correct, valid, thresh, min_kept))
