"""Sliding-window / whole-image / multi-scale prediction.

Tiling arithmetic is identical to the reference (``evaluate.py:102-143``):
stride = ceil(tile·(1−overlap)), tiles clamped to the image with the last
tile pulled back inside, overlapping probabilities averaged by visit count.

TPU-native difference: the reference ran a Python double loop with one
forward per tile (HOST→DEVICE→HOST each, ``evaluate.py:115-136``); here all
tiles of an image are STACKED INTO ONE BATCH and go through a single
compiled forward — one launch, full MXU occupancy, accumulation on device.

``apply_fn(images) -> (B, h, w, C) logits`` is any jitted forward returning
OS-8 logits; upsampling back to tile size uses align-corners bilinear
(reference ``evaluate.py:103``).
"""

from __future__ import annotations

import math
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccnet_tpu.ops.resize import resize_bilinear_align_corners


def compute_tiles(image_hw: Tuple[int, int], tile_hw: Tuple[int, int],
                  overlap: float = 1.0 / 3.0) -> List[Tuple[int, int, int, int]]:
    """(y1, x1, y2, x2) boxes with the reference's stride/clamp arithmetic."""
    H, W = image_hw
    th, tw = tile_hw
    stride = int(math.ceil(th * (1.0 - overlap)))
    rows = int(math.ceil(max(H - th, 0) / stride) + 1)
    cols = int(math.ceil(max(W - tw, 0) / stride) + 1)
    boxes = []
    for r in range(rows):
        for c in range(cols):
            x1, y1 = c * stride, r * stride
            x2, y2 = min(x1 + tw, W), min(y1 + th, H)
            x1, y1 = max(x2 - tw, 0), max(y2 - th, 0)
            boxes.append((y1, x1, y2, x2))
    return boxes


def predict_sliding(
    apply_fn: Callable,
    image: jnp.ndarray,  # (B, H, W, 3) preprocessed
    tile_hw: Tuple[int, int],
    num_classes: int,
    overlap: float = 1.0 / 3.0,
    tiles_per_call: int = 8,
    mesh=None,
) -> jnp.ndarray:
    """(B, H, W, C) softmax-able logits-probabilities… returns per-pixel
    *probabilities* averaged over overlapping tiles (reference semantics:
    logits are accumulated pre-softmax in the reference — it averages raw
    upsampled logits; we do the same and return averaged logits)."""
    B, H, W, _ = image.shape
    full = _predict_sliding_cf(apply_fn, image, tile_hw, num_classes,
                               overlap, tiles_per_call, mesh)
    return jnp.transpose(full.reshape(B, num_classes, H, W), (0, 2, 3, 1))


def _extract_tiles(image: jnp.ndarray, tile_hw: Tuple[int, int],
                   overlap: float):
    """Pad the image up to tile size if smaller (reference pad_image,
    evaluate.py:95-100) and slice every overlapping tile.

    Returns ``(tiles, boxes, (Hp, Wp))`` with ``tiles`` shaped
    ``(n_boxes*B, th, tw, 3)``; tile ``t = box_index*B + batch_index``."""
    B, H, W, _ = image.shape
    th, tw = tile_hw
    pad_h, pad_w = max(th - H, 0), max(tw - W, 0)
    if pad_h or pad_w:
        image = jnp.pad(image, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = image.shape[1], image.shape[2]
    boxes = compute_tiles((Hp, Wp), (th, tw), overlap)
    tiles = jnp.concatenate(
        [image[:, y1:y2, x1:x2, :] for (y1, x1, y2, x2) in boxes], axis=0
    )
    return tiles, boxes, (Hp, Wp)


def _forward_tiles_cf(apply_fn: Callable, tiles: jnp.ndarray,
                      chunk_size: int, mesh=None) -> jnp.ndarray:
    """All tiles through the network in fixed-size chunks, returning
    CHANNELS-FIRST f32 OS-k logits ``(n, C, h, w)``.

    The chunk loop is a ``lax.map``, so the network body is traced and
    compiled ONCE no matter how many chunks run — the multi-scale+flip
    program used to inline the full backbone per chunk per scale per flip
    (up to ~48 copies at 3 scales + flip), which dominated its compile
    time. Tiles are padded up to a whole number of chunks so every
    iteration has one shape."""
    n, th, tw, c = tiles.shape
    step = chunk_size
    if mesh is not None:  # chunks must divide evenly over the mesh devices
        n_mesh = int(np.prod(list(mesh.shape.values())))
        step = -(-step // n_mesh) * n_mesh
    K = -(-n // step)
    pad = K * step - n
    if pad:
        tiles = jnp.concatenate(
            [tiles, jnp.zeros((pad, th, tw, c), tiles.dtype)], 0
        )

    def body(chunk):
        if mesh is not None:
            # data-parallel eval: the tile batch shards across the mesh (the
            # reference sharded val IMAGES per rank and all-reduced the
            # confusion matrix; sharding tiles inside one jit is equivalent
            # and keeps single-program semantics)
            from jax.sharding import NamedSharding, PartitionSpec as P

            chunk = jax.lax.with_sharding_constraint(
                chunk, NamedSharding(mesh, P(mesh.axis_names, None, None, None))
            )
        logits = apply_fn(chunk)
        # transpose to channels-first while still small (OS-8, ~3 MB)
        return jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.float32)

    if K == 1:
        out = body(tiles)[None]
    else:
        out = jax.lax.map(body, tiles.reshape(K, step, th, tw, c))
    return out.reshape(K * step, *out.shape[2:])[:n]


def _stitch_cf(logits: jnp.ndarray, boxes, B: int, num_classes: int,
               padded_hw: Tuple[int, int], tile_hw: Tuple[int, int],
               out_hw: Tuple[int, int], chunk_size: int) -> jnp.ndarray:
    """Upsample per-tile OS-k logits to tile size and overlap-average them
    into a full-resolution canvas; returns BATCH-FOLDED channels-first
    (B·C, H, W).

    The accumulation canvas is CHANNELS-FIRST: with NHWC the 19-class dim
    lands in the lane dimension of the canvas layout and XLA pads it toward
    128 lanes — the 8 stitch dynamic-update-slices then ran ~15× off the
    HBM roofline (measured 5.6 ms each, ~45 ms/img of pure stitch). And the
    canvas is 3-D with the batch dim FOLDED INTO CHANNELS: inside the
    multi-scale+flip program XLA assigns 4-D ``f32[1,19,H,W]`` canvases the
    sparse ``T(1,128)`` sublane tiling (driven by the chunked upsample
    einsum feeding the update), which put every dynamic-update-slice ~40×
    off the roofline — 5.48 ms each, ~167 ms/img of pure stitch at 3
    scales + flip; the same program with (B·C, Hp, Wp) canvases tiles (H, W)
    densely at (8, 128) (measured: the whole stitch+resize-back+accumulate
    tail 274 → 106 ms, ``scripts/probe_stitch_layout.py``).

    The upsample runs chunk-by-chunk: holding every tile's full-res f32
    logits at once costs ~n_tiles × 45 MB (OOM-deciding inside the one-jit
    multi-scale+flip program)."""
    th, tw = tile_hw
    Hp, Wp = padded_hw
    H, W = out_hw
    C = num_classes
    full = jnp.zeros((B * C, Hp, Wp), jnp.float32)
    count = jnp.zeros((1, Hp, Wp), jnp.float32)
    n = logits.shape[0]
    for s in range(0, n, chunk_size):
        lg = resize_bilinear_align_corners(
            logits[s:s + chunk_size], (th, tw), h_axis=2
        )
        for j in range(min(chunk_size, n - s)):
            i_box, b = divmod(s + j, B)
            y1, x1, y2, x2 = boxes[i_box]
            full = full.at[b * C:(b + 1) * C, y1:y2, x1:x2].add(lg[j])
    for (y1, x1, y2, x2) in boxes:
        count = count.at[:, y1:y2, x1:x2].add(1.0)
    full = full / count
    return full[:, :H, :W]


def _predict_sliding_cf(
    apply_fn: Callable,
    image: jnp.ndarray,
    tile_hw: Tuple[int, int],
    num_classes: int,
    overlap: float = 1.0 / 3.0,
    tiles_per_call: int = 8,
    mesh=None,
) -> jnp.ndarray:
    """:func:`predict_sliding` returning BATCH-FOLDED channels-first
    (B·C, H, W) — the internal layout every full-resolution accumulation
    uses (see :func:`_stitch_cf`); multi-scale composes these without ever
    holding an NHWC (or 4-D) full-res tensor."""
    B, H, W, _ = image.shape
    tiles, boxes, padded_hw = _extract_tiles(image, tile_hw, overlap)
    step = max(tiles_per_call, B)
    logits = _forward_tiles_cf(apply_fn, tiles, step, mesh)
    return _stitch_cf(logits, boxes, B, num_classes, padded_hw, tile_hw,
                      (H, W), step)


def predict_whole(apply_fn: Callable, image: jnp.ndarray, num_classes: int,
                  mesh=None) -> jnp.ndarray:
    """Whole-image forward, logits upsampled to input size (evaluate.py:145-153)."""
    B, H, W, _ = image.shape
    full = _predict_whole_cf(apply_fn, image, num_classes, mesh)
    return jnp.transpose(full.reshape(B, num_classes, H, W), (0, 2, 3, 1))


def _predict_whole_cf(apply_fn: Callable, image: jnp.ndarray,
                      num_classes: int, mesh=None) -> jnp.ndarray:
    """Whole-image forward returning batch-folded (B·C, H, W) f32 logits.

    With a mesh, the input is constrained to ``spatial_sharding`` (batch
    over ``data``, image HEIGHT over ``space``): a ``data``-axis mesh runs
    whole images data-parallel across chips; a ``space`` axis additionally
    partitions each image's height, with XLA partitioning the backbone
    convs via halo exchange — the multi-chip routes for 1024×2048
    whole-image inference. The CCA op must be the jnp implementation when
    ``space > 1`` (its row/column softmax spans the sharded H axis; XLA
    inserts the gather — the Pallas kernel's partitioning rule is
    batch-only and would force a gather per shard per call,
    ``cc_attention_pallas.py`` ``_CCA_REPL``)."""
    B, H, W, _ = image.shape
    if mesh is not None:
        from ccnet_tpu.parallel.mesh import spatial_sharding

        image = jax.lax.with_sharding_constraint(image, spatial_sharding(mesh))
    logits = apply_fn(image)  # (B, h, w, C) OS-8 — small; transpose here
    logits = jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.float32)
    logits = logits.reshape(B * num_classes, *logits.shape[2:])
    return resize_bilinear_align_corners(logits, (H, W), h_axis=1)


def predict_multiscale(
    apply_fn: Callable,
    image: jnp.ndarray,  # (B, H, W, 3) preprocessed
    tile_hw: Tuple[int, int],
    num_classes: int,
    scales: Sequence[float] = (1.0,),
    flip: bool = False,
    overlap: float = 1.0 / 3.0,
    whole: bool = False,
    mesh=None,
) -> jnp.ndarray:
    """Multi-scale + flip averaging (reference evaluate.py:155-175): resize
    input per scale, sliding (or whole) prediction, optional horizontal-flip
    average, mean over scales. Returns (B, H, W, C) averaged logits."""
    B, H, W, _ = image.shape
    # all full-resolution intermediates stay channels-first AND batch-folded
    # 3-D (see the canvas comment in _stitch_cf — NHWC pads the 19-class
    # lane dim ~6.7×, and 4-D [1,C,H,W] canvases draw the sparse T(1,128)
    # sublane tiling in this program); ONE unfold+transpose at return
    acc = jnp.zeros((B * num_classes, H, W), jnp.float32)

    # scipy.ndimage.zoom(order=1) semantics (reference evaluate.py:166):
    # out size = round(in·scale), align-corners coordinate mapping
    # (verified: zoom's src grid is i·(in−1)/(out−1))
    def _scaled(s):
        sh, sw = int(round(H * float(s))), int(round(W * float(s)))
        return (resize_bilinear_align_corners(image, (sh, sw))
                if (sh, sw) != (H, W) else image), (sh, sw)

    if not whole:
        # Collect the tiles of EVERY (scale, flip) pass and run them through
        # ONE chunked forward (_forward_tiles_cf) — all tiles share the tile
        # shape, so the network compiles once for the whole program instead
        # of once per pass per chunk.
        chunk = max(8, B)
        flips = (False, True) if flip else (False,)
        passes = []  # (scale_hw, flipped, boxes, padded_hw, n_tiles)
        tile_list = []
        for s in scales:
            scaled, scale_hw = _scaled(s)
            for f in flips:
                im = scaled[:, :, ::-1, :] if f else scaled
                tiles, boxes, padded_hw = _extract_tiles(im, tile_hw, overlap)
                tile_list.append(tiles)
                passes.append((scale_hw, f, boxes, padded_hw, tiles.shape[0]))
        all_logits = _forward_tiles_cf(
            apply_fn, jnp.concatenate(tile_list, axis=0), chunk, mesh
        )
        off = 0
        probs_by_pass = []
        for (sh, sw), f, boxes, padded_hw, n in passes:
            p = _stitch_cf(all_logits[off:off + n], boxes, B, num_classes,
                           padded_hw, tile_hw, (sh, sw), chunk)
            off += n
            probs_by_pass.append(p)
        it = iter(probs_by_pass)
        for s in scales:
            probs = next(it)
            if flip:
                probs_f = next(it)
                probs = 0.5 * (probs + probs_f[:, :, ::-1])
            if probs.shape[1:] != (H, W):
                # the reference's scale≠1 accumulate is bit-rotted (shape
                # mismatch, never exercised — main() runs scales=[1.0]);
                # resizing the scaled probabilities back with the same
                # align-corners convention is the intended behaviour
                probs = resize_bilinear_align_corners(probs, (H, W), h_axis=1)
            acc = acc + probs
        acc = acc.reshape(B, num_classes, H, W)
        return jnp.transpose(acc / len(scales), (0, 2, 3, 1))

    for s in scales:
        scaled, (sh, sw) = _scaled(s)
        probs = _predict_whole_cf(apply_fn, scaled, num_classes, mesh)  # (B·C, sh, sw)
        if flip:
            probs_f = _predict_whole_cf(apply_fn, scaled[:, :, ::-1, :],
                                        num_classes, mesh)
            probs = 0.5 * (probs + probs_f[:, :, ::-1])
        if (sh, sw) != (H, W):
            probs = resize_bilinear_align_corners(probs, (H, W), h_axis=1)
        acc = acc + probs
    acc = acc.reshape(B, num_classes, H, W)
    return jnp.transpose(acc / len(scales), (0, 2, 3, 1))
