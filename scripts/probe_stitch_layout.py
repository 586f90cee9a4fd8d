"""Probe: stitch-canvas layout in the MS+flip eval program (VERDICT r3 #7).

The msflip trace (scripts/trace_msflip.py) shows every 4-D stitch canvas
``f32[1,19,H,W]`` assigned the sparse ``T(1,128)`` tiling — 30 dynamic-
update-slices at 5.48 ms each (~167 ms/img), ~40x off the HBM roofline —
while the 3-D ``f32[19,H,W]`` tensors in the same program got the dense
``T(8,128)``. This probe isolates the post-forward tail of
``predict_multiscale`` — per-tile OS-8 logits → chunked align-corners
upsample → overlap-add stitch → resize-back → accumulate → argmax — and
times a FROZEN copy of the pre-b838e73 ``_stitch_cf`` (4-D canvases —
HEAD's ``_stitch_cf`` has since adopted the batch-folded 3-D layout this
probe motivated, so the old code is inlined below to keep the comparison
reproducible) against the batch-folded 3-D variant.

Run on the real chip: python scripts/probe_stitch_layout.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ccnet_tpu.evaluation.sliding import compute_tiles  # noqa: E402
from ccnet_tpu.ops.resize import resize_bilinear_align_corners  # noqa: E402

H, W = 1024, 2048
TILE = (769, 769)
OS = (97, 97)
C = 19
CHUNK = 8
SCALES = (0.75, 1.0, 1.25)


def passes_and_tiles(rng):
    """(scale_hw, padded_hw, boxes) per pass + random per-tile OS-8 logits."""
    passes = []
    tiles = []
    for s in SCALES:
        sh, sw = int(round(H * s)), int(round(W * s))
        ph, pw = max(sh, TILE[0]), max(sw, TILE[1])
        boxes = compute_tiles((ph, pw), TILE)
        for _f in (False, True):
            passes.append(((sh, sw), (ph, pw), boxes))
            tiles.append(rng.randn(len(boxes), C, *OS).astype(np.float32))
    return passes, tiles


def stitch_3d(logits, boxes, num_classes, padded_hw, tile_hw, out_hw, chunk):
    """_stitch_cf with the batch dim folded away: (C, H, W) canvases."""
    th, tw = tile_hw
    ph, pw = padded_hw
    sh, sw = out_hw
    full = jnp.zeros((num_classes, ph, pw), jnp.float32)
    count = jnp.zeros((1, ph, pw), jnp.float32)
    n = logits.shape[0]
    for s0 in range(0, n, chunk):
        lg = resize_bilinear_align_corners(logits[s0:s0 + chunk], (th, tw), h_axis=2)
        for j in range(min(chunk, n - s0)):
            y1, x1, y2, x2 = boxes[s0 + j]
            full = full.at[:, y1:y2, x1:x2].add(lg[j])
    for (y1, x1, y2, x2) in boxes:
        count = count.at[:, y1:y2, x1:x2].add(1.0)
    return (full / count)[:, :sh, :sw]


def stitch_4d(logits, boxes, B, num_classes, padded_hw, tile_hw, out_hw, chunk):
    """FROZEN pre-b838e73 _stitch_cf: 4-D (B, C, Hp, Wp) canvases — the
    layout XLA assigns the sparse T(1,128) sublane tiling inside this
    program (the 274→106 ms evidence cited in PARITY.md)."""
    th, tw = tile_hw
    ph, pw = padded_hw
    sh, sw = out_hw
    full = jnp.zeros((B, num_classes, ph, pw), jnp.float32)
    count = jnp.zeros((1, 1, ph, pw), jnp.float32)
    n = logits.shape[0]
    for s0 in range(0, n, chunk):
        lg = resize_bilinear_align_corners(logits[s0:s0 + chunk], (th, tw), h_axis=2)
        for j in range(min(chunk, n - s0)):
            i_box, b = divmod(s0 + j, B)
            y1, x1, y2, x2 = boxes[i_box]
            full = full.at[b, :, y1:y2, x1:x2].add(lg[j])
    for (y1, x1, y2, x2) in boxes:
        count = count.at[:, :, y1:y2, x1:x2].add(1.0)
    return (full / count)[:, :, :sh, :sw]


def tail_4d(passes, *tiles):
    acc = jnp.zeros((1, C, H, W), jnp.float32)
    for ((sh, sw), (ph, pw), boxes), lg in zip(passes, tiles):
        full = stitch_4d(lg, boxes, 1, C, (ph, pw), TILE, (sh, sw), CHUNK)
        if (sh, sw) != (H, W):
            full = resize_bilinear_align_corners(full, (H, W), h_axis=2)
        acc = acc + full
    return jnp.argmax(acc, axis=1)


def tail_3d(passes, *tiles):
    acc = jnp.zeros((C, H, W), jnp.float32)
    for ((sh, sw), (ph, pw), boxes), lg in zip(passes, tiles):
        full = stitch_3d(lg, boxes, C, (ph, pw), TILE, (sh, sw), CHUNK)
        if (sh, sw) != (H, W):
            full = resize_bilinear_align_corners(full[None], (H, W), h_axis=2)[0]
        acc = acc + full
    return jnp.argmax(acc, axis=0)


def main():
    rng = np.random.RandomState(0)
    passes, tiles_np = passes_and_tiles(rng)
    tiles = [jnp.asarray(t) for t in tiles_np]
    for name, fn in (("4d (frozen pre-b838e73 _stitch_cf)", tail_4d),
                     ("3d (batch-folded, current)", tail_3d)):
        f = jax.jit(lambda *ts, fn=fn: fn(passes, *ts))
        out = f(*tiles)
        ref = int(out.reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(4):
            out = f(*tiles)
        _ = int(out.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / 4
        print(f"{name}: {dt * 1e3:7.1f} ms  (spot {ref})", flush=True)


if __name__ == "__main__":
    main()
