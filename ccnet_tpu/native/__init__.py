"""Native (C++/OpenMP) host data runtime with ctypes bindings.

Builds ``libccnet_data.so`` from ``augment.cpp`` on demand (g++ -O3
-fopenmp); falls back gracefully when no toolchain is available — callers
should check :func:`available`.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_DIR, "augment.cpp")
_LIB = osp.join(_DIR, "libccnet_data.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not osp.exists(_LIB) or osp.getmtime(_LIB) < osp.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.ccnet_augment_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),   # images
            ctypes.POINTER(ctypes.c_uint8),   # labels
            ctypes.POINTER(ctypes.c_uint8),   # lut
            ctypes.c_int, ctypes.c_int, ctypes.c_int,   # B, H0, W0
            ctypes.c_int, ctypes.c_int,                  # crop_h, crop_w
            ctypes.POINTER(ctypes.c_float),   # scales
            ctypes.POINTER(ctypes.c_int),     # offs
            ctypes.POINTER(ctypes.c_uint8),   # flips
            ctypes.POINTER(ctypes.c_float),   # mean
            ctypes.c_int,                      # ignore_label
            ctypes.POINTER(ctypes.c_float),   # out_images
            ctypes.POINTER(ctypes.c_int32),   # out_labels
        ]
        lib.ccnet_augment_batch.restype = None
        lib.ccnet_augment_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),   # images
            ctypes.POINTER(ctypes.c_uint8),   # labels
            ctypes.POINTER(ctypes.c_uint8),   # lut
            ctypes.c_int, ctypes.c_int, ctypes.c_int,   # B, H0, W0
            ctypes.c_int, ctypes.c_int,                  # crop_h, crop_w
            ctypes.POINTER(ctypes.c_float),   # scales
            ctypes.POINTER(ctypes.c_int),     # offs
            ctypes.POINTER(ctypes.c_uint8),   # flips
            ctypes.POINTER(ctypes.c_uint8),   # pad_val (3, uint8)
            ctypes.c_int,                      # ignore_label
            ctypes.POINTER(ctypes.c_uint8),   # out_images
            ctypes.POINTER(ctypes.c_uint8),   # out_labels
        ]
        lib.ccnet_augment_batch_u8.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def augment_batch(
    images: np.ndarray,   # (B, H0, W0, 3) uint8 BGR
    labels: np.ndarray,   # (B, H0, W0) uint8 raw label ids
    lut: np.ndarray,      # (256,) uint8 id -> trainId (identity if mapped)
    scales: np.ndarray,   # (B,) float32
    offs: np.ndarray,     # (B, 2) int32 (oy, ox) in scaled space
    flips: np.ndarray,    # (B,) uint8
    crop_hw: Tuple[int, int],
    mean,
    ignore_label: int = 255,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fused scale+LUT+pad+crop+mirror+mean-subtract (see augment.cpp)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native augment library unavailable (no g++?)")
    B, H0, W0, _ = images.shape
    ch, cw = crop_hw
    images = np.ascontiguousarray(images, np.uint8)
    labels = np.ascontiguousarray(labels, np.uint8)
    lut = np.ascontiguousarray(lut, np.uint8)
    scales = np.ascontiguousarray(scales, np.float32)
    offs = np.ascontiguousarray(offs, np.int32)
    flips = np.ascontiguousarray(flips, np.uint8)
    mean = np.ascontiguousarray(mean, np.float32)
    out_images = np.empty((B, ch, cw, 3), np.float32)
    out_labels = np.empty((B, ch, cw), np.int32)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.ccnet_augment_batch(
        p(images, ctypes.c_uint8), p(labels, ctypes.c_uint8), p(lut, ctypes.c_uint8),
        B, H0, W0, ch, cw,
        p(scales, ctypes.c_float), p(offs, ctypes.c_int), p(flips, ctypes.c_uint8),
        p(mean, ctypes.c_float), ignore_label,
        p(out_images, ctypes.c_float), p(out_labels, ctypes.c_int32),
    )
    return out_images, out_labels


def augment_batch_u8(
    images: np.ndarray,   # (B, H0, W0, 3) uint8 BGR
    labels: np.ndarray,   # (B, H0, W0) uint8 raw label ids
    lut: np.ndarray,      # (256,) uint8 id -> trainId (identity if mapped)
    scales: np.ndarray,   # (B,) float32
    offs: np.ndarray,     # (B, 2) int32 (oy, ox) in scaled space
    flips: np.ndarray,    # (B,) uint8
    crop_hw: Tuple[int, int],
    mean,                 # float BGR mean; pad pixels get round(mean)
    ignore_label: int = 255,
) -> Tuple[np.ndarray, np.ndarray]:
    """Wire-minimal fused augmentation: uint8 crops out, mean subtraction
    deferred to the device (``finish_u8_crops``). Samples ONLY the crop
    window (see augment.cpp) — the host-side cost does not grow with the
    random scale, unlike resize-whole-then-crop."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native augment library unavailable (no g++?)")
    B, H0, W0, _ = images.shape
    ch, cw = crop_hw
    images = np.ascontiguousarray(images, np.uint8)
    labels = np.ascontiguousarray(labels, np.uint8)
    lut = np.ascontiguousarray(lut, np.uint8)
    scales = np.ascontiguousarray(scales, np.float32)
    offs = np.ascontiguousarray(offs, np.int32)
    flips = np.ascontiguousarray(flips, np.uint8)
    pad_val = np.round(np.asarray(mean)).astype(np.uint8)
    out_images = np.empty((B, ch, cw, 3), np.uint8)
    out_labels = np.empty((B, ch, cw), np.uint8)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.ccnet_augment_batch_u8(
        p(images, ctypes.c_uint8), p(labels, ctypes.c_uint8), p(lut, ctypes.c_uint8),
        B, H0, W0, ch, cw,
        p(scales, ctypes.c_float), p(offs, ctypes.c_int), p(flips, ctypes.c_uint8),
        p(pad_val, ctypes.c_uint8), ignore_label,
        p(out_images, ctypes.c_uint8), p(out_labels, ctypes.c_uint8),
    )
    return out_images, out_labels


def draw_augment_params(
    rng: np.random.RandomState,
    batch: int,
    image_hw: Tuple[int, int],
    crop_hw: Tuple[int, int],
    scale_min: float = 0.7,
    scale_steps: int = 15,
    scale_step: float = 0.1,
    mirror: bool = True,
):
    """Random draws with the reference recipe's distributions
    (dataset/datasets.py:157-210): discrete scales, uniform crop offset over
    the padded canvas, fair-coin mirror."""
    H0, W0 = image_hw
    ch, cw = crop_hw
    scales = (scale_min + scale_step * rng.randint(0, scale_steps, size=batch)).astype(np.float32)
    offs = np.zeros((batch, 2), np.int32)
    for b in range(batch):
        sH = int(round(H0 * scales[b]))
        sW = int(round(W0 * scales[b]))
        offs[b, 0] = rng.randint(0, max(sH, ch) - ch + 1)
        offs[b, 1] = rng.randint(0, max(sW, cw) - cw + 1)
    flips = rng.randint(0, 2 if mirror else 1, size=batch).astype(np.uint8)
    return scales, offs, flips
