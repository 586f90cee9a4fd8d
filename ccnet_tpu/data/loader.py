"""Host data loader: threaded decode, deterministic shuffling, device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` + ``DistributedSampler``
plumbing (``engine.py:85-117``): one process feeds the whole mesh (JAX SPMD
addresses every device from one host program), a thread pool does the cv2
decode (releases the GIL), and batches are device_put with the mesh sharding
one step ahead of consumption so host IO overlaps device compute.

Shuffling matches DistributedSampler's epoch-seeded permutation idea:
``seed + epoch`` drives a numpy permutation, identical across restarts.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np

from ccnet_tpu.utils.logging import get_logger

logger = get_logger("ccnet_tpu.data")


def _epoch_rng(seed: int, epoch: int, index: int) -> np.random.RandomState:
    """The per-(seed, epoch, index) augmentation rng — ONE definition shared
    by every augmenting wrapper so their draw streams stay in sync (the
    native/cv2 cross-engine parity and restart reproducibility depend on it)."""
    return np.random.RandomState(
        (seed * 1000003 + epoch * 7919 + index) % (2 ** 31)
    )


def _shutdown_pipeline(q: "queue.Queue", t: threading.Thread,
                       stop: threading.Event) -> None:
    """Tear down a bounded-queue producer thread without deadlock.

    Setting ``stop`` alone is not enough: a producer blocked in ``q.put``
    never observes it, leaking the thread plus everything it pins (decode
    executor, lookahead samples, placed device batches). Drain the queue
    until the producer exits — each drained slot wakes a blocked ``put``,
    letting the producer reach its ``finally`` (whose sentinel put may block
    again on a 1-slot queue, hence the loop)."""
    stop.set()
    while t.is_alive():
        try:
            q.get_nowait()
        except queue.Empty:
            t.join(0.02)
    while True:  # drop remaining references promptly
        try:
            q.get_nowait()
        except queue.Empty:
            break


class SyntheticDataset:
    """Fixed-size random dataset — for tests, benchmarks and smoke CLIs."""

    def __init__(self, n: int = 64, hw: Tuple[int, int] = (1024, 2048),
                 num_classes: int = 19, seed: int = 0):
        self.n, self.hw, self.num_classes, self.seed = n, hw, num_classes, seed

    def __len__(self):
        return self.n

    def name(self, index: int) -> str:
        return f"synthetic_{index:05d}"

    def __getitem__(self, index: int):
        rng = np.random.RandomState(self.seed + index)
        h, w = self.hw
        image = rng.randint(0, 256, size=(h, w, 3)).astype(np.float32)
        label = rng.randint(0, self.num_classes, size=(h, w)).astype(np.int32)
        label[rng.rand(h, w) < 0.05] = 255
        return image, label, self.name(index)


class AugmentingDataset:
    """Wraps a dataset of variable-size raw samples with host-side
    augmentation so every sample comes out as a fixed-size crop.

    Used for datasets whose images vary in size (VOC) where the static-shape
    device augmenter cannot apply; Cityscapes should prefer the device or
    native backends. Deterministic per (seed, index).
    """

    def __init__(self, dataset, crop_hw=(321, 321), mean=(128.0, 128.0, 128.0),
                 scale: bool = True, mirror: bool = True, ignore_label: int = 255,
                 scale_min: float = 0.5, scale_steps: int = 12, seed: int = 0):
        from ccnet_tpu.data.preprocess import host_augment

        self._augment = host_augment
        self.dataset = dataset
        self.crop_hw = crop_hw
        self.mean = mean
        self.scale = scale
        self.mirror = mirror
        self.ignore_label = ignore_label
        self.scale_min = scale_min
        self.scale_steps = scale_steps
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        # fresh augmentation draws every epoch (the reference DataLoader
        # re-draws per access); forwarded by DataLoader.set_epoch
        self.epoch = epoch

    def __len__(self):
        return len(self.dataset)

    def name(self, index):
        return self.dataset.name(index)

    def __getitem__(self, index):
        image, label, name = self.dataset[index]
        rng = _epoch_rng(self.seed, self.epoch, index)
        img, lbl = self._augment(
            image, label, rng, crop_hw=self.crop_hw, mean=self.mean,
            ignore_label=self.ignore_label, scale=self.scale, mirror=self.mirror,
            scale_min=self.scale_min, scale_steps=self.scale_steps,
        )
        return img, lbl, name


class U8CropDataset:
    """Host-side augmentation to fixed-size **uint8** crops — the
    wire-minimal input path.

    Wraps a raw uint8 dataset (``CityscapesDataset(raw_dtype='uint8')``,
    ideally behind :class:`CachedDataset`) with
    :func:`ccnet_tpu.data.preprocess.host_augment_u8`: cv2 scale + pad +
    crop + mirror all in uint8, exactly like the reference
    (``dataset/datasets.py:157-161`` resizes the uint8 image BEFORE the f32
    conversion). The f32 widen + mean subtraction happen on device
    (:func:`~ccnet_tpu.data.preprocess.finish_u8_crops`), so the
    host→device wire carries 769² uint8 crops — 3.4× fewer bytes than a
    full-resolution uint8 Cityscapes image, 16× fewer than an f32 crop.

    Augmentation draws are deterministic per (seed, epoch, index) and
    re-drawn every epoch (``set_epoch``), matching the reference DataLoader's
    fresh-randomness-per-epoch behaviour while staying restart-reproducible.

    ``engine``: 'cv2' resizes the whole image then crops (bit-faithful to the
    reference's cv2 chain); 'native' calls the C++/OpenMP fused kernel
    (``ccnet_tpu/native``) that samples ONLY the crop window — identical
    half-pixel semantics, ±1 uint8 rounding vs cv2's fixed-point, and
    host cost independent of the random scale (up to ~8× less arithmetic
    at scale 2.1). 'auto' picks native when the library builds. Both
    engines consume the SAME rng stream, so geometry (scale/crop/mirror
    draws) is identical across engines.
    """

    def __init__(self, dataset, crop_hw=(769, 769), mean=None,
                 scale: bool = True, mirror: bool = True,
                 ignore_label: int = 255, scale_min: float = 0.7,
                 scale_steps: int = 15, seed: int = 0, engine: str = "auto"):
        from ccnet_tpu.data.preprocess import CITYSCAPES_MEAN_BGR, host_augment_u8

        self._augment = host_augment_u8
        self.dataset = dataset
        self.crop_hw = crop_hw
        self.mean = CITYSCAPES_MEAN_BGR if mean is None else mean
        self.scale = scale
        self.mirror = mirror
        self.ignore_label = ignore_label
        self.scale_min = scale_min
        self.scale_steps = scale_steps
        self.seed = seed
        self.epoch = 0
        if engine == "auto":
            from ccnet_tpu import native

            engine = "native" if native.available() else "cv2"
        if engine not in ("native", "cv2"):
            raise ValueError(f"unknown engine {engine!r}")
        self.engine = engine
        self._identity_lut = np.arange(256, dtype=np.uint8)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return len(self.dataset)

    def name(self, index):
        return self.dataset.name(index)

    def __getitem__(self, index):
        image, label, name = self.dataset[index]
        rng = _epoch_rng(self.seed, self.epoch, index)
        if self.engine == "native":
            img, lbl = self._augment_native(image, label, rng)
        else:
            img, lbl = self._augment(
                image, label, rng, crop_hw=self.crop_hw, mean=self.mean,
                ignore_label=self.ignore_label, scale=self.scale,
                mirror=self.mirror, scale_min=self.scale_min,
                scale_steps=self.scale_steps,
            )
        return img, lbl, name

    def _augment_native(self, image, label, rng):
        # Same rng consumption ORDER as host_augment_u8 (scale, oy, ox,
        # mirror) so both engines draw identical geometry for a given
        # (seed, epoch, index).
        from ccnet_tpu import native
        from ccnet_tpu.data.preprocess import SCALE_STEP

        ch, cw = self.crop_hw
        H0, W0 = label.shape
        f = (self.scale_min + SCALE_STEP * rng.randint(0, self.scale_steps)
             if self.scale else 1.0)
        sh, sw = int(round(H0 * f)), int(round(W0 * f))
        oy = rng.randint(0, max(sh, ch) - ch + 1)
        ox = rng.randint(0, max(sw, cw) - cw + 1)
        flip = rng.randint(0, 2) if self.mirror else 0
        imgs, lbls = native.augment_batch_u8(
            image[None], label[None], self._identity_lut,
            np.asarray([f], np.float32), np.asarray([[oy, ox]], np.int32),
            np.asarray([flip], np.uint8), (ch, cw), self.mean,
            self.ignore_label,
        )
        return imgs[0], lbls[0]


def _default_cache_bytes() -> int:
    """Byte budget from ``CCNET_TPU_CACHE_GB`` (default 8 GB).

    Full Cityscapes train in uint8 is ~25 GB of host RAM — an unbounded
    cache is only safe advice on large hosts, so the default bounds it and
    the env var raises/lowers the budget (0 disables the cap).
    """
    gb = float(os.environ.get("CCNET_TPU_CACHE_GB", "8"))
    return int(gb * (1 << 30))


class CachedDataset:
    """Decode-once RAM cache around any (image, label, name) dataset.

    First access of an index pays the disk decode; repeat epochs serve the
    raw arrays from memory (the TPU trains many epochs over 2975 images —
    the reference re-decoded every epoch in its 8 DataLoader workers,
    reference ``train.py:112``). Pair with ``raw_dtype='uint8'`` so the
    cache holds ~8 MB/sample instead of 32 MB. Thread-safe for the loader's
    worker pool (dict writes are atomic; a racing double-decode is benign).

    Bounded by ``max_bytes`` (default: the ``CCNET_TPU_CACHE_GB`` budget,
    8 GB) and/or ``max_items``; once a cap is hit further samples are served
    uncached (decode-per-epoch, reference behaviour) and the truncation is
    logged once.
    """

    def __init__(self, dataset, max_items: Optional[int] = None,
                 max_bytes: Optional[int] = None):
        self.dataset = dataset
        self.max_items = max_items
        self.max_bytes = _default_cache_bytes() if max_bytes is None else max_bytes
        self._cache: dict = {}
        self._bytes = 0
        self._warned_full = False

    def __len__(self):
        return len(self.dataset)

    def name(self, index: int) -> str:
        return self.dataset.name(index)

    @staticmethod
    def _item_bytes(item) -> int:
        return sum(int(a.nbytes) for a in item if hasattr(a, "nbytes"))

    def _has_room(self, nbytes: int) -> bool:
        if self.max_items is not None and len(self._cache) >= self.max_items:
            return False
        if self.max_bytes and self._bytes + nbytes > self.max_bytes:
            return False
        return True

    def __getitem__(self, index: int):
        # key by sample NAME, not index: ``max_iters``-style epoch tiling
        # (reference train.py:110, datasets.py:116) repeats the same file
        # under many indices — those must be one cache entry, or the cache
        # never hits within the tiled epoch
        key = self.dataset.name(index)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        item = self.dataset[index]
        nbytes = self._item_bytes(item)
        if self._has_room(nbytes):
            self._cache[key] = item
            self._bytes += nbytes
        elif not self._warned_full:
            self._warned_full = True
            logger.warning(
                f"decoded-sample cache full after {len(self._cache)} samples "
                f"({self._bytes / 2**30:.1f} GB; caps: max_bytes="
                f"{self.max_bytes}, max_items={self.max_items}) — further "
                f"samples decode per epoch. Raise CCNET_TPU_CACHE_GB "
                f"(0 = unbounded) to cache the full set."
            )
        return item


class DataLoader:
    """Iterates (images, labels, names) batches with background prefetch.

    Yields raw host arrays; device placement/augmentation is the trainer's
    job (so the loader stays backend-agnostic and testable).

    Multi-process (multi-host) sharding follows the reference's
    ``DistributedSampler`` semantics (``engine.py:85-97``): each process takes
    a strided slice of the epoch-seeded permutation — identical permutation
    on every process, disjoint strides — and ``batch_size`` is the
    *per-process* batch. Unlike ``DistributedSampler`` we never pad with
    duplicate samples (which would double-count images in eval); the tail
    that doesn't fill a batch is dropped (``drop_last``) or short.
    ``process_index``/``process_count`` default to the live ``jax.distributed``
    topology (1 process when uninitialised).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        drop_last: bool = True,
        prefetch: int = 2,
        decode_ahead: Optional[int] = None,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.prefetch = prefetch
        # Max decoded samples in flight beyond the consume point — bounds the
        # host RAM the lookahead can pin (decoded Cityscapes samples are
        # ~32 MB each). Default: enough to cover the prefetch queue plus one
        # batch of slack.
        self.decode_ahead = (
            decode_ahead if decode_ahead is not None else (prefetch + 1) * batch_size
        )
        self.epoch = 0
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index() if process_index is None else process_index
            process_count = jax.process_count() if process_count is None else process_count
        if not (0 <= process_index < process_count):
            raise ValueError(f"process_index {process_index} not in [0, {process_count})")
        self.process_index = process_index
        self.process_count = process_count

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        # augmenting wrappers re-draw their randomness per epoch
        set_ds_epoch = getattr(self.dataset, "set_epoch", None)
        if set_ds_epoch is not None:
            set_ds_epoch(epoch)

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.RandomState(self.seed + self.epoch).permutation(n)
        else:
            order = np.arange(n)
        return order[self.process_index::self.process_count]

    def __len__(self):
        n = len(self._order())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        order = self._order()
        n_batches = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            # submit sample decodes across batch boundaries (decode_ahead
            # samples past the consume point) so a straggler in batch b
            # doesn't idle the workers that could already decode b+1
            ex = ThreadPoolExecutor(max_workers=self.num_workers)
            try:
                flat = list(order[:min(len(order), n_batches * self.batch_size)])
                futures: dict = {}
                submitted = 0
                pos = 0
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    while submitted < len(flat) and submitted < pos + self.decode_ahead:
                        futures[submitted] = ex.submit(
                            self.dataset.__getitem__, flat[submitted]
                        )
                        submitted += 1
                    # last batch may be short when drop_last is False
                    count = min(self.batch_size, len(flat) - b * self.batch_size)
                    samples = []
                    for _ in range(count):
                        samples.append(futures.pop(pos).result())
                        pos += 1
                    images = np.stack([s[0] for s in samples])
                    labels = np.stack([s[1] for s in samples])
                    q.put((images, labels, [s[2] for s in samples]))
            except Exception as e:  # surface decode errors to the consumer
                q.put(e)
            finally:
                # drop queued lookahead work on teardown — don't block exit
                # on decodes whose results will be discarded
                ex.shutdown(wait=False, cancel_futures=True)
                q.put(None)

        t = threading.Thread(target=producer, daemon=True,
                             name="ccnet-loader-producer")
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            _shutdown_pipeline(q, t, stop)


def device_prefetch(iterator, place_fn, depth: int = 2):
    """Overlap host→device transfer with device compute.

    A background thread pulls ``(images, labels, names)`` batches from
    ``iterator`` and runs ``place_fn(images, labels) -> (dev_images,
    dev_labels)`` (``jnp.asarray`` / ``jax.device_put`` with the desired
    sharding) up to ``depth`` batches ahead of the consumer. On a real TPU
    host the PCIe copy is cheap but still serial with the Python step loop;
    on this rig's tunneled plugin the transfer is the slow leg outright —
    either way it belongs off the critical path. The reference gets the same
    overlap implicitly from ``DataLoader`` workers + ``cuda()`` ahead of
    ``forward`` (reference ``train.py:206-210``).

    Transfer errors surface at the consumer's ``next()``.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def producer():
        try:
            it = iter(iterator)
            # check stop BEFORE pulling the next batch too: after a consumer
            # abandons mid-epoch, pulling first would pay one more full
            # decode + device transfer before noticing (multi-second on a
            # tunneled link)
            while not stop.is_set():
                try:
                    images, labels, names = next(it)
                except StopIteration:
                    return
                if stop.is_set():
                    return
                q.put((*place_fn(images, labels), names))
        except Exception as e:  # noqa: BLE001 - re-raised at the consumer
            q.put(e)
        finally:
            q.put(None)

    t = threading.Thread(target=producer, daemon=True,
                         name="ccnet-prefetch-producer")
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        _shutdown_pipeline(q, t, stop)
