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

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np


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

    def __len__(self):
        return len(self.dataset)

    def name(self, index):
        return self.dataset.name(index)

    def __getitem__(self, index):
        image, label, name = self.dataset[index]
        rng = np.random.RandomState((self.seed * 1000003 + index) % (2 ** 31))
        img, lbl = self._augment(
            image, label, rng, crop_hw=self.crop_hw, mean=self.mean,
            ignore_label=self.ignore_label, scale=self.scale, mirror=self.mirror,
            scale_min=self.scale_min, scale_steps=self.scale_steps,
        )
        return img, lbl, name


class CachedDataset:
    """Decode-once RAM cache around any (image, label, name) dataset.

    First access of an index pays the disk decode; repeat epochs serve the
    raw arrays from memory (the TPU trains many epochs over 2975 images —
    the reference re-decoded every epoch in its 8 DataLoader workers,
    reference ``train.py:112``). Pair with ``raw_dtype='uint8'`` so the
    cache holds ~8 MB/sample instead of 32 MB. Thread-safe for the loader's
    worker pool (dict writes are atomic; a racing double-decode is benign).
    """

    def __init__(self, dataset, max_items: Optional[int] = None):
        self.dataset = dataset
        self.max_items = max_items
        self._cache: dict = {}

    def __len__(self):
        return len(self.dataset)

    def name(self, index: int) -> str:
        return self.dataset.name(index)

    def __getitem__(self, index: int):
        hit = self._cache.get(index)
        if hit is not None:
            return hit
        item = self.dataset[index]
        if self.max_items is None or len(self._cache) < self.max_items:
            self._cache[index] = item
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

        t = threading.Thread(target=producer, daemon=True)
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
            stop.set()
