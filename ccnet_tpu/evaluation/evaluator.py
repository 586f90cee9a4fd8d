"""End-to-end evaluation driver: val mIoU, result.txt, prediction PNGs.

Capability parity with the reference's ``evaluate.py`` main loop
(``:197-281``): iterate the val set, multi-scale/flip sliding (or whole)
prediction, confusion-matrix accumulation, per-class IU + meanIU written to
``result.txt`` as JSON, palette PNGs of predictions.
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ccnet_tpu.data.palette import cityscapes_palette, save_indexed_png
from ccnet_tpu.data.preprocess import CITYSCAPES_MEAN_BGR
from ccnet_tpu.evaluation.metrics import ConfusionAccumulator, iou_from_confusion
from ccnet_tpu.evaluation.sliding import predict_multiscale


class Evaluator:
    def __init__(
        self,
        apply_fn: Callable,  # (B, h, w, 3) -> (B, h/8, w/8, C) logits
        num_classes: int = 19,
        tile_hw: Tuple[int, int] = (769, 769),
        scales: Sequence[float] = (1.0,),
        flip: bool = False,
        whole: bool = False,
        ignore_label: int = 255,
        mean=CITYSCAPES_MEAN_BGR,
        class_names: Optional[Sequence[str]] = None,
        mesh=None,
        bucket: Optional[int] = None,
        palette: Optional[list] = None,
    ):
        self.apply_fn = apply_fn
        self.num_classes = num_classes
        self.tile_hw = tile_hw
        self.scales = scales
        self.flip = flip
        self.whole = whole
        self.ignore_label = ignore_label
        self.mean = np.asarray(mean, np.float32)
        self.class_names = class_names
        # Pad-to-bucket (SURVEY §7e): variable-size datasets (VOC) would
        # compile one program per image shape; rounding H/W up to the next
        # multiple of ``bucket`` bounds compilation to the number of distinct
        # buckets. Padding uses the dataset mean (zero after mean-subtract —
        # the reference's pad_image cval, evaluate.py:95-100) and predictions
        # are cropped back. Note the crop removes the padded *outputs*, not
        # the padding's influence: the network's receptive field near the
        # right/bottom borders sees up to bucket-1 pixels of mean context
        # that an unbucketed run would not (the same context the reference
        # injects when it pads any image smaller than the crop). Set
        # ``bucket=None`` for exact per-shape behaviour at per-shape
        # compile cost.
        self.bucket = bucket
        self.palette = palette
        self.compiled_shapes: set = set()  # distinct jitted input shapes
        # ONE compiled program for the whole predict pipeline (mean-subtract →
        # multi-scale sliding forward → averaging → argmax). Eager op-by-op
        # execution is pathologically slow on remote-compile TPU platforms;
        # jitting the pipeline is also simply the right XLA shape (one launch
        # per batch). Cached per input shape.
        import jax

        def _pipeline(images):
            # f32 widen happens ON DEVICE: callers may ship raw uint8 BGR
            # (4× less host→device wire than f32 — decisive on tunneled
            # links, still free PCIe on a production host)
            x = images.astype(jnp.float32) - jnp.asarray(self.mean)
            logits = predict_multiscale(
                self.apply_fn, x, self.tile_hw, self.num_classes,
                scales=self.scales, flip=self.flip, whole=self.whole,
                mesh=mesh,
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        self._predict = jax.jit(_pipeline)

    def place(self, images: np.ndarray, labels=None):
        """Bucket-pad on host and place on device (u8 or f32 passthrough).

        Returns ``(dev_images, dev_labels_or_None, (H, W))`` — the original
        spatial size for cropping predictions back."""
        images = np.asarray(images)
        B, H, W = images.shape[0], images.shape[1], images.shape[2]
        if self.bucket:
            Hp = -(-H // self.bucket) * self.bucket
            Wp = -(-W // self.bucket) * self.bucket
            if (Hp, Wp) != (H, W):
                padded = np.empty((B, Hp, Wp, 3), images.dtype)
                # zero after the pipeline's subtract (for uint8 the mean
                # rounds to the nearest representable value — a <0.5 LSB
                # difference confined to padding context)
                padded[...] = (np.round(self.mean).astype(images.dtype)
                               if images.dtype != np.float32 else self.mean)
                padded[:, :H, :W] = images
                images = padded
        dev = jnp.asarray(images)
        devl = jnp.asarray(labels) if labels is not None else None
        return dev, devl, (H, W)

    def predict_batch(self, images: np.ndarray) -> np.ndarray:
        """Raw BGR images (B, H, W, 3), f32 or uint8 → trainIds (B, H, W)."""
        dev, _, (H, W) = self.place(images)
        self.compiled_shapes.add(tuple(dev.shape))
        return np.asarray(self._predict(dev))[:, :H, :W]

    def run(self, loader, output_dir: Optional[str] = None, save_preds: bool = False,
            log_every: int = 10, logger=None) -> dict:
        acc = ConfusionAccumulator(self.num_classes, self.ignore_label)
        palette = self.palette if self.palette is not None else cityscapes_palette()
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
        n_done = 0
        # Overlap decode + host→device transfer of batch i+1 with the device
        # compute of batch i (the reference got the decode half of this from
        # DataLoader workers; the transfer half it paid serially per tile).
        from ccnet_tpu.data.loader import device_prefetch

        it = device_prefetch(iter(loader),
                             lambda im, lb: self.place(im, lb), depth=2)
        # PNG encodes (~100 ms/img of host work) run on a writer thread so
        # they overlap the next batch's device compute; errors surface at
        # the end of the loop
        from concurrent.futures import ThreadPoolExecutor

        writes = []
        with ThreadPoolExecutor(max_workers=1) as writer:
            for dev_images, dev_labels, (H, W), names in it:
                self.compiled_shapes.add(tuple(dev_images.shape))
                preds_dev = self._predict(dev_images)[:, :H, :W]
                # confusion accumulates ON DEVICE from the device preds/
                # labels — predictions only cross the wire when PNGs are
                # requested
                acc.update(dev_labels, preds_dev)
                if save_preds and output_dir:
                    preds = np.asarray(preds_dev)
                    for p, name in zip(preds, names):
                        writes.append(writer.submit(
                            save_indexed_png,
                            osp.join(output_dir, f"{name}.png"), p, palette))
                n_done += len(names)
                if logger and n_done % log_every < len(names):
                    # process-local running estimate (no collective
                    # mid-loop: processes reach this point at different
                    # times)
                    _, miou = acc.result(cross_process=False)
                    logger.info(
                        f"eval {n_done} images, running meanIU {miou:.4f}")
        for w in writes:
            w.result()  # re-raise any PNG write failure
        # one cross-process sum at the end, like the reference's single NCCL
        # all-reduce of the confusion matrix (evaluate.py:267-268)
        cm = acc.global_matrix()
        iu, mean_iu = iou_from_confusion(cm)
        result = {
            "meanIU": mean_iu,
            "IU_array": [float(x) for x in iu],
            "confusion": cm.tolist(),
        }
        if self.class_names:
            result["per_class"] = {n: float(x) for n, x in zip(self.class_names, iu)}
        if output_dir:
            from ccnet_tpu.parallel import is_primary_host

            if is_primary_host():  # reference writes result.txt on rank 0 only
                with open(osp.join(output_dir, "result.txt"), "w") as f:
                    json.dump({"meanIU": result["meanIU"], "IU_array": result["IU_array"]}, f)
        return result
