"""PASCAL VOC dataset plumbing (capability parity with the reference's
``VOCDataSet``/``VOCDataTestSet``, ``dataset/datasets.py:12-118``):
``JPEGImages/<id>.jpg`` + ``SegmentationClassAug/<id>.png``, id list file,
mean (128, 128, 128), scale range 0.5–1.6 step 0.1.

VOC images are variable-sized, so augmentation uses the host twin
(:func:`ccnet_tpu.data.preprocess.host_augment`)."""

from __future__ import annotations

import os.path as osp
from typing import Optional

import numpy as np

VOC_MEAN = (128.0, 128.0, 128.0)
VOC_SCALE_MIN, VOC_SCALE_STEPS = 0.5, 12  # 0.5 … 1.6

VOC_CLASS_NAMES = (
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


class VOCDataset:
    def __init__(self, root: str, list_path: str, max_iters: Optional[int] = None,
                 with_labels: bool = True, raw_dtype: str = "float32"):
        self.root = root
        self.with_labels = with_labels
        self.raw_dtype = raw_dtype  # 'uint8' keeps the wire-minimal layout
        ids = [l.strip() for l in open(list_path) if l.strip()]
        if max_iters is not None:
            ids = ids * int(np.ceil(max_iters / len(ids)))
        self.ids = ids

    def __len__(self):
        return len(self.ids)

    def name(self, index: int) -> str:
        return self.ids[index]

    def __getitem__(self, index: int):
        import cv2

        name = self.ids[index]
        image = cv2.imread(osp.join(self.root, f"JPEGImages/{name}.jpg"), cv2.IMREAD_COLOR)
        if image is None:
            raise IOError(f"failed to read VOC image {name}")
        if self.with_labels:
            label = cv2.imread(
                osp.join(self.root, f"SegmentationClassAug/{name}.png"), cv2.IMREAD_GRAYSCALE
            )
            if label is None:
                raise IOError(f"failed to read VOC label {name}")
        else:
            label = np.full(image.shape[:2], 255, np.uint8)
        if self.raw_dtype == "uint8":
            return image, label, name
        return image.astype(np.float32), label.astype(np.int32), name
