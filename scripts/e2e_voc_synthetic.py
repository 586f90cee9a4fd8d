"""Hardware end-to-end check of the VOC code path (VERDICT r4 #7).

The VOC pipeline differs from Cityscapes everywhere the reference's
``VOCDataSet`` differs (``dataset/datasets.py:12-118``): variable-size
JPEG images + grayscale PNG labels under ``JPEGImages`` /
``SegmentationClassAug`` with an id-list file, mean (128,128,128), scale
range 0.5–1.6, 21 classes, and HOST augmentation (variable shapes can't
batch through the jitted device sampler). Eval pads variable-size images
to 128-multiples (bucketed jit).

This script drives that whole surface on hardware: synthesize a
variable-size color-coded VOC tree on disk → train through
``VOCDataset → CachedDataset → AugmentingDataset`` (precropped backend,
the exact ``cli/train.py --dataset voc`` wiring) → export ``.pth`` →
bucketed ``Evaluator`` on held-out variable-size images.

Passes when held-out meanIU > 0.5. Run from the repo root on a TPU host:
``python scripts/e2e_voc_synthetic.py`` (~15-30 min, mostly compile).
``E2E_DEPTH=50`` for the faster R50 variant, ``E2E_STEPS`` to override.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

DEPTH = int(os.environ.get("E2E_DEPTH", "101"))
STEPS = int(os.environ.get("E2E_STEPS", "300"))
MIN_MIOU = float(os.environ.get("E2E_MIN_MIOU", "0.5"))  # lower for CPU smokes
BATCH = int(os.environ.get("E2E_BATCH", "8"))
CROP = int(os.environ.get("E2E_CROP", "321"))
ROOT = os.environ.get("E2E_VOC_ROOT", "/tmp/ccnet_e2e_voc")
SNAP = os.path.join(ROOT, "snap")
N_CLASSES = 21

# 21 well-separated colors (JPEG is lossy; random colors can collide)
_COLORS = np.random.RandomState(42).permutation(
    np.stack(np.meshgrid([40, 120, 200], [40, 120, 200], [40, 120, 200]),
             -1).reshape(-1, 3).astype(np.float64))[:N_CLASSES] + \
    np.arange(N_CLASSES)[:, None] * 0.7


def make_voc_tree(root, n_train=8, n_val=2):
    """Variable-size color-coded synthetic VOC layout on disk."""
    import cv2

    img_dir = os.path.join(root, "JPEGImages")
    lbl_dir = os.path.join(root, "SegmentationClassAug")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    ids = {"train": [], "val": []}
    for split, n, seed0 in (("train", n_train, 0), ("val", n_val, 1000)):
        for i in range(n):
            rng = np.random.RandomState(seed0 + i)
            # VOC-like variable sizes (refuse multiples of 64 so bucketing pads)
            h = int(rng.randint(280, 460))
            w = int(rng.randint(320, 500))
            blocks = rng.randint(0, N_CLASSES, (h // 64 + 1, w // 64 + 1))
            lbl = np.kron(blocks, np.ones((64, 64), np.int64))[:h, :w]
            img = np.clip(_COLORS[lbl] + rng.randn(h, w, 3) * 5.0, 0, 255)
            name = f"{split}_{i:04d}"
            assert cv2.imwrite(os.path.join(img_dir, f"{name}.jpg"),
                               img.astype(np.uint8),
                               [cv2.IMWRITE_JPEG_QUALITY, 97])
            assert cv2.imwrite(os.path.join(lbl_dir, f"{name}.png"),
                               lbl.astype(np.uint8))
            ids[split].append(name)
    for split in ("train", "val"):
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            f.write("\n".join(ids[split]) + "\n")
    return ids


ids = make_voc_tree(ROOT)
print(f"VOC tree at {ROOT}: {len(ids['train'])} train / {len(ids['val'])} val",
      flush=True)

from ccnet_tpu.data import AugmentingDataset, CachedDataset, DataLoader
from ccnet_tpu.data.voc import VOC_MEAN, VOC_SCALE_MIN, VOC_SCALE_STEPS, VOCDataset
from ccnet_tpu.evaluation import Evaluator
from ccnet_tpu.models import build_model
from ccnet_tpu.train.trainer import TrainConfig, Trainer
from ccnet_tpu.utils import load_pth

# --- train: the exact `cli/train.py --dataset voc` wiring -------------------
raw = CachedDataset(VOCDataset(ROOT, os.path.join(ROOT, "train.txt")))
dataset = AugmentingDataset(
    raw, crop_hw=(CROP, CROP), mean=VOC_MEAN, ignore_label=255,
    scale=True, mirror=True, scale_min=VOC_SCALE_MIN,
    scale_steps=VOC_SCALE_STEPS, seed=304,
)
cfg = TrainConfig(model="ccnet", num_classes=N_CLASSES, depth=DEPTH,
                  recurrence=2, input_size=(CROP, CROP), batch_size=BATCH,
                  num_steps=STEPS, save_every=STEPS, ohem=False,
                  snapshot_dir=SNAP, log_every=50, learning_rate=5e-3,
                  augment_backend="precropped", mean=VOC_MEAN)
loader = DataLoader(dataset, BATCH, shuffle=True, num_workers=2)
trainer = Trainer(cfg)
res = trainer.run(loader)
print("train done:", res, flush=True)

# --- eval: exported .pth through the bucketed variable-size pipeline --------
PTH = os.path.join(SNAP, f"CS_scenes_{STEPS}.pth")
model = build_model("ccnet", num_classes=N_CLASSES, depth=DEPTH, recurrence=2,
                    dtype=jnp.bfloat16)
variables = jax.jit(lambda: model.init(
    jax.random.PRNGKey(0), jnp.zeros((1, CROP, CROP, 3)), train=False))()
variables, miss, unexp = load_pth(PTH, variables)
assert not miss and not unexp
ev = Evaluator(lambda x: model.apply(variables, x, train=False)["main"],
               num_classes=N_CLASSES, tile_hw=(CROP, CROP), mean=VOC_MEAN,
               bucket=128)


class EvalLoader:
    def __iter__(self):
        ds = VOCDataset(ROOT, os.path.join(ROOT, "val.txt"), raw_dtype="uint8")
        for i in range(len(ds)):
            img, lbl, name = ds[i]
            yield img[None], lbl.astype(np.int32)[None], [name]


result = ev.run(EvalLoader())
print(f"held-out meanIU (VOC path, R{DEPTH}, buckets={sorted(ev.compiled_shapes)}): "
      f"{result['meanIU']:.4f}", flush=True)
assert result["meanIU"] > MIN_MIOU, result["meanIU"]
print("VOC E2E LOOP OK", flush=True)
