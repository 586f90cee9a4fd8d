"""Hardware end-to-end check at the FLAGSHIP config (CCNet-R101, R=2):
train with the real pipeline (device augmentation, OHEM, checkpointing) on
synthetic color-coded data, export .pth, evaluate held-out images with the
sliding-window evaluator, then CROSS-ECOSYSTEM: load the same .pth into an
independent torch replica of the reference network and confirm it scores the
same held-out images — proving a reference-ecosystem consumer reads our
checkpoints bit-correctly.

Passes when held-out meanIU > 0.5 in BOTH frameworks (R50 measured 0.94
after 300 steps on a v5e; run recorded in PARITY.md).

Run from the repo root on a TPU host: python scripts/e2e_synthetic.py
(~20-30 min, mostly compile). E2E_DEPTH=50 for the faster R50 variant,
E2E_SKIP_TORCH=1 to skip the torch leg."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np, jax, jax.numpy as jnp

DEPTH = int(os.environ.get("E2E_DEPTH", "101"))
STEPS = int(os.environ.get("E2E_STEPS", "300"))
LAYERS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[DEPTH]

class LearnableDS:
    """Images encode their labels (one-hot color + noise), blocky 64px."""
    def __init__(self, n=8, hw=(512, 1024), seed=0):
        self.n, self.hw, self.seed = n, hw, seed
    def __len__(self): return self.n
    def name(self, i): return f"syn_{i}"
    def __getitem__(self, i):
        rng = np.random.RandomState(self.seed + i)
        h, w = self.hw
        blocks = rng.randint(0, 19, (h // 64 + 1, w // 64 + 1))
        lbl = np.kron(blocks, np.ones((64, 64), np.int64))[:h, :w].astype(np.int32)
        colors = np.random.RandomState(42).uniform(20.0, 235.0, (19, 3))
        img = (colors[lbl] + rng.randn(h, w, 3) * 8.0).astype(np.float32)
        return img, lbl, self.name(i)

from ccnet_tpu.data import DataLoader
from ccnet_tpu.data.preprocess import CITYSCAPES_MEAN_BGR
from ccnet_tpu.train.trainer import TrainConfig, Trainer
from ccnet_tpu.evaluation import Evaluator
from ccnet_tpu.evaluation.metrics import iou_from_confusion
from ccnet_tpu.models import build_model
from ccnet_tpu.utils import load_pth

PTH = f"/tmp/ccnet_e2e_snap/CS_scenes_{STEPS}.pth"
cfg = TrainConfig(model="ccnet", depth=DEPTH, recurrence=2, input_size=(353, 353),
                  batch_size=8, num_steps=STEPS, save_every=STEPS, ohem=True,
                  ohem_keep=30000, snapshot_dir="/tmp/ccnet_e2e_snap", log_every=50,
                  learning_rate=5e-3)
loader = DataLoader(LearnableDS(), 8, shuffle=True, num_workers=2)
trainer = Trainer(cfg)
res = trainer.run(loader)
print("train done:", res, flush=True)

# evaluate with the exported .pth through the real eval pipeline
model = build_model("ccnet", num_classes=19, depth=DEPTH, recurrence=2, dtype=jnp.bfloat16)
variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1,353,353,3)), train=False))()
variables, miss, unexp = load_pth(PTH, variables)
assert not miss and not unexp
apply_fn = lambda x: model.apply(variables, x, train=False)["main"]
ev = Evaluator(apply_fn, num_classes=19, tile_hw=(353, 353))

class EvalLoader:
    def __iter__(self):
        ds = LearnableDS(n=2, seed=1000)  # held-out
        for i in range(2):
            img, lbl, name = ds[i]
            yield img[None], lbl[None], [name]

result = ev.run(EvalLoader())
print(f"held-out meanIU (ccnet_tpu, R{DEPTH}): {result['meanIU']:.4f}", flush=True)
assert result["meanIU"] > 0.5, result["meanIU"]

# ---- cross-ecosystem leg: the torch oracle reads the same .pth -------------
if not os.environ.get("E2E_SKIP_TORCH"):
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_full_ccnet_torch_parity import TorchCCNet

    tm = TorchCCNet(19, LAYERS, 2)
    load = tm.load_state_dict(torch.load(PTH, weights_only=False), strict=False)
    assert not load.unexpected_keys, load.unexpected_keys
    assert all(k.endswith("num_batches_tracked") for k in load.missing_keys)
    tm.eval()

    cm = np.zeros((19, 19), np.int64)
    ds = LearnableDS(n=2, seed=1000)
    with torch.no_grad():
        for i in range(2):
            img, lbl, _ = ds[i]
            x = (img - np.asarray(CITYSCAPES_MEAN_BGR, np.float32))
            xt = torch.from_numpy(x.transpose(2, 0, 1)[None])
            main, _ = tm(xt)
            up = torch.nn.functional.interpolate(
                main, size=img.shape[:2], mode="bilinear", align_corners=True)
            pred = up.argmax(1)[0].numpy()
            valid = lbl != 255
            cm += np.bincount(
                19 * lbl[valid].astype(np.int64) + pred[valid],
                minlength=361).reshape(19, 19)
    _, torch_miou = iou_from_confusion(cm)
    print(f"held-out meanIU (torch oracle,  R{DEPTH}): {torch_miou:.4f}", flush=True)
    assert torch_miou > 0.5, torch_miou
    print("CROSS-ECOSYSTEM OK", flush=True)

print("E2E LOOP OK", flush=True)
