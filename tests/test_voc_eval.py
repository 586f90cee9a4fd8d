"""VOC evaluation path: end-to-end CLI on a synthetic VOC-layout directory,
plus pad-to-bucket compile bounding for variable-size inputs.

The reference's own ``evaluate.py`` was Cityscapes-only; its VOC capability
stopped at data plumbing (``dataset/datasets.py:12-118``). Here the eval
surface covers VOC end-to-end: id-list dataset, 21 classes, VOC mean,
whole-image prediction, VOC colormap PNGs, result.txt.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end VOC evaluate CLI


def _make_voc_tree(tmp_path, names_sizes):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClassAug").mkdir()
    rng = np.random.RandomState(0)
    for n, (h, w) in names_sizes:
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        assert cv2.imwrite(str(root / "JPEGImages" / f"{n}.jpg"), img)
        lab = rng.randint(0, 21, (h, w)).astype(np.uint8)
        assert cv2.imwrite(str(root / "SegmentationClassAug" / f"{n}.png"), lab)
    lst = tmp_path / "val.txt"
    lst.write_text("\n".join(n for n, _ in names_sizes) + "\n")
    return root, lst


def test_evaluate_cli_voc_end_to_end(tmp_path):
    from ccnet_tpu.cli.evaluate import main

    names_sizes = [("2007_000001", (65, 81)), ("2007_000002", (73, 65))]
    root, lst = _make_voc_tree(tmp_path, names_sizes)
    out = str(tmp_path / "out")
    result = main([
        "--dataset", "voc", "--data-dir", str(root), "--data-list", str(lst),
        "--whole", "1", "--model", "ccnet", "--depth", "50", "--fp32", "1",
        "--output-dir", out, "--bucket", "32", "--batch-size", "1",
    ])
    assert 0 <= result["meanIU"] <= 1
    assert len(result["IU_array"]) == 21
    assert set(result["per_class"]) == {
        *__import__("ccnet_tpu.data.voc", fromlist=["VOC_CLASS_NAMES"]).VOC_CLASS_NAMES
    }
    # palette PNG per image + result.txt
    for n, _ in names_sizes:
        assert os.path.exists(os.path.join(out, f"{n}.png"))
    blob = json.load(open(os.path.join(out, "result.txt")))
    assert len(blob["IU_array"]) == 21


def test_pad_to_bucket_bounds_compiles():
    """Differently-sized inputs that share a bucket reuse ONE compiled shape,
    and padding does not change the scored prediction."""
    import jax.numpy as jnp

    from ccnet_tpu.evaluation import Evaluator

    def apply_fn(x):  # fake OS-8 model: 4-channel logits from pooled input
        pooled = x[:, ::8, ::8, :]
        return jnp.concatenate([pooled, -pooled[..., :1]], axis=-1)

    ev = Evaluator(apply_fn, num_classes=4, tile_hw=(33, 33), whole=True, bucket=32)
    rng = np.random.RandomState(1)
    p1 = ev.predict_batch(rng.randn(1, 40, 52, 3).astype(np.float32) * 20)
    p2 = ev.predict_batch(rng.randn(1, 37, 49, 3).astype(np.float32) * 20)
    assert p1.shape == (1, 40, 52) and p2.shape == (1, 37, 49)
    assert len(ev.compiled_shapes) == 1, ev.compiled_shapes

    # unbucketed reference on the same image: scored pixels identical
    ev_ref = Evaluator(apply_fn, num_classes=4, tile_hw=(33, 33), whole=True)
    img = rng.randn(1, 37, 49, 3).astype(np.float32) * 20
    np.testing.assert_array_equal(ev.predict_batch(img), ev_ref.predict_batch(img))
