"""CLI smoke tests: train a few synthetic steps (with checkpointing + resume)
and evaluate synthetically — the full user-facing surface on CPU."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full CLI train/eval runs (~5 min total)


def test_train_cli_synthetic_and_resume(tmp_path):
    from ccnet_tpu.cli.train import main

    snap = str(tmp_path / "snap")
    args = [
        "--synthetic", "--synthetic-size", "128,128", "--input-size", "65,65",
        "--model", "ccnet", "--depth", "50", "--recurrence", "2",
        "--batch-size", "2", "--num-steps", "2", "--save-pred-every", "2",
        "--snapshot-dir", snap, "--num-workers", "2", "--ohem", "1",
        "--ohem-keep", "500", "--fp32", "1",
    ]
    result = main(args)
    assert result["final_step"] == 2
    assert np.isfinite(result["final_loss"])
    files = os.listdir(snap)
    assert any(f.startswith("step_") for f in files), files
    assert "CS_scenes_2.pth" in files, files

    # resume continues from step 2 to 4
    result2 = main(args + ["--num-steps", "4", "--resume", "1"])
    assert result2["final_step"] == 4


def test_evaluate_cli_synthetic(tmp_path):
    from ccnet_tpu.cli.evaluate import main

    out = str(tmp_path / "out")
    result = main([
        "--synthetic", "--synthetic-size", "257,321", "--input-size", "257,257",
        "--model", "ccnet", "--depth", "50", "--output-dir", out, "--fp32", "1",
        "--batch-size", "1",
    ])
    assert 0 <= result["meanIU"] <= 1
    assert os.path.exists(os.path.join(out, "result.txt"))
    blob = json.load(open(os.path.join(out, "result.txt")))
    assert "meanIU" in blob and len(blob["IU_array"]) == 19


def test_train_cli_host_u8_backend(tmp_path):
    """End-to-end: tiny Cityscapes tree → u8 host augmentation (wire-minimal
    path: U8CropDataset + cached raw decode + finish_u8_crops) → 2 steps."""
    cv2 = pytest.importorskip("cv2")
    from ccnet_tpu.cli.train import main

    img_dir = tmp_path / "leftImg8bit" / "train" / "toy"
    lbl_dir = tmp_path / "gtFine" / "train" / "toy"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(4):
        assert cv2.imwrite(str(img_dir / f"toy_{i:06d}_000019_leftImg8bit.png"),
                           rng.randint(0, 255, (100, 140, 3), dtype=np.uint8))
        assert cv2.imwrite(str(lbl_dir / f"toy_{i:06d}_000019_gtFine_labelIds.png"),
                           rng.randint(0, 34, (100, 140), dtype=np.uint8))

    snap = str(tmp_path / "snap")
    result = main([
        "--data-dir", str(tmp_path), "--input-size", "65,65",
        "--model", "ccnet", "--depth", "50", "--recurrence", "1",
        "--batch-size", "2", "--num-steps", "2", "--save-pred-every", "2",
        "--snapshot-dir", snap, "--num-workers", "2", "--fp32", "1",
        "--augment-backend", "host_u8", "--cache-decoded", "1",
    ])
    assert result["final_step"] == 2
    assert np.isfinite(result["final_loss"])
