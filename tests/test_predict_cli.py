"""predict CLI end-to-end: fake Cityscapes test split → labelId submission PNGs."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end submission PNG pipeline

cv2 = pytest.importorskip("cv2")


def test_predict_cli_submission(tmp_path):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ccnet_tpu.cli.predict import main
    from ccnet_tpu.data.cityscapes import CITYSCAPES_TRAINID_TO_ID
    from ccnet_tpu.models import build_model
    from ccnet_tpu.utils import save_pth

    # fake test split (no labels), standard layout
    img_dir = tmp_path / "leftImg8bit" / "test" / "faketown"
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    for i in range(2):
        cv2.imwrite(str(img_dir / f"faketown_{i:06d}_000019_leftImg8bit.png"),
                    rng.randint(0, 255, (128, 160, 3)).astype(np.uint8))

    # tiny checkpoint the CLI can load
    model = build_model("ccnet", num_classes=19, recurrence=2, depth=50, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 97, 97, 3)), train=False)
    ckpt = str(tmp_path / "tiny.pth")
    save_pth(variables, ckpt)

    out = str(tmp_path / "outputs")
    main([
        "--data-dir", str(tmp_path), "--split", "test", "--depth", "50",
        "--input-size", "97,97", "--restore-from", ckpt, "--output-dir", out,
    ])
    files = sorted(os.listdir(out))
    assert len(files) == 2 and all(f.endswith(".png") for f in files)
    # submission format: pixel values are raw labelIds, not trainIds
    arr = np.asarray(Image.open(os.path.join(out, files[0])))
    assert arr.shape == (128, 160)
    valid_ids = set(CITYSCAPES_TRAINID_TO_ID.values())
    assert set(np.unique(arr)) <= valid_ids

    # whole-image multi-chip submission: --whole --space 2 (height sharded
    # over the mesh's `space` axis, same surface as evaluate_cli) must write
    # byte-identical PNGs to the single-device --space 1 run
    with pytest.raises(SystemExit):  # --space without --whole is an error
        main(["--restore-from", ckpt, "--space", "2", "--whole", "0"])
    whole = [
        "--data-dir", str(tmp_path), "--split", "test", "--depth", "50",
        "--input-size", "97,97", "--restore-from", ckpt,
        "--whole", "1", "--fp32", "1",
    ]
    o1, o2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    main(whole + ["--output-dir", o1, "--space", "1"])
    main(whole + ["--output-dir", o2, "--space", "2"])
    for f in files:
        a = np.asarray(Image.open(os.path.join(o1, f)))
        b = np.asarray(Image.open(os.path.join(o2, f)))
        np.testing.assert_array_equal(a, b)
