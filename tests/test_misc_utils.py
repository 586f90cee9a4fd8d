"""Visualization utils + lenient partial .pth loading (ImageNet-init path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccnet_tpu.utils.visualization import decode_labels, decode_predictions, inv_preprocess
from ccnet_tpu.data.preprocess import CITYSCAPES_MEAN_BGR

torch = pytest.importorskip("torch")


def test_decode_labels_shapes_and_ignore():
    labels = np.array([[[0, 1], [18, 255]]])
    rgb = decode_labels(labels)
    assert rgb.shape == (1, 2, 2, 3) and rgb.dtype == np.uint8
    assert (rgb[0, 1, 1] == 0).all()  # ignore -> black
    assert (rgb[0, 0, 0] == 0).all()  # class 0 is black in VOC map
    assert rgb[0, 0, 1].any()  # class 1 is colored


def test_decode_predictions_argmax():
    logits = np.zeros((1, 2, 2, 3))
    logits[..., 2] = 1.0
    rgb = decode_predictions(logits)
    np.testing.assert_array_equal(rgb[0, 0, 0], decode_labels(np.array([[[2]]]))[0, 0, 0])


def test_inv_preprocess_roundtrip():
    rng = np.random.RandomState(0)
    raw_bgr = rng.randint(0, 256, (1, 4, 4, 3)).astype(np.float32)
    pre = raw_bgr - np.asarray(CITYSCAPES_MEAN_BGR, np.float32)
    rgb = inv_preprocess(pre)
    np.testing.assert_allclose(rgb[..., ::-1], raw_bgr, atol=1)


def test_partial_pth_load_imagenet_style(tmp_path):
    """A backbone-only (ImageNet-style) .pth loads leniently: backbone weights
    applied, head/dsn reported missing and left at init — the reference's
    pretrained-init path (load_model strict=False)."""
    from ccnet_tpu.models import CCNet
    from ccnet_tpu.utils import load_pth, variables_to_torch_state_dict

    model = CCNet(num_classes=7, layers=(1, 1, 1, 1), impl="jnp")
    x = jnp.zeros((1, 65, 65, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    sd = variables_to_torch_state_dict(variables)
    backbone_only = {k: torch.from_numpy(np.ascontiguousarray(v * 0 + 1.0))
                     for k, v in sd.items()
                     if not k.startswith(("head.", "dsn."))}
    backbone_only["fc.weight"] = torch.zeros(2, 2)  # classifier junk to ignore
    path = str(tmp_path / "imagenet.pth")
    torch.save(backbone_only, path)

    restored, missing, unexpected = load_pth(path, variables)
    assert any(k.startswith("head.") for k in missing)
    assert "fc.weight" in unexpected
    # backbone conv now all-ones, head conv untouched
    assert float(np.asarray(restored["params"]["backbone"]["conv1"]["weight"]).min()) == 1.0
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["head"]["conva_conv"]["weight"]),
        np.asarray(variables["params"]["head"]["conva_conv"]["weight"]),
    )
