"""Checkpoint tests: name mapping, .pth roundtrip, torch numeric parity of a
converted bottleneck block, orbax full-state resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccnet_tpu.models import CCNet, DeepLabV3, PSPNet
from ccnet_tpu.models.backbone import Bottleneck
from ccnet_tpu.utils.checkpoint import (
    load_pth,
    restore_checkpoint,
    save_checkpoint,
    save_pth,
    torch_state_dict_to_variables,
    variables_to_torch_state_dict,
)

torch = pytest.importorskip("torch")


def tiny_vars(cls, **kw):
    model = cls(num_classes=7, layers=(1, 1, 1, 1), **kw)
    x = jnp.zeros((1, 65, 65, 3), jnp.float32)
    return model, model.init(jax.random.PRNGKey(0), x, train=False)


@pytest.mark.slow
def test_torch_key_names_ccnet():
    _, variables = tiny_vars(CCNet, impl="jnp")
    sd = variables_to_torch_state_dict(variables)
    expected_samples = [
        "conv1.weight", "bn1.weight", "bn1.running_mean", "bn3.running_var",
        "layer1.0.conv1.weight", "layer1.0.bn2.weight",
        "layer1.0.downsample.0.weight", "layer1.0.downsample.1.running_var",
        "head.conva.0.weight", "head.conva.1.bias",
        "head.cca.query_conv.weight", "head.cca.query_conv.bias",
        "head.cca.gamma", "head.convb.0.weight",
        "head.bottleneck.0.weight", "head.bottleneck.1.running_mean",
        "head.bottleneck.3.weight", "head.bottleneck.3.bias",
        "dsn.0.weight", "dsn.0.bias", "dsn.1.weight", "dsn.3.bias",
    ]
    for k in expected_samples:
        assert k in sd, f"missing {k}"
    # conv weights are OIHW
    assert sd["conv1.weight"].shape == (64, 3, 3, 3)
    assert sd["head.bottleneck.3.weight"].shape == (7, 512, 1, 1)
    # 1:1 leaf count
    n_leaves = len(jax.tree_util.tree_leaves(variables))
    assert len(sd) == n_leaves


@pytest.mark.slow
def test_torch_key_names_psp_and_aspp():
    _, v_psp = tiny_vars(PSPNet)
    sd = variables_to_torch_state_dict(v_psp)
    for k in ["head.0.stages.0.1.weight", "head.0.stages.3.2.running_mean",
              "head.0.bottleneck.0.weight", "head.1.weight", "head.1.bias"]:
        assert k in sd, k
    _, v_dl = tiny_vars(DeepLabV3)
    sd = variables_to_torch_state_dict(v_dl)
    for k in ["head.0.conv1.1.weight", "head.0.conv2.0.weight",
              "head.0.conv3.0.weight", "head.0.conv5.1.running_var",
              "head.0.bottleneck.0.weight", "head.1.weight"]:
        assert k in sd, k


def test_pth_roundtrip(tmp_path):
    model, variables = tiny_vars(CCNet, impl="jnp")
    path = str(tmp_path / "ckpt.pth")
    save_pth(variables, path)
    restored, missing, unexpected = load_pth(path, variables)
    assert not missing and not unexpected
    for a, b in zip(jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # outputs identical
    x = jnp.asarray(np.random.RandomState(0).randn(1, 65, 65, 3).astype(np.float32))
    o1 = model.apply(variables, x, train=False)
    o2 = model.apply(restored, x, train=False)
    np.testing.assert_allclose(np.asarray(o1["main"]), np.asarray(o2["main"]), atol=0)


def test_module_prefix_and_model_wrapper(tmp_path):
    """load_model semantics: unwrap {'model': ...} and strip 'module.'."""
    model, variables = tiny_vars(CCNet, impl="jnp")
    sd = variables_to_torch_state_dict(variables)
    wrapped = {"model": {f"module.{k}": torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()}}
    path = str(tmp_path / "wrapped.pth")
    torch.save(wrapped, path)
    restored, missing, unexpected = load_pth(path, variables)
    assert not missing and not unexpected


class TorchBottleneck(torch.nn.Module):
    """Independent torch oracle of the bottleneck spec (eval-mode BN)."""

    def __init__(self, cin, planes, stride=1, dilation=1, downsample=False):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride=stride,
                                     padding=dilation, dilation=dilation, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(planes * 4)
        self.down = None
        if downsample:
            self.down_conv = torch.nn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False)
            self.down_bn = torch.nn.BatchNorm2d(planes * 4)
            self.down = True

    def forward(self, x):
        r = x
        o = torch.relu(self.bn1(self.conv1(x)))
        o = torch.relu(self.bn2(self.conv2(o)))
        o = self.bn3(self.conv3(o))
        if self.down:
            r = self.down_bn(self.down_conv(x))
        return torch.relu(o + r)


@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2)])
def test_bottleneck_numerics_match_torch(stride, dilation):
    """Convert our bottleneck weights to torch and compare eval-mode outputs
    — catches conv transpose / padding / BN-formula mismatches."""
    rng = np.random.RandomState(0)
    cin, planes = 16, 8
    block = Bottleneck(planes, stride=stride, dilation=dilation, has_downsample=True)
    x = rng.randn(1, 17, 17, cin).astype(np.float32)
    variables = block.init(jax.random.PRNGKey(1), jnp.asarray(x), train=False)
    # randomize batch stats so BN isn't trivial
    bs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32) + 0.5),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    ours = np.asarray(block.apply(variables, jnp.asarray(x), train=False))

    tb = TorchBottleneck(cin, planes, stride, dilation, downsample=True).eval()
    p, s = variables["params"], variables["batch_stats"]

    def copy_conv(mod, tree):
        mod.weight.data = torch.from_numpy(np.asarray(tree["weight"]).transpose(3, 2, 0, 1).copy())

    def copy_bn(mod, ptree, stree):
        mod.weight.data = torch.from_numpy(np.asarray(ptree["weight"]).copy())
        mod.bias.data = torch.from_numpy(np.asarray(ptree["bias"]).copy())
        mod.running_mean.data = torch.from_numpy(np.asarray(stree["running_mean"]).copy())
        mod.running_var.data = torch.from_numpy(np.asarray(stree["running_var"]).copy())

    copy_conv(tb.conv1, p["conv1"]); copy_bn(tb.bn1, p["bn1"], s["bn1"])
    copy_conv(tb.conv2, p["conv2"]); copy_bn(tb.bn2, p["bn2"], s["bn2"])
    copy_conv(tb.conv3, p["conv3"]); copy_bn(tb.bn3, p["bn3"], s["bn3"])
    copy_conv(tb.down_conv, p["downsample_conv"])
    copy_bn(tb.down_bn, p["downsample_bn"], s["downsample_bn"])

    with torch.no_grad():
        theirs = tb(torch.from_numpy(x.transpose(0, 3, 1, 2))).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


@pytest.mark.slow
def test_orbax_full_state_roundtrip(tmp_path):
    from ccnet_tpu.train import create_train_state, make_optimizer

    model = CCNet(num_classes=7, layers=(1, 1, 1, 1), impl="jnp")
    tx = make_optimizer(max_steps=100)
    state = create_train_state(model, tx, input_shape=(1, 65, 65, 3))
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    save_checkpoint(str(tmp_path), state, 42)
    restored = restore_checkpoint(str(tmp_path), state)
    assert int(restored.step) == 42
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
