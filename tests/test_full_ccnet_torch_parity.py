"""Whole-CCNet numerics vs an independent torch oracle.

The strongest accuracy-north-star evidence obtainable without Cityscapes
data: a torch replica of the reference network (written from the behavioural
spec of ``networks/ccnet.py:125-191`` — deep stem, ceil-mode maxpool, dilated
bottleneck layers, DSN aux head, RCCA head) with *reference-exact module
names*, loaded through the real ``.pth`` export path, must agree with our
flax model on

* eval-mode main+aux logits,
* the input gradient of the main logits,
* BN running statistics after one train-mode step (torch momentum-0.1,
  unbiased-variance update semantics).

Because the torch module tree mirrors the reference's attribute/Sequential
naming, ``load_state_dict`` on our ``save_pth`` export also validates the
converter's complete key surface in one shot.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccnet_tpu.models import CCNet
from ccnet_tpu.utils.checkpoint import flax_path_to_torch_key, save_pth

pytestmark = pytest.mark.slow  # full-depth R101 forward vs torch oracle

torch = pytest.importorskip("torch")
F = torch.nn.functional
Conv2d = torch.nn.Conv2d
Seq = torch.nn.Sequential


class ABN(torch.nn.BatchNorm2d):
    """BatchNorm + fused activation, InPlace-ABN semantics (leaky 0.01)."""

    def __init__(self, ch, activation="leaky_relu", slope=0.01):
        super().__init__(ch)
        self._act, self._slope = activation, slope

    def forward(self, x):
        y = super().forward(x)
        return F.leaky_relu(y, self._slope) if self._act == "leaky_relu" else y


class Bottleneck(torch.nn.Module):
    def __init__(self, inplanes, planes, stride=1, dilation=1, multi_grid=1,
                 downsample=False):
        super().__init__()
        d = dilation * multi_grid
        self.conv1 = Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = ABN(planes, "identity")
        self.conv2 = Conv2d(planes, planes, 3, stride=stride, padding=d,
                            dilation=d, bias=False)
        self.bn2 = ABN(planes, "identity")
        self.conv3 = Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = ABN(planes * 4, "identity")
        self.downsample = (
            Seq(Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                ABN(planes * 4, "identity"))
            if downsample else None)

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        res = self.downsample(x) if self.downsample is not None else x
        return F.relu(out + res)


class TorchCCA(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.query_conv = Conv2d(c, c // 8, 1)
        self.key_conv = Conv2d(c, c // 8, 1)
        self.value_conv = Conv2d(c, c, 1)
        self.gamma = torch.nn.Parameter(torch.zeros(1))

    def forward(self, x):
        B, C, H, W = x.shape
        q, k, v = self.query_conv(x), self.key_conv(x), self.value_conv(x)
        e_col = torch.einsum("bchw,bckw->bhwk", q, k)
        eye = torch.eye(H, dtype=torch.bool)[:, None, :]
        e_col = e_col.masked_fill(eye[None], float("-1e9"))
        e_row = torch.einsum("bchw,bchv->bhwv", q, k)
        att = torch.softmax(torch.cat([e_col, e_row], dim=3), dim=3)
        out_col = torch.einsum("bhwk,bckw->bchw", att[..., :H], v)
        out_row = torch.einsum("bhwv,bchv->bchw", att[..., H:], v)
        return self.gamma * (out_col + out_row) + x


class RCCAHead(torch.nn.Module):
    def __init__(self, cin, cout, classes, R):
        super().__init__()
        inter = cin // 4
        self.R = R
        self.conva = Seq(Conv2d(cin, inter, 3, padding=1, bias=False), ABN(inter))
        self.cca = TorchCCA(inter)
        self.convb = Seq(Conv2d(inter, inter, 3, padding=1, bias=False), ABN(inter))
        self.bottleneck = Seq(
            Conv2d(cin + inter, cout, 3, padding=1, bias=False), ABN(cout),
            torch.nn.Dropout2d(0.1), Conv2d(cout, classes, 1, bias=True))

    def forward(self, x):
        out = self.conva(x)
        for _ in range(self.R):
            out = self.cca(out)
        out = self.convb(out)
        return self.bottleneck(torch.cat([x, out], 1))


class TorchCCNet(torch.nn.Module):
    """Reference-shaped CCNet (networks/ccnet.py:125-191 behavioural spec)."""

    def __init__(self, classes, layers, R):
        super().__init__()
        self.conv1 = Conv2d(3, 64, 3, stride=2, padding=1, bias=False)
        self.bn1 = ABN(64, "identity")
        self.conv2 = Conv2d(64, 64, 3, padding=1, bias=False)
        self.bn2 = ABN(64, "identity")
        self.conv3 = Conv2d(64, 128, 3, padding=1, bias=False)
        self.bn3 = ABN(128, "identity")
        self.maxpool = torch.nn.MaxPool2d(3, stride=2, padding=1, ceil_mode=True)
        inplanes = 128

        def make_layer(planes, blocks, stride=1, dilation=1, grids=None):
            nonlocal inplanes
            mods = []
            for bi in range(blocks):
                mg = grids[bi % len(grids)] if grids else 1
                mods.append(Bottleneck(
                    inplanes, planes, stride=stride if bi == 0 else 1,
                    dilation=dilation, multi_grid=mg,
                    downsample=bi == 0 and (stride != 1 or inplanes != planes * 4)))
                inplanes = planes * 4
            return Seq(*mods)

        self.layer1 = make_layer(64, layers[0])
        self.layer2 = make_layer(128, layers[1], stride=2)
        self.layer3 = make_layer(256, layers[2], dilation=2)
        self.layer4 = make_layer(512, layers[3], dilation=4, grids=(1, 1, 1))
        self.head = RCCAHead(2048, 512, classes, R)
        self.dsn = Seq(Conv2d(1024, 512, 3, padding=1, bias=True), ABN(512),
                       torch.nn.Dropout2d(0.1), Conv2d(512, classes, 1, bias=True))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = self.maxpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x3 = self.layer3(x)
        x4 = self.layer4(x3)
        return self.head(x4), self.dsn(x3)


def _randomized_variables(model, x, seed=0):
    """Real init for convs (keeps activations stable) + perturbed BN stats
    and a non-zero CCA gamma so the attention path is actually exercised."""
    rng = np.random.RandomState(seed)
    variables = model.init(jax.random.PRNGKey(seed), x, train=False)

    def perturb_stats(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = perturb_stats(v)
            elif k == "running_mean":
                out[k] = jnp.asarray(rng.randn(*v.shape).astype(np.float32) * 0.1)
            else:  # running_var
                out[k] = jnp.asarray(rng.rand(*v.shape).astype(np.float32) + 0.5)
        return out

    def perturb_params(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = perturb_params(v)
            elif k == "gamma":
                out[k] = jnp.full(v.shape, 0.5, jnp.float32)
            elif v.ndim == 1:  # BN weight/bias, conv bias — mild perturbation
                out[k] = jnp.asarray(rng.randn(*v.shape).astype(np.float32) * 0.1) + v
            else:
                out[k] = v
        return out

    return {"params": perturb_params(variables["params"]),
            "batch_stats": perturb_stats(variables["batch_stats"])}


def test_full_ccnet_matches_torch_oracle(tmp_path):
    classes, layers, R = 7, (2, 2, 2, 2), 2
    model = CCNet(num_classes=classes, layers=layers, recurrence=R, impl="jnp")
    rng = np.random.RandomState(1)
    x = rng.randn(2, 129, 129, 3).astype(np.float32)
    variables = _randomized_variables(model, jnp.asarray(x))

    # ---- transfer weights through the real .pth export path -------------
    pth = str(tmp_path / "ccnet.pth")
    save_pth(variables, pth)
    tm = TorchCCNet(classes, layers, R)
    result = tm.load_state_dict(torch.load(pth, weights_only=False), strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    assert all(k.endswith("num_batches_tracked") for k in result.missing_keys), (
        result.missing_keys)
    tm.eval()

    # ---- eval-mode forward parity (main + aux) ---------------------------
    out = model.apply(variables, jnp.asarray(x), train=False)
    ours_main, ours_aux = np.asarray(out["main"]), np.asarray(out["aux"])

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
    main_t, aux_t = tm(xt)
    theirs_main = main_t.permute(0, 2, 3, 1).detach().numpy()
    theirs_aux = aux_t.permute(0, 2, 3, 1).detach().numpy()
    scale = max(np.abs(theirs_main).max(), 1.0)
    np.testing.assert_allclose(ours_main, theirs_main, atol=2e-4 * scale)
    np.testing.assert_allclose(ours_aux, theirs_aux, atol=2e-4 * scale)

    # ---- input-gradient parity through the whole network ----------------
    g = rng.randn(*ours_main.shape).astype(np.float32)
    ours_gx = np.asarray(jax.grad(
        lambda xin: jnp.vdot(model.apply(variables, xin, train=False)["main"],
                             jnp.asarray(g)))(jnp.asarray(x)))
    main_t.backward(torch.from_numpy(g.transpose(0, 3, 1, 2)))
    theirs_gx = xt.grad.permute(0, 2, 3, 1).numpy()
    gscale = max(np.abs(theirs_gx).max(), 1e-3)
    np.testing.assert_allclose(ours_gx, theirs_gx, atol=3e-4 * gscale)

    # ---- one train-mode step: BN running stats must match torch ----------
    _, mutated = model.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    tm.train()
    with torch.no_grad():
        tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    tsd = {k: v.numpy() for k, v in tm.state_dict().items()}

    checked = []

    def compare(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                compare(v, prefix + (k,))
            else:
                key = flax_path_to_torch_key(prefix + (k,))
                np.testing.assert_allclose(
                    np.asarray(v), tsd[key], atol=1e-4,
                    err_msg=f"running stat mismatch at {key}")
                checked.append(key)

    compare(mutated["batch_stats"], ())
    assert len(checked) > 50  # every BN in stem+layers+heads was compared
