"""RCCA module forward+backward numerics vs an independent torch oracle
(BASELINE config 2). The torch model below is written directly from the
behavioural spec (1×1 q/k/v projections, joint row+column softmax with the
column-path self slot masked, gamma-gated residual; conva→CCA×R→convb→
bottleneck with BN+leakyReLU(0.01)) — weights are converted from our flax
init, outputs and input-gradients must agree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccnet_tpu.models.ccnet import RCCAModule

torch = pytest.importorskip("torch")
F = torch.nn.functional


class TorchCCA(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.q = torch.nn.Conv2d(c, c // 8, 1)
        self.k = torch.nn.Conv2d(c, c // 8, 1)
        self.v = torch.nn.Conv2d(c, c, 1)
        self.gamma = torch.nn.Parameter(torch.zeros(1))

    def forward(self, x):  # x (B, C, H, W)
        B, C, H, W = x.shape
        q, k, v = self.q(x), self.k(x), self.v(x)
        # column path: e[b,h,w,h'] = q[b,:,h,w]·k[b,:,h',w]
        e_col = torch.einsum("bchw,bckw->bhwk", q, k)
        eye = torch.eye(H, dtype=torch.bool)[:, None, :]
        e_col = e_col.masked_fill(eye[None], float("-1e9"))
        e_row = torch.einsum("bchw,bchv->bhwv", q, k)
        att = torch.softmax(torch.cat([e_col, e_row], dim=3), dim=3)
        a_col, a_row = att[..., :H], att[..., H:]
        out_col = torch.einsum("bhwk,bckw->bchw", a_col, v)
        out_row = torch.einsum("bhwv,bchv->bchw", a_row, v)
        return self.gamma * (out_col + out_row) + x


class TorchRCCA(torch.nn.Module):
    def __init__(self, cin, cout, classes, R):
        super().__init__()
        inter = cin // 4
        self.R = R
        self.conva = torch.nn.Conv2d(cin, inter, 3, padding=1, bias=False)
        self.bna = torch.nn.BatchNorm2d(inter)
        self.cca = TorchCCA(inter)
        self.convb = torch.nn.Conv2d(inter, inter, 3, padding=1, bias=False)
        self.bnb = torch.nn.BatchNorm2d(inter)
        self.convc = torch.nn.Conv2d(cin + inter, cout, 3, padding=1, bias=False)
        self.bnc = torch.nn.BatchNorm2d(cout)
        self.cls = torch.nn.Conv2d(cout, classes, 1)

    def forward(self, x):
        lrelu = lambda t: F.leaky_relu(t, 0.01)
        out = lrelu(self.bna(self.conva(x)))
        for _ in range(self.R):
            out = self.cca(out)
        out = lrelu(self.bnb(self.convb(out)))
        out = lrelu(self.bnc(self.convc(torch.cat([x, out], 1))))
        return self.cls(out)


def _copy_conv(mod, tree):
    mod.weight.data = torch.from_numpy(np.asarray(tree["weight"]).transpose(3, 2, 0, 1).copy())
    if "bias" in tree:
        mod.bias.data = torch.from_numpy(np.asarray(tree["bias"]).copy())


def _copy_bn(mod, ptree, stree):
    mod.weight.data = torch.from_numpy(np.asarray(ptree["weight"]).copy())
    mod.bias.data = torch.from_numpy(np.asarray(ptree["bias"]).copy())
    mod.running_mean.data = torch.from_numpy(np.asarray(stree["running_mean"]).copy())
    mod.running_var.data = torch.from_numpy(np.asarray(stree["running_var"]).copy())


@pytest.mark.parametrize("R", [1, 2])
@pytest.mark.slow
def test_rcca_forward_backward_matches_torch(R):
    rng = np.random.RandomState(0)
    cin, cout, classes = 32, 16, 5
    H, W = 9, 11
    module = RCCAModule(num_classes=classes, in_channels=cin, out_channels=cout,
                        recurrence=R, impl="jnp")
    x = rng.randn(2, H, W, cin).astype(np.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    # non-trivial params & stats
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32) * 0.2)
        if a.ndim >= 1 else a, variables)
    bs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32) + 0.5),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    def f(xin):
        return module.apply(variables, xin, train=False)

    ours = np.asarray(f(jnp.asarray(x)))
    g = rng.randn(*ours.shape).astype(np.float32)
    ours_gx = np.asarray(
        jax.grad(lambda xin: jnp.vdot(f(xin), jnp.asarray(g)))(jnp.asarray(x))
    )

    p, s = variables["params"], variables["batch_stats"]
    tm = TorchRCCA(cin, cout, classes, R).eval()
    _copy_conv(tm.conva, p["conva_conv"]); _copy_bn(tm.bna, p["conva_bn"], s["conva_bn"])
    _copy_conv(tm.cca.q, p["cca"]["query_conv"])
    _copy_conv(tm.cca.k, p["cca"]["key_conv"])
    _copy_conv(tm.cca.v, p["cca"]["value_conv"])
    tm.cca.gamma.data = torch.from_numpy(np.asarray(p["cca"]["gamma"]).copy())
    _copy_conv(tm.convb, p["convb_conv"]); _copy_bn(tm.bnb, p["convb_bn"], s["convb_bn"])
    _copy_conv(tm.convc, p["bottleneck_conv"]); _copy_bn(tm.bnc, p["bottleneck_bn"], s["bottleneck_bn"])
    _copy_conv(tm.cls, p["classifier"])

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
    out_t = tm(xt)
    theirs = out_t.permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-4)

    out_t.backward(torch.from_numpy(g.transpose(0, 3, 1, 2)))
    theirs_gx = xt.grad.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours_gx, theirs_gx, atol=3e-4)
