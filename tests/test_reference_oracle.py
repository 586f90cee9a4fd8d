"""Lockstep numerics against the ACTUAL reference source as the oracle.

Every other parity test in this suite checks against torch replicas written
from the reference's behavioural spec — a transcription error in the spec
would be invisible there. This file closes that loop: it imports the
reference's own modules from ``/root/reference`` (untrusted public content —
executed as a numerics oracle only) and asserts our implementations against
them on random inputs:

* ``cc_attention/functions.py:15-49``  — CrissCrossAttention module
* ``loss/loss.py:9-93``                — OhemCrossEntropy2d selection + CE
* ``loss/criterion.py:11,37,59``       — CriterionDSN / OhemDSN / OhemDSN2
* ``loss/lovasz_losses.py``            — lovasz_softmax / hinge / binary_xloss / iou
* ``networks/ccnet.py:125-200``        — the full ResNet+RCCA ``Seg_Model``,
  loaded from OUR ``save_pth`` export with ``strict=True`` through a ~25-line
  pure-torch InPlaceABN shim (BN + leaky-ReLU 0.01, Mapillary state-dict
  surface: weight/bias/running_mean/running_var, no num_batches_tracked).

The reference code calls ``.cuda()`` unconditionally (``functions.py:12``,
``loss.py:76``); a fixture patches ``torch.Tensor.cuda`` to identity for the
duration of this module so the oracle runs on CPU.
"""

import importlib
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
F = torch.nn.functional

REF = "/root/reference"

_REF_TOP_LEVEL = ("cc_attention", "loss", "networks", "utils", "inplace_abn",
                  "evaluate", "engine", "dataset", "apex", "torchvision")


def _make_inplace_abn_shim():
    """Pure-torch behavioural shim of Mapillary InPlace-ABN.

    Same state-dict surface as the CUDA original (weight / bias /
    running_mean / running_var on the module itself, no num_batches_tracked)
    and the same eval/train math: standard batch norm followed by the
    constructor's activation (default leaky_relu, slope 0.01).
    """
    nn = torch.nn

    class InPlaceABN(nn.Module):
        def __init__(self, num_features, eps=1e-5, momentum=0.1, affine=True,
                     activation="leaky_relu", activation_param=0.01, **_):
            super().__init__()
            self.eps, self.momentum, self.affine = eps, momentum, affine
            self.activation, self.activation_param = activation, activation_param
            if affine:
                self.weight = nn.Parameter(torch.ones(num_features))
                self.bias = nn.Parameter(torch.zeros(num_features))
            else:
                self.register_parameter("weight", None)
                self.register_parameter("bias", None)
            self.register_buffer("running_mean", torch.zeros(num_features))
            self.register_buffer("running_var", torch.ones(num_features))

        def forward(self, x):
            y = F.batch_norm(x, self.running_mean, self.running_var,
                             self.weight, self.bias, self.training,
                             self.momentum, self.eps)
            if self.activation == "leaky_relu":
                return F.leaky_relu(y, self.activation_param)
            if self.activation in ("identity", "none"):
                return y
            raise ValueError(self.activation)

    mod = types.ModuleType("inplace_abn")
    mod.InPlaceABN = InPlaceABN
    mod.InPlaceABNSync = InPlaceABN
    return mod


@pytest.fixture(scope="module")
def ref():
    """Import the reference packages with .cuda patched out; clean up after."""
    saved_modules = {n: sys.modules.get(n) for n in list(sys.modules)
                     if n.split(".")[0] in _REF_TOP_LEVEL}
    for n in saved_modules:
        del sys.modules[n]

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.modules["inplace_abn"] = _make_inplace_abn_shim()
    # evaluate.py pulls in engine.py (hard-requires apex) and torchvision
    # (not installed here); neither is touched by the module-level eval
    # functions we oracle against — empty shims satisfy the imports
    apex = types.ModuleType("apex")
    apex.parallel = types.ModuleType("apex.parallel")
    apex.parallel.DistributedDataParallel = object
    apex.parallel.SyncBatchNorm = object
    sys.modules["apex"], sys.modules["apex.parallel"] = apex, apex.parallel
    tv = types.ModuleType("torchvision")
    tv.models = types.ModuleType("torchvision.models")
    sys.modules["torchvision"], sys.modules["torchvision.models"] = tv, tv.models
    sys.path.insert(0, REF)
    try:
        ns = types.SimpleNamespace(
            cca=importlib.import_module("cc_attention.functions"),
            loss=importlib.import_module("loss.loss"),
            criterion=importlib.import_module("loss.criterion"),
            lovasz=importlib.import_module("loss.lovasz_losses"),
            ccnet=importlib.import_module("networks.ccnet"),
            evaluate=importlib.import_module("evaluate"),
        )
        yield ns
    finally:
        torch.Tensor.cuda = orig_cuda
        sys.path.remove(REF)
        for n in list(sys.modules):
            if n.split(".")[0] in _REF_TOP_LEVEL:
                del sys.modules[n]
        sys.modules.update({k: v for k, v in saved_modules.items() if v is not None})


def _t2n(t):
    return t.detach().numpy()


def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


# --------------------------------------------------------------- 2.1 CCA ---


def test_cca_module_vs_reference(ref):
    """Our flax CCA == the reference CrissCrossAttention nn.Module, fwd + grad."""
    from ccnet_tpu.models.ccnet import CrissCrossAttention

    C, B, H, W = 64, 2, 13, 11
    tm = ref.cca.CrissCrossAttention(C)
    tm.gamma.data.fill_(0.7)  # zero-init gamma would reduce the test to x==x
    tm.eval()

    rng = np.random.RandomState(0)
    x = rng.randn(B, H, W, C).astype(np.float32)

    sd = {k: _t2n(v) for k, v in tm.state_dict().items()}
    params = {
        name: {"weight": sd[f"{name}.weight"].transpose(2, 3, 1, 0),
               "bias": sd[f"{name}.bias"]}
        for name in ("query_conv", "key_conv", "value_conv")
    }
    params["gamma"] = sd["gamma"]
    model = CrissCrossAttention(C, impl="jnp")
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))

    xt = _nchw(x).requires_grad_(True)
    theirs_t = tm(xt)
    theirs = _t2n(theirs_t).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)

    g = rng.randn(*ours.shape).astype(np.float32)
    ours_gx = np.asarray(jax.grad(
        lambda xi: jnp.vdot(model.apply({"params": params}, xi), jnp.asarray(g))
    )(jnp.asarray(x)))
    theirs_t.backward(_nchw(g))
    theirs_gx = xt.grad.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours_gx, theirs_gx, atol=2e-5)


# -------------------------------------------------------------- 2.6 OHEM ---


def _rand_seg(rng, B, H, W, C, ignore_frac=0.2, logit_scale=1.0):
    logits = (rng.randn(B, H, W, C) * logit_scale).astype(np.float32)
    labels = rng.randint(0, C, size=(B, H, W)).astype(np.int64)
    labels[rng.rand(B, H, W) < ignore_frac] = 255
    return logits, labels


@pytest.mark.parametrize("min_kept", [50, 10_000])
def test_ohem_vs_reference_factor1(ref, min_kept):
    """factor=1 puts the reference's threshold search at full resolution —
    the exact regime our on-device selection implements. min_kept=50
    exercises the k-th-statistic branch; 10_000 > num_valid exercises the
    keep-everything branch (loss/loss.py:36-37)."""
    from ccnet_tpu.losses.ohem import ohem_cross_entropy

    rng = np.random.RandomState(1)
    B, H, W, C = 2, 31, 29, 19
    logits, labels = _rand_seg(rng, B, H, W, C)

    ohem_t = ref.loss.OhemCrossEntropy2d(ignore_label=255, thresh=0.7,
                                         min_kept=min_kept, factor=1)
    lt = _nchw(logits).requires_grad_(True)
    loss_t = ohem_t(lt, torch.from_numpy(labels))
    loss_t.backward()

    def ours_fn(lg):
        return ohem_cross_entropy(lg, jnp.asarray(labels), 255, 0.7, min_kept)

    ours, ours_g = jax.value_and_grad(ours_fn)(jnp.asarray(logits))
    np.testing.assert_allclose(float(ours), float(loss_t.detach()), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(ours_g),
                               lt.grad.permute(0, 2, 3, 1).numpy(), atol=1e-7)


def test_ohem_kth_above_thresh_vs_reference(ref):
    """Exercise the branch where the k-th statistic EXCEEDS thresh
    (loss/loss.py:43-47): logits concentrated on the correct class push most
    correct-class probabilities near 1, so the selection threshold comes from
    the k-th order statistic — the regime our count-bisection implements."""
    from ccnet_tpu.losses.ohem import ohem_cross_entropy

    rng = np.random.RandomState(9)
    B, H, W, C = 2, 31, 29, 19
    labels = rng.randint(0, C, size=(B, H, W)).astype(np.int64)
    labels[rng.rand(B, H, W) < 0.2] = 255
    onehot = np.eye(C, dtype=np.float32)[np.where(labels == 255, 0, labels)]
    logits = (onehot * 8.0 + rng.randn(B, H, W, C) * 0.5).astype(np.float32)

    min_kept = 50
    ohem_t = ref.loss.OhemCrossEntropy2d(ignore_label=255, thresh=0.7,
                                         min_kept=min_kept, factor=1)
    lt = _nchw(logits).requires_grad_(True)
    loss_t = ohem_t(lt, torch.from_numpy(labels))
    loss_t.backward()

    ours, ours_g = jax.value_and_grad(
        lambda lg: ohem_cross_entropy(lg, jnp.asarray(labels), 255, 0.7, min_kept)
    )(jnp.asarray(logits))
    np.testing.assert_allclose(float(ours), float(loss_t.detach()), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(ours_g),
                               lt.grad.permute(0, 2, 3, 1).numpy(), atol=1e-7)


# --------------------------------------------------------- 2.6 criteria ----


def _dsn_pair(rng, B, h, w, C, H, W, logit_scale=1.0):
    main = (rng.randn(B, h, w, C) * logit_scale).astype(np.float32)
    aux = (rng.randn(B, h, w, C) * logit_scale).astype(np.float32)
    labels = rng.randint(0, C, size=(B, H, W)).astype(np.int64)
    labels[rng.rand(B, H, W) < 0.15] = 255
    return main, aux, labels


def test_criterion_dsn_vs_reference(ref):
    from ccnet_tpu.losses.criterion import criterion_dsn

    rng = np.random.RandomState(2)
    main, aux, labels = _dsn_pair(rng, 2, 9, 9, 19, 65, 65)

    mt, at = _nchw(main).requires_grad_(True), _nchw(aux).requires_grad_(True)
    loss_t = ref.criterion.CriterionDSN()([mt, at], torch.from_numpy(labels))
    loss_t.backward()

    def ours_fn(m, a):
        return criterion_dsn({"main": m, "aux": a}, jnp.asarray(labels))

    ours, (gm, ga) = jax.value_and_grad(ours_fn, argnums=(0, 1))(
        jnp.asarray(main), jnp.asarray(aux))
    np.testing.assert_allclose(float(ours), float(loss_t.detach()), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(gm), mt.grad.permute(0, 2, 3, 1).numpy(), atol=2e-7)
    np.testing.assert_allclose(np.asarray(ga), at.grad.permute(0, 2, 3, 1).numpy(), atol=2e-7)


def test_criterion_ohem_dsn_vs_reference(ref):
    """The reference finds its OHEM threshold on a 1/8-zoomed copy
    (loss/loss.py:20-48); with |logits| ≤ 1.5 and 19 classes every
    correct-class probability is < 0.7, so the k-th statistic can never beat
    thresh and BOTH sides resolve threshold = 0.7 exactly — making the
    full-resolution selection directly comparable."""
    from ccnet_tpu.losses.criterion import criterion_ohem_dsn

    rng = np.random.RandomState(3)
    main, aux, labels = _dsn_pair(rng, 2, 9, 9, 19, 65, 65, logit_scale=0.5)
    min_kept = 320  # < num_valid, and 320//64 = 5 > 0 on the zoomed copy

    crit = ref.criterion.CriterionOhemDSN(ignore_index=255, thresh=0.7,
                                          min_kept=min_kept)
    mt, at = _nchw(main).requires_grad_(True), _nchw(aux).requires_grad_(True)
    loss_t = crit([mt, at], torch.from_numpy(labels))
    loss_t.backward()

    def ours_fn(m, a):
        return criterion_ohem_dsn({"main": m, "aux": a}, jnp.asarray(labels),
                                  255, 0.7, min_kept)

    ours, (gm, ga) = jax.value_and_grad(ours_fn, argnums=(0, 1))(
        jnp.asarray(main), jnp.asarray(aux))
    np.testing.assert_allclose(float(ours), float(loss_t.detach()), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(gm), mt.grad.permute(0, 2, 3, 1).numpy(), atol=2e-7)
    np.testing.assert_allclose(np.asarray(ga), at.grad.permute(0, 2, 3, 1).numpy(), atol=2e-7)


def test_criterion_ohem_dsn2_vs_reference(ref):
    from ccnet_tpu.losses.criterion import criterion_ohem_dsn2

    rng = np.random.RandomState(4)
    main, aux, labels = _dsn_pair(rng, 2, 9, 9, 19, 65, 65)

    mt = _nchw(main).requires_grad_(True)
    loss_t = ref.criterion.CriterionOhemDSN2()([mt, _nchw(aux)],
                                               torch.from_numpy(labels))
    loss_t.backward()

    def ours_fn(m):
        return criterion_ohem_dsn2({"main": m, "aux": jnp.asarray(aux)},
                                   jnp.asarray(labels))

    ours, gm = jax.value_and_grad(ours_fn)(jnp.asarray(main))
    np.testing.assert_allclose(float(ours), float(loss_t.detach()), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(gm), mt.grad.permute(0, 2, 3, 1).numpy(),
                               atol=3e-7)


# ---------------------------------------------------------- 2.6 Lovász -----


@pytest.mark.parametrize("per_image", [False, True])
def test_lovasz_softmax_vs_reference(ref, per_image):
    from ccnet_tpu.losses.lovasz import lovasz_softmax

    rng = np.random.RandomState(5)
    B, H, W, C = 2, 17, 13, 7
    logits, labels = _rand_seg(rng, B, H, W, C)
    probas = jax.nn.softmax(jnp.asarray(logits), axis=-1)

    theirs = ref.lovasz.lovasz_softmax(
        torch.softmax(_nchw(logits), dim=1), torch.from_numpy(labels),
        classes="present", per_image=per_image, ignore=255)
    ours = lovasz_softmax(probas, jnp.asarray(labels), 255, per_image=per_image)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


@pytest.mark.parametrize("per_image", [False, True])
def test_lovasz_hinge_vs_reference(ref, per_image):
    from ccnet_tpu.losses.lovasz import lovasz_hinge

    rng = np.random.RandomState(6)
    B, H, W = 3, 11, 9
    logits = rng.randn(B, H, W).astype(np.float32)
    labels = rng.randint(0, 2, size=(B, H, W)).astype(np.int64)
    labels[rng.rand(B, H, W) < 0.2] = 255

    theirs = ref.lovasz.lovasz_hinge(torch.from_numpy(logits),
                                     torch.from_numpy(labels),
                                     per_image=per_image, ignore=255)
    ours = lovasz_hinge(jnp.asarray(logits), jnp.asarray(labels),
                        per_image=per_image, ignore=255)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_binary_xloss_vs_reference(ref):
    from ccnet_tpu.losses.lovasz import binary_xloss

    rng = np.random.RandomState(7)
    logits = rng.randn(2, 9, 9).astype(np.float32) * 3
    labels = rng.randint(0, 2, size=(2, 9, 9)).astype(np.int64)
    labels[rng.rand(2, 9, 9) < 0.2] = 255

    theirs = ref.lovasz.binary_xloss(torch.from_numpy(logits),
                                     torch.from_numpy(labels), ignore=255)
    ours = binary_xloss(jnp.asarray(logits), jnp.asarray(labels), ignore=255)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_iou_metrics_vs_reference(ref):
    from ccnet_tpu.losses.lovasz import iou, iou_binary

    rng = np.random.RandomState(8)
    preds = rng.randint(0, 4, size=(3, 8, 8))
    labels = rng.randint(0, 4, size=(3, 8, 8))
    np.testing.assert_allclose(
        np.asarray(iou(preds, labels, C=4, ignore=3, per_image=True), dtype=np.float64),
        ref.lovasz.iou(torch.from_numpy(preds), torch.from_numpy(labels),
                       C=4, ignore=3, per_image=True), rtol=1e-6)
    bp = rng.randint(0, 2, size=(3, 8, 8))
    bl = rng.randint(0, 2, size=(3, 8, 8))
    np.testing.assert_allclose(
        float(iou_binary(bp, bl, per_image=True)),
        float(ref.lovasz.iou_binary(torch.from_numpy(bp), torch.from_numpy(bl),
                                    per_image=True)), rtol=1e-6)


# ------------------------------------------- 2.2/2.3 full model oracle -----


def _export_into_reference_model(ref, layers, classes, R, seed=0):
    """Build our flax CCNet, export .pth, strict-load into the reference's own
    ResNet/Seg_Model class. Returns (flax_model, variables, torch_model)."""
    from ccnet_tpu.models import CCNet
    from ccnet_tpu.utils.checkpoint import save_pth
    from test_full_ccnet_torch_parity import _randomized_variables

    model = CCNet(num_classes=classes, layers=layers, recurrence=R, impl="jnp",
                  drop_rate=0.0)
    rng = np.random.RandomState(seed)
    x0 = rng.randn(1, 65, 65, 3).astype(np.float32)
    variables = _randomized_variables(model, jnp.asarray(x0), seed=seed)

    import tempfile, os
    fd, pth = tempfile.mkstemp(suffix=".pth")
    os.close(fd)
    try:
        save_pth(variables, pth)
        if list(layers) == [3, 4, 23, 3]:
            tm = ref.ccnet.Seg_Model(num_classes=classes, recurrence=R)
        else:
            tm = ref.ccnet.ResNet(ref.ccnet.Bottleneck, list(layers), classes,
                                  None, R)
        tm.load_state_dict(torch.load(pth, weights_only=False), strict=True)
    finally:
        os.unlink(pth)
    tm.eval()
    return model, variables, tm


def _assert_model_parity(model, variables, tm, x):
    out = model.apply(variables, jnp.asarray(x), train=False)
    main_t, aux_t = tm(_nchw(x))
    theirs_main = _t2n(main_t).transpose(0, 2, 3, 1)
    theirs_aux = _t2n(aux_t).transpose(0, 2, 3, 1)
    scale = max(np.abs(theirs_main).max(), 1.0)
    np.testing.assert_allclose(np.asarray(out["main"]), theirs_main,
                               atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(out["aux"]), theirs_aux,
                               atol=2e-4 * scale)


@pytest.mark.slow
def test_seg_model_small_vs_reference_source(ref):
    """Reference-authored ResNet/RCCA classes as the oracle (layers 2,2,2,2):
    our .pth export strict-loads and eval logits match."""
    rng = np.random.RandomState(11)
    model, variables, tm = _export_into_reference_model(ref, (2, 2, 2, 2), 7, 2)
    x = rng.randn(2, 97, 97, 3).astype(np.float32)
    _assert_model_parity(model, variables, tm, x)


@pytest.mark.slow
def test_seg_model_full_r101_vs_reference_source(ref):
    """The actual `Seg_Model` (ResNet-101, networks/ccnet.py:194-200) as the
    oracle — the complete flagship-architecture key surface and numerics."""
    rng = np.random.RandomState(12)
    model, variables, tm = _export_into_reference_model(
        ref, (3, 4, 23, 3), 19, 2, seed=1)
    x = rng.randn(1, 65, 65, 3).astype(np.float32)
    _assert_model_parity(model, variables, tm, x)


# ------------------------------------- training dynamics, reference side ---


@pytest.mark.slow
def test_training_dynamics_vs_reference_source(ref, tmp_path):
    """Multi-step lockstep training where EVERY torch-side piece is
    reference-AUTHORED source: the reference's own ResNet/RCCA/CCA classes
    (networks/ccnet.py, via the pure-torch InPlaceABN shim), its own
    `CriterionOhemDSN` → `OhemCrossEntropy2d` (loss/criterion.py:37-56,
    loss/loss.py:9-93, configured `factor=1` so its threshold search runs at
    full resolution — the regime our exact on-device selection implements),
    `torch.optim.SGD(momentum, weight_decay)` and the poly LR formula
    (train.py:126-127,182-183,217-222). Unlike
    tests/test_train_dynamics_torch.py (whose oracle is a builder-written
    replica), a transcription error in our understanding of the reference
    CANNOT hide here: initial weights transfer through the real `.pth`
    export, then N optimizer steps (train-mode BN running-stat updates,
    OHEM selection, momentum+wd composition) must track step by step."""
    import importlib  # noqa: F401  (fixture already imported the modules)
    from ccnet_tpu.losses import build_criterion
    from ccnet_tpu.models import CCNet
    from ccnet_tpu.train import create_train_state, make_optimizer, make_train_step
    from ccnet_tpu.utils.checkpoint import save_pth

    CLASSES, LAYERS, R = 5, (1, 1, 1, 1), 2
    HW, BATCH = 33, 2
    BASE_LR, MAX_STEPS, WD, MOMENTUM = 1e-2, 20, 1e-4, 0.9
    THRESH, MIN_KEPT, N_STEPS = 0.7, 800, 5

    model = CCNet(num_classes=CLASSES, layers=LAYERS, recurrence=R,
                  impl="jnp", drop_rate=0.0)
    tx = make_optimizer(base_lr=BASE_LR, max_steps=MAX_STEPS,
                        momentum=MOMENTUM, weight_decay=WD)
    criterion = build_criterion(ohem=True, thresh=THRESH, min_kept=MIN_KEPT)
    state = create_train_state(model, tx, input_shape=(1, HW, HW, 3))
    step_fn = make_train_step(model, criterion, tx)

    # identical init through the real .pth export into the REFERENCE classes
    pth = str(tmp_path / "init.pth")
    save_pth({"params": state.params, "batch_stats": state.batch_stats}, pth)
    tm = ref.ccnet.ResNet(ref.ccnet.Bottleneck, list(LAYERS), CLASSES, None, R)
    tm.load_state_dict(torch.load(pth, weights_only=False), strict=True)
    for m in tm.modules():  # the one RNG-dependent op, disabled both sides
        if isinstance(m, torch.nn.Dropout2d):
            m.p = 0.0
    tm.train()
    crit_t = ref.criterion.CriterionOhemDSN(
        ignore_index=255, thresh=THRESH, min_kept=MIN_KEPT)
    crit_t.criterion1.factor = 1  # full-res threshold search (loss/loss.py:21-24)
    opt = torch.optim.SGD(tm.parameters(), lr=BASE_LR, momentum=MOMENTUM,
                          weight_decay=WD)

    key = jax.random.PRNGKey(0)
    jax_losses, torch_losses = [], []
    for i in range(N_STEPS):
        rng = np.random.RandomState(300 + i)
        x = rng.randn(BATCH, HW, HW, 3).astype(np.float32) * 0.5
        y = rng.randint(0, CLASSES, size=(BATCH, HW, HW)).astype(np.int32)
        y[rng.rand(BATCH, HW, HW) < 0.1] = 255

        state, metrics = step_fn(state, jnp.asarray(x), jnp.asarray(y), key)
        jax_losses.append(float(metrics["loss"]))

        lr = BASE_LR * (1.0 - i / MAX_STEPS) ** 0.9  # train.py:126-127
        for group in opt.param_groups:
            group["lr"] = lr
        main, aux = tm(_nchw(x))
        loss = crit_t([main, aux], torch.from_numpy(y).long())
        opt.zero_grad()
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    # tolerance bands as calibrated in test_train_dynamics_torch.py: step 0
    # is state-free (f32 tight); later steps carry conv-algorithm noise
    # through BN + OHEM keep-boundary pixels (~1.5e-3/pixel flip); real
    # composition bugs diverge >1e-2 within five steps
    assert abs(jax_losses[0] - torch_losses[0]) < 1e-4, (jax_losses[0], torch_losses[0])
    np.testing.assert_allclose(
        jax_losses, torch_losses, rtol=0, atol=2e-3,
        err_msg=f"diverged from reference source: jax={jax_losses} torch={torch_losses}")
    assert abs(jax_losses[-1] - jax_losses[0]) > 1e-3  # it actually trained

    pth2 = str(tmp_path / "final.pth")
    save_pth({"params": state.params, "batch_stats": state.batch_stats}, pth2)
    ours = torch.load(pth2, weights_only=False)
    theirs = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    assert set(ours) == set(theirs)
    for k, v in ours.items():
        a, b = np.asarray(v), theirs[k]
        scale = max(np.abs(b).max(), 1e-2)
        np.testing.assert_allclose(
            a, b, rtol=0, atol=5e-2 * scale,
            err_msg=f"post-training mismatch vs reference source at {k}")
    gamma = np.asarray(ours["head.cca.gamma"])
    assert abs(float(gamma.ravel()[0])) > 1e-6  # gamma moved off zero init


# ------------------------------------------ 2.15 eval pipeline oracle ------
#
# The reference's own evaluate.py functions (predict_sliding / predict_whole
# / predict_multiscale / get_confusion_matrix, /root/reference/evaluate.py:
# 102-195) as imported oracles, driven by the reference Seg_Model class
# loaded strict=True from OUR .pth export — the last numeric surface whose
# oracle was previously builder-written (tests/test_eval.py).

EVAL_C, EVAL_HW, EVAL_TILE = 7, (100, 130), (65, 65)


@pytest.fixture(scope="module")
def eval_oracle(ref):
    """(apply_fn, torch_model, image) — tiny CCNet exported into the
    reference's ResNet class, plus a fixed random NHWC image (asymmetric
    under both flips, so flip-axis bugs cannot cancel)."""
    model, variables, tm = _export_into_reference_model(
        ref, (1, 1, 1, 1), EVAL_C, 2, seed=21)

    def apply_fn(x):
        return model.apply(variables, x, train=False)["main"]

    rng = np.random.RandomState(22)
    img = rng.randn(1, *EVAL_HW, 3).astype(np.float32)
    return apply_fn, tm, img


def _ref_sliding(ref, tm, img_nhwc, tile=EVAL_TILE, classes=EVAL_C):
    with torch.no_grad():
        return ref.evaluate.predict_sliding(
            tm, img_nhwc.transpose(0, 3, 1, 2).copy(), tile, classes, 0)


@pytest.mark.slow
def test_predict_sliding_vs_reference_source(ref, eval_oracle):
    """Our batched one-jit sliding prediction == the reference's own
    predict_sliding (evaluate.py:102-143): same tiling arithmetic, same
    align-corners upsample, same overlap averaging, on the same weights."""
    from ccnet_tpu.evaluation.sliding import predict_sliding

    apply_fn, tm, img = eval_oracle
    theirs = _ref_sliding(ref, tm, img)
    ours = np.asarray(predict_sliding(apply_fn, jnp.asarray(img), EVAL_TILE, EVAL_C))
    scale = max(np.abs(theirs).max(), 1.0)
    np.testing.assert_allclose(ours, theirs, atol=2e-4 * scale)


@pytest.mark.slow
def test_predict_whole_vs_reference_source(ref, eval_oracle):
    from ccnet_tpu.evaluation.sliding import predict_whole

    apply_fn, tm, img = eval_oracle
    with torch.no_grad():
        theirs = ref.evaluate.predict_whole(
            tm, img.transpose(0, 3, 1, 2).copy(), EVAL_TILE, 0)
    ours = np.asarray(predict_whole(apply_fn, jnp.asarray(img), EVAL_C))
    scale = max(np.abs(theirs).max(), 1.0)
    np.testing.assert_allclose(ours, theirs, atol=2e-4 * scale)


@pytest.mark.slow
def test_predict_multiscale_and_miou_vs_reference_source(ref, eval_oracle):
    """The exact path the reference's main() ran (evaluate.py:247:
    scales=[1.0], flip=False) end-to-end: averaged logits match, and
    argmax → masked confusion matrix → per-class IU → meanIU are
    IDENTICAL between our ConfusionAccumulator/iou_from_confusion and the
    reference's get_confusion_matrix + IU formula (evaluate.py:177-195,
    269-274)."""
    from ccnet_tpu.evaluation.metrics import ConfusionAccumulator, iou_from_confusion
    from ccnet_tpu.evaluation.sliding import predict_multiscale

    apply_fn, tm, img = eval_oracle
    with torch.no_grad():
        theirs = ref.evaluate.predict_multiscale(
            tm, torch.from_numpy(img.transpose(0, 3, 1, 2).copy()),
            EVAL_TILE, [1.0], EVAL_C, False, 0)
    ours = np.asarray(predict_multiscale(
        apply_fn, jnp.asarray(img), EVAL_TILE, EVAL_C, scales=(1.0,), flip=False))
    scale = max(np.abs(theirs).max(), 1.0)
    np.testing.assert_allclose(ours, theirs, atol=2e-4 * scale)

    # identical predictions by construction of the logit check above is NOT
    # assumed: both sides argmax their own logits
    pred_ours = np.argmax(ours, axis=3).astype(np.uint8)
    pred_theirs = np.asarray(np.argmax(theirs, axis=3), dtype=np.uint8)
    rng = np.random.RandomState(23)
    gt = rng.randint(0, EVAL_C, size=pred_ours.shape).astype(np.int64)
    gt[rng.rand(*gt.shape) < 0.1] = 255

    # reference main() masks ignore pixels BEFORE the bincount (evaluate.py:
    # 258-262); ours masks inside confusion_matrix
    keep = gt != 255
    cm_ref = ref.evaluate.get_confusion_matrix(gt[keep], pred_theirs[keep], EVAL_C)
    acc = ConfusionAccumulator(EVAL_C, ignore_label=255)
    acc.update(jnp.asarray(gt), jnp.asarray(pred_ours))
    cm_ours = np.asarray(acc.cm)
    np.testing.assert_array_equal(cm_ours, cm_ref.astype(np.int64))

    pos, res, tp = cm_ref.sum(1), cm_ref.sum(0), np.diag(cm_ref)
    iu_ref = tp / np.maximum(1.0, pos + res - tp)  # evaluate.py:273
    iu_ours, miou_ours = iou_from_confusion(cm_ours)
    np.testing.assert_allclose(iu_ours, iu_ref, rtol=1e-12)
    assert (pos > 0).all()  # all classes present -> the two mean
    # conventions (ours: present classes; reference: all classes) coincide
    np.testing.assert_allclose(miou_ours, float(iu_ref.mean()), rtol=1e-12)


@pytest.mark.slow
def test_flip_average_vs_reference_intent(ref, eval_oracle):
    """The reference's flip average is bit-rotted: predict_multiscale flips
    its NHWC output along H — ``flip_scaled_probs[:,::-1,:]``
    (evaluate.py:172) — after evaluating a W-flipped input. We implement the
    evident intent (flip W back, evaluation/sliding.py). Locked here to
    reference-AUTHORED pieces: composing the reference's own predict_sliding
    on the image and its W-flip, un-flipping along W, must equal our
    predict_multiscale(flip=True); the reference's actual flip output is
    shown to be exactly the H-flip composition (divergence documented in
    docs/MIGRATION.md)."""
    from ccnet_tpu.evaluation.sliding import predict_multiscale

    apply_fn, tm, img = eval_oracle
    p = _ref_sliding(ref, tm, img)
    pf = _ref_sliding(ref, tm, img[:, :, ::-1, :].copy())  # W-flipped input
    intent = 0.5 * (p + pf[:, :, ::-1, :])  # flip W back (NHWC axis 2)

    ours = np.asarray(predict_multiscale(
        apply_fn, jnp.asarray(img), EVAL_TILE, EVAL_C, scales=(1.0,), flip=True))
    scale = max(np.abs(intent).max(), 1.0)
    np.testing.assert_allclose(ours, intent, atol=2e-4 * scale)

    with torch.no_grad():
        theirs = ref.evaluate.predict_multiscale(
            tm, torch.from_numpy(img.transpose(0, 3, 1, 2).copy()),
            EVAL_TILE, [1.0], EVAL_C, True, 0)
    bitrot = 0.5 * (p + pf[:, ::-1, :])  # what evaluate.py:172 computes (H flip)
    np.testing.assert_allclose(theirs, bitrot, atol=2e-4 * scale)
    assert np.abs(theirs - ours).max() > 1e-2  # the divergence is real


@pytest.mark.slow
def test_multiscale_scale_neq1_bitrot_and_intent(ref, eval_oracle):
    """scales≠1 in the reference is dead code that CRASHES when reached:
    predict_multiscale accumulates the (N, 0.75H, 0.75W, C) scaled
    probabilities into the full-size canvas (evaluate.py:173) — a broadcast
    ValueError (main() only ever ran scales=[1.0]). Our resize-back is the
    evident intent, locked to reference-authored pieces: the reference's own
    predict_sliding on the reference's own ndimage.zoom of the image,
    resized back with the matching align-corners convention, equals our
    scales=(0.75,) output."""
    from scipy import ndimage

    from ccnet_tpu.evaluation.sliding import predict_multiscale
    from ccnet_tpu.ops.resize import resize_bilinear_align_corners

    apply_fn, tm, img = eval_oracle
    with torch.no_grad(), pytest.raises(ValueError):
        ref.evaluate.predict_multiscale(
            tm, torch.from_numpy(img.transpose(0, 3, 1, 2).copy()),
            EVAL_TILE, [0.75, 1.0], EVAL_C, False, 0)

    # reference's own zoom (evaluate.py:166) == our align-corners resize,
    # up to scipy's boundary artifact: zoom maps output i to input
    # i·(in−1)/(out−1), but when that product rounds a hair ABOVE in−1
    # (here 74·99/74 → 99.0000…01) the out-of-bounds sample reads cval=0 —
    # the last H row of the zoomed image is black garbage, not semantics
    zoomed = ndimage.zoom(img.transpose(0, 3, 1, 2), (1, 1, 0.75, 0.75),
                          order=1, prefilter=False).transpose(0, 2, 3, 1)
    H, W = EVAL_HW
    sh, sw = int(round(H * 0.75)), int(round(W * 0.75))
    ours_zoom = np.asarray(resize_bilinear_align_corners(
        jnp.asarray(img), (sh, sw)))
    assert zoomed.shape == ours_zoom.shape
    # atol 1e-4 on ~N(0,1) pixels: scipy's f32 spline vs our resize differ
    # by f32 rounding (~2e-5); a wrong coordinate map errs at O(0.1-1)
    np.testing.assert_allclose(ours_zoom[:, :-1, :-1], zoomed[:, :-1, :-1],
                               rtol=0, atol=1e-4)

    # lock the predict path on a COMMON scaled image (the zoom artifact
    # row would otherwise propagate through the net near the boundary)
    theirs_scaled = _ref_sliding(ref, tm, ours_zoom)  # (1, sh, sw, C)
    theirs = np.asarray(resize_bilinear_align_corners(
        jnp.asarray(theirs_scaled.transpose(0, 3, 1, 2).astype(np.float32)
                    .reshape(EVAL_C, sh, sw)), (H, W), h_axis=1)
    ).reshape(1, EVAL_C, H, W).transpose(0, 2, 3, 1)
    ours = np.asarray(predict_multiscale(
        apply_fn, jnp.asarray(img), EVAL_TILE, EVAL_C, scales=(0.75,), flip=False))
    scale = max(np.abs(theirs).max(), 1.0)
    np.testing.assert_allclose(ours, theirs, atol=3e-4 * scale)
