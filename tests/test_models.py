"""Model assembly tests: geometry, shapes, init identities, all three heads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccnet_tpu.models import CCNet, DeepLabV3, PSPNet, CrissCrossAttention, build_model


def tiny(model_cls, **kw):
    return model_cls(num_classes=7, layers=(1, 1, 1, 1), **kw)


@pytest.mark.parametrize("cls", [CCNet, PSPNet, DeepLabV3])
def test_forward_shapes_os8(cls):
    model = tiny(cls)
    x = jnp.zeros((2, 65, 65, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    # 65 -> stem s2 -> 33 -> pool -> 17 -> layer2 s2 -> 9 (output stride 8)
    assert out["main"].shape == (2, 9, 9, 7)
    assert out["aux"].shape == (2, 9, 9, 7)


def test_cca_module_identity_at_init():
    """gamma is zero-initialised → the CCA module is an identity at init."""
    m = CrissCrossAttention(features=16, impl="jnp")
    x = jnp.asarray(np.random.RandomState(0).randn(1, 5, 6, 16).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(1), x)
    assert float(variables["params"]["gamma"][0]) == 0.0
    out = m.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=0)


def test_recurrence_shares_weights():
    """R=1 and R=2 models must have identical parameter trees (shared CCA)."""
    x = jnp.zeros((1, 65, 65, 3), jnp.float32)
    v1 = CCNet(num_classes=7, layers=(1, 1, 1, 1), recurrence=1, impl="jnp").init(
        jax.random.PRNGKey(0), x, train=False
    )
    v2 = CCNet(num_classes=7, layers=(1, 1, 1, 1), recurrence=2, impl="jnp").init(
        jax.random.PRNGKey(0), x, train=False
    )
    t1 = jax.tree_util.tree_structure(v1)
    t2 = jax.tree_util.tree_structure(v2)
    assert t1 == t2
    for a, b in zip(jax.tree_util.tree_leaves(v1), jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_mode_updates_batch_stats_and_needs_dropout_rng():
    model = tiny(CCNet, impl="jnp")
    x = jnp.asarray(np.random.RandomState(0).randn(2, 65, 65, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    # running stats moved away from init
    rm = mutated["batch_stats"]["backbone"]["bn1"]["running_mean"]
    assert float(jnp.abs(rm).max()) > 0


def test_registry_resnet101_param_count():
    """CCNet-R101 must have the reference's parameter count scale (~71M)."""
    model = build_model("ccnet", num_classes=19, recurrence=2, depth=101, impl="jnp")
    x = jnp.zeros((1, 97, 97, 3), jnp.float32)  # tiny spatial, full depth
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(variables["params"]))
    assert 68e6 < n_params < 74e6, n_params


@pytest.mark.parametrize("mode", [True, "conv12", "convs"])
@pytest.mark.slow
def test_remat_modes_match_no_remat_gradients(mode):
    """Every remat mode is a pure scheduling choice: loss AND gradients must
    be bit-comparable to the no-remat forward/backward."""
    from ccnet_tpu.losses import softmax_cross_entropy_ignore

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 33, 33, 3).astype(np.float32))
    # CE directly on the OS-8 logits (33 -> 5): the upsampling criterion is
    # orthogonal to what this test pins down (remat == pure scheduling)
    y = jnp.asarray(rng.randint(0, 7, size=(1, 5, 5)).astype(np.int32))

    def loss_for(model, params, batch_stats):
        def f(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
            )
            return softmax_cross_entropy_ignore(out["main"], y)
        return jax.value_and_grad(f)(params)

    base = tiny(CCNet, impl="jnp", remat=False)
    variables = base.init(jax.random.PRNGKey(0), x, train=False)
    want_loss, want_grad = loss_for(base, variables["params"], variables["batch_stats"])

    model = tiny(CCNet, impl="jnp", remat=mode)
    got_loss, got_grad = loss_for(model, variables["params"], variables["batch_stats"])
    assert abs(float(got_loss) - float(want_loss)) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(want_grad), jax.tree_util.tree_leaves(got_grad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_choose_cca_impl_crossover(monkeypatch):
    """'auto' routes by IN-GRAPH full-program measurements (see
    `_CCA_PALLAS_MIN_AXIS_SUM`): jnp at every product shape — the 97² crop,
    97² eval tiles, 128×256 whole-image — where XLA's fusion beats the
    standalone-faster kernel; the kernel at long-context shapes where its
    margin is structural (and the jnp path OOMs). Batch-independent."""
    import ccnet_tpu.utils.platform as platform_mod
    from ccnet_tpu.models.ccnet import choose_cca_impl

    monkeypatch.setattr(platform_mod, "is_tpu_backend", lambda: False)
    assert choose_cca_impl(1, 769, 769) == "jnp"  # off-TPU: always jnp

    monkeypatch.setattr(platform_mod, "is_tpu_backend", lambda: True)
    assert choose_cca_impl(8, 97, 97) == "jnp"        # train crop / eval tile
    assert choose_cca_impl(1, 65, 65) == "jnp"        # below the measured zone
    assert choose_cca_impl(1, 129, 257) == "jnp"      # whole-image eval
    assert choose_cca_impl(8, 129, 257) == "jnp"      # batch-independent
    assert choose_cca_impl(1, 257, 257) == "pallas"   # past the crossover
    assert choose_cca_impl(1, 513, 513) == "pallas"   # long-context
    assert choose_cca_impl(1, 769, 769) == "pallas"
