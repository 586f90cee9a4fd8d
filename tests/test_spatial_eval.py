"""Spatial (`space`-axis) sharding as a product surface (VERDICT r4 #4).

Whole-image multi-chip inference — the one use case the mesh's `space` axis
exists for (1024×2048 Cityscapes images whose height divides evenly) — must
be reachable from the CLI (`--whole --space N`), produce the single-device
result, and have a STATED comm pattern, asserted on the compiled HLO:

* backbone convs partitioned with halo exchange → `collective-permute`s;
* the jnp CCA's row/column softmax spans the sharded H axis → XLA inserts
  the gather itself (a handful of `all-gather`s), instead of the Pallas
  kernel's batch-only `custom_partitioning` rule forcing a gather per shard
  per call (`cc_attention_pallas.py` `_CCA_REPL`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccnet_tpu.evaluation.sliding import predict_multiscale
from ccnet_tpu.models import CCNet
from ccnet_tpu.parallel import make_mesh


@pytest.mark.slow
def test_whole_image_spatial_sharding_matches_single_device_with_halo_hlo():
    model = CCNet(num_classes=7, layers=(1, 1, 1, 1), recurrence=2, impl="jnp")
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 96, 3)),
                           train=False)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))

    want = np.asarray(predict_multiscale(
        lambda t: model.apply(variables, t, train=False)["main"],
        x, (33, 33), 7, whole=True))

    mesh = make_mesh(space=2)  # 4×2 (data × space)
    fn = jax.jit(lambda v, im: predict_multiscale(
        lambda t: model.apply(v, t, train=False)["main"],
        im, (33, 33), 7, whole=True, mesh=mesh))
    compiled = fn.lower(variables, x).compile()
    hlo = compiled.as_text()
    # the stated comm pattern happened: spatially PARTITIONED convs (halo
    # exchange), not a replicated computation behind a gathered input
    assert "collective-permute" in hlo
    # the CCA attention gather exists but is bounded: a few all-gathers for
    # the H-spanning softmax (measured 6 at R=2), not one per conv
    assert 0 < hlo.count("all-gather-start") + hlo.count("all-gather(") <= 16, (
        hlo.count("all-gather"))
    # and the route is the jnp CCA: the program contains NO custom-calls at
    # all (measured 0 on this CPU mesh — on a TPU mesh a surviving Pallas
    # kernel would lower to one). On CPU the partitioned kernel substitutes
    # jnp bodies per shard, so the binding guard against the kernel's
    # batch-only partitioning rule sneaking back onto this route is the
    # all-gather bound above, not this line.
    assert "custom-call" not in hlo.lower()

    got = np.asarray(fn(variables, x))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_whole_image_data_parallel_matches_single_device():
    """--whole --data-parallel (no --space): the IMAGE batch shards over the
    mesh's data axis — whole-image eval scales by images across chips."""
    model = CCNet(num_classes=7, layers=(1, 1, 1, 1), recurrence=1, impl="jnp")
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 96, 3)),
                           train=False)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 64, 96, 3).astype(np.float32))

    want = np.asarray(predict_multiscale(
        lambda t: model.apply(variables, t, train=False)["main"],
        x, (33, 33), 7, whole=True))

    mesh = make_mesh(jax.devices()[:4])  # 4×1 (data × space)
    fn = jax.jit(lambda v, im: predict_multiscale(
        lambda t: model.apply(v, t, train=False)["main"],
        im, (33, 33), 7, whole=True, mesh=mesh))
    got = np.asarray(fn(variables, x))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # the val loop's FINAL PARTIAL batch (drop_last=False): a batch smaller
    # than — or not dividing — the mesh's data axis still evaluates
    # correctly (GSPMD pads the uneven shard internally and the padding
    # never reaches the output)
    for b in (2, 3):
        xb = x[:b]
        want_b = np.asarray(predict_multiscale(
            lambda t: model.apply(variables, t, train=False)["main"],
            xb, (33, 33), 7, whole=True))
        got_b = np.asarray(fn(variables, xb))
        np.testing.assert_allclose(got_b, want_b, atol=1e-5)


@pytest.mark.slow
def test_evaluate_cli_whole_space(tmp_path):
    """`--whole --space 2` from the CLI equals the `--space 1` run —
    whole-image multi-chip eval is a product surface, not a demo."""
    from ccnet_tpu.cli.evaluate import main

    base = [
        "--synthetic", "--synthetic-size", "64,96", "--input-size", "33,33",
        "--model", "ccnet", "--depth", "50", "--recurrence", "1",
        "--fp32", "1", "--batch-size", "1", "--whole", "1",
        "--save-preds", "0",
    ]
    with pytest.raises(SystemExit):  # --space without --whole is an error
        main(["--synthetic", "--space", "2", "--whole", "0"])

    r1 = main(base + ["--output-dir", str(tmp_path / "o1"), "--space", "1"])
    r2 = main(base + ["--output-dir", str(tmp_path / "o2"), "--space", "2"])
    assert 0 <= r2["meanIU"] <= 1
    np.testing.assert_array_equal(np.asarray(r2["confusion"]),
                                  np.asarray(r1["confusion"]))
