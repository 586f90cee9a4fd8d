"""Golden training trajectory — absolute numerics pinned (VERDICT r4 #6).

The rest of the suite asserts *relations* (torch parity, loss decrease,
mesh == single-device); nothing pins absolute numbers against silent drift
from a JAX/flax upgrade, a kernel edit, or an optimizer change. This test
does: a fixed-seed 5-step tiny-CCNet + OHEM train on the CPU backend must
reproduce the committed losses to 1e-5, and the `.pth` export must keep the
exact reference-format key set (names + shapes).

The reference's product IS a reproducible 60k-step recipe
(``/root/reference/train.py:199-235``); this is its smallest tripwire. If
this fails after an intentional change to initialisation, optimizer, OHEM,
or BN semantics, re-run the generator block in the docstring below and
update GOLDEN_LOSSES / PTH_KEY_HASH in the same commit, saying why.

Goldens generated with: CPU backend (conftest), jax 0.x pinned in this
image, the exact build below — bit-identical across repeat runs (verified
twice at generation time).
"""

import hashlib
import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccnet_tpu.losses import build_criterion
from ccnet_tpu.models import CCNet
from ccnet_tpu.train import create_train_state, make_optimizer, make_train_step

GOLDEN_LOSSES = [
    2.8325693607330322,
    2.7749667167663574,
    2.731776714324951,
    2.7042956352233887,
    2.6893625259399414,
]
PTH_N_KEYS = 127
PTH_KEY_HASH = "26786cca058e4ca3d60a6aa4d1eb8e45"


def _build():
    model = CCNet(num_classes=7, layers=(1, 1, 1, 1), recurrence=2, impl="jnp")
    tx = make_optimizer(base_lr=1e-2, max_steps=50, weight_decay=5e-4)
    criterion = build_criterion(ohem=True, min_kept=500)
    state = create_train_state(model, tx, input_shape=(1, 65, 65, 3),
                               rng=jax.random.PRNGKey(0))
    rng = np.random.RandomState(1234)
    images = jnp.asarray(rng.randn(2, 65, 65, 3).astype(np.float32) * 30.0)
    labels_np = rng.randint(0, 7, size=(2, 65, 65)).astype(np.int32)
    labels_np[rng.rand(2, 65, 65) < 0.1] = 255
    labels = jnp.asarray(labels_np)
    return model, criterion, tx, state, images, labels


@pytest.mark.slow
def test_golden_training_trajectory():
    assert jax.default_backend() == "cpu"  # goldens are CPU-backend numbers
    model, criterion, tx, state, images, labels = _build()
    step = make_train_step(model, criterion, tx)
    key = jax.random.PRNGKey(7)
    losses = []
    for _ in range(5):
        state, metrics = step(state, images, labels, key)
        losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(losses, GOLDEN_LOSSES, rtol=1e-5, atol=1e-5)

    # the exported checkpoint keeps the exact reference-format key set:
    # any rename/reshape breaks .pth interchange with the reference ecosystem
    torch = pytest.importorskip("torch")
    from ccnet_tpu.utils import save_pth

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g.pth")
        save_pth(variables, p)
        sd = torch.load(p, map_location="cpu")
    keys = sorted(f"{k}:{tuple(v.shape)}" for k, v in sd.items())
    assert len(keys) == PTH_N_KEYS
    assert hashlib.md5("\n".join(keys).encode()).hexdigest() == PTH_KEY_HASH
