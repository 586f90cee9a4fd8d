"""Remat at scale: demonstrate a config that does NOT fit without remat
(VERDICT r3 #9).

The backbone's remat policies (``models/backbone.py::DilatedResNet.remat``)
were designed as the TPU recipe for fitting large-activation training on a
16 GB v5e chip; round 3 documented them and proved gradient-exactness
(``tests/test_models.py::test_remat_modes_match_no_remat_gradients``) but
never showed a config where remat is the difference between OOM and
running. This script trains the flagship model (R101 R=2 CCNet, OHEM,
bf16) at double the reference batch (16 x 769^2 -- the reference's 4-GPU
global batch of 8 was bounded by 12 GB TITAN-XPs, reference README.md:97)
with remat=False (expect RESOURCE_EXHAUSTED) and with each remat mode that
fits, reporting crops/s. Results recorded in PARITY.md.

Run on the real chip: python scripts/remat_scale.py [--batch 16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def try_mode(remat, batch, hw, steps=6):
    import jax
    import jax.numpy as jnp

    from ccnet_tpu.losses import build_criterion
    from ccnet_tpu.models import build_model
    from ccnet_tpu.train import create_train_state, make_optimizer, make_train_step

    model = build_model("ccnet", num_classes=19, recurrence=2, depth=101,
                        dtype=jnp.bfloat16, impl="auto", remat=remat)
    tx = make_optimizer(base_lr=1e-2, max_steps=60000, weight_decay=1e-4)
    criterion = build_criterion(ohem=True, thresh=0.7, min_kept=100000)
    state = create_train_state(model, tx, input_shape=(1, *hw, 3))
    step = make_train_step(model, criterion, tx)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, *hw, 3).astype(np.float32) * 30.0)
    labels = jnp.asarray(rng.randint(0, 19, size=(batch, *hw)).astype(np.int32))
    key = jax.random.PRNGKey(0)
    try:
        for _ in range(2):  # compile + warm
            state, metrics = step(state, images, labels, key)
        _ = float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step(state, images, labels, key)
        _ = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / steps
        return {"ok": True, "s_per_step": round(dt, 4),
                "crops_per_s": round(batch / dt, 2)}
    except Exception as e:  # noqa: BLE001 - OOM is the expected outcome for False
        msg = str(e)
        oom = "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg.lower() \
            or "exceeds the limit" in msg or "hbm" in msg.lower()
        return {"ok": False, "oom": oom, "err": msg.splitlines()[0][:200]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--hw", type=int, nargs=2, default=(769, 769))
    p.add_argument("--modes", type=str, nargs="*",
                   default=["False", "True", "conv12", "convs"])
    args = p.parse_args()

    hw = tuple(args.hw)
    for mode_s in args.modes:
        mode = {"False": False, "True": True}.get(mode_s, mode_s)
        # fresh process per mode would be cleaner for HBM fragmentation, but
        # the allocator frees between jits; run heaviest-last ordering instead
        print(f"-- remat={mode_s} batch={args.batch} hw={hw}", flush=True)
        r = try_mode(mode, args.batch, hw)
        print(f"   {r}", flush=True)


if __name__ == "__main__":
    main()
