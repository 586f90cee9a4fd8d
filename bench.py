"""Benchmark: CCNet-R101 (R=2) training throughput on 769×769 crops, per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "crops/sec/chip", "vs_baseline": N}

Baseline: the reference trains 60k iters × batch 8 on 4× TITAN XP
(reference README.md:97); community-reported wall time ≈ 2.5 days, i.e.
≈ 0.55 crops/sec per GPU. We use 0.55 crops/sec/chip as the TITAN XP
baseline; the north star (BASELINE.md) is ≥ 3× that per TPU chip.

The axon platform's block_until_ready is unreliable (see
.claude/skills/verify/SKILL.md) — timing forces a host read of a scalar
that depends on the whole step chain.
"""

import json
import time

import numpy as np

TITAN_XP_CROPS_PER_SEC_PER_CHIP = 0.55


def main():
    import jax
    import jax.numpy as jnp

    from ccnet_tpu.losses import build_criterion
    from ccnet_tpu.models import build_model
    from ccnet_tpu.train import create_train_state, make_optimizer, make_train_step

    on_tpu = jax.default_backend() != "cpu"
    batch = 8
    shape = (769, 769)
    steps = 10

    model = build_model(
        "ccnet", num_classes=19, recurrence=2, depth=101,
        dtype=jnp.bfloat16, impl="auto", remat=True,
    )
    tx = make_optimizer(base_lr=1e-2, max_steps=60000, weight_decay=5e-4)
    criterion = build_criterion(ohem=True, thresh=0.7, min_kept=100000)
    state = create_train_state(model, tx, input_shape=(1, *shape, 3))
    step = make_train_step(model, criterion, tx)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, *shape, 3).astype(np.float32) * 30.0)
    labels = jnp.asarray(rng.randint(0, 19, size=(batch, *shape)).astype(np.int32))
    key = jax.random.PRNGKey(0)

    # warmup (compile + 2 steps)
    for _ in range(2):
        state, metrics = step(state, images, labels, key)
    _ = float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, images, labels, key)
    loss = float(metrics["loss"])  # chained through state -> forces all steps
    t1 = time.perf_counter()

    crops_per_sec = batch * steps / (t1 - t0)
    result = {
        "metric": "ccnet_r101_R2_train_769_crops_per_sec_per_chip",
        "value": round(crops_per_sec, 3),
        "unit": "crops/sec/chip",
        "vs_baseline": round(crops_per_sec / TITAN_XP_CROPS_PER_SEC_PER_CHIP, 2),
        "extra": {
            "batch": batch,
            "steps": steps,
            "loss": round(loss, 4),
            "backend": jax.default_backend(),
            "step_time_s": round((t1 - t0) / steps, 4),
            "baseline_titan_xp_crops_per_sec_per_chip": TITAN_XP_CROPS_PER_SEC_PER_CHIP,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
