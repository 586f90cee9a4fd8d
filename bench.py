"""Benchmark: CCNet-R101 (R=2) train + sliding-eval throughput, per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "crops/sec/chip", "vs_baseline": N, "extra": {...}}

The primary metric is training throughput on 769×769 crops (the reference's
headline recipe). BASELINE.md's north star covers "train and sliding-eval
crops/sec", so ``extra`` also records sliding-window eval throughput
(1024×2048 Cityscapes-shaped input, 769² tiles, overlap 1/3 → 8 tiles/image,
the whole per-image pipeline in ONE jit).

Baselines (reference, 4× TITAN XP, reference README.md:97):
  train: 60k iters × batch 8 ≈ 2.5 days / 4 GPUs ≈ 0.55 crops/sec/GPU.
  eval:  per-tile host loop, fwd ≈ train_step/3 ≈ 1.65 tiles/sec/GPU.

The axon platform's block_until_ready is unreliable (see
.claude/skills/verify/SKILL.md) — timing forces a host read of a scalar
that depends on the whole computation chain.
"""

import json
import time

import numpy as np

TITAN_XP_TRAIN_CROPS_PER_SEC_PER_CHIP = 0.55
TITAN_XP_EVAL_TILES_PER_SEC_PER_CHIP = 1.65


def bench_train(jax, jnp, steps=10, batch=8, shape=(769, 769)):
    from ccnet_tpu.losses import build_criterion
    from ccnet_tpu.models import build_model
    from ccnet_tpu.train import create_train_state, make_optimizer, make_train_step

    model = build_model(
        "ccnet", num_classes=19, recurrence=2, depth=101,
        # bs-8 769² fits the 16 GB chip without remat, ~6% faster than
        # remat'ing layers 3-4 (scripts/profile_step.py)
        dtype=jnp.bfloat16, impl="auto", remat=False,
    )
    tx = make_optimizer(base_lr=1e-2, max_steps=60000, weight_decay=1e-4)
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
    return (
        batch * steps / (t1 - t0),
        (t1 - t0) / steps,
        loss,
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
    )


def bench_eval(jax, jnp, model, variables, n_imgs=4, image_hw=(1024, 2048), tile=(769, 769)):
    """Sliding-window eval: whole per-image pipeline (tile batch through one
    forward, align-corners upsample, overlap-averaged stitch) in ONE jit."""
    from functools import partial

    from ccnet_tpu.evaluation.sliding import compute_tiles, predict_sliding

    n_tiles = len(compute_tiles(image_hw, tile))

    @partial(jax.jit, static_argnums=())
    def eval_img(variables, img):
        logits = predict_sliding(
            lambda x: model.apply(variables, x, train=False)["main"],
            img, tile, 19, tiles_per_call=n_tiles,
        )
        return jnp.argmax(logits, axis=-1)

    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(1, *image_hw, 3).astype(np.float32) * 30.0)

    pred = eval_img(variables, img)  # compile + warmup
    _ = int(pred[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(n_imgs):
        pred = eval_img(variables, img)
    _ = int(pred[0, 0, 0])  # forces the chain (same input -> same program; axon
    # has no cross-call caching of results, each call executes)
    t1 = time.perf_counter()
    s_per_img = (t1 - t0) / n_imgs
    return s_per_img, n_tiles / s_per_img, n_tiles


def main():
    import jax
    import jax.numpy as jnp

    train_cps, step_s, loss, model, variables = bench_train(jax, jnp)
    eval_s_img, eval_tps, n_tiles = bench_eval(jax, jnp, model, variables)

    result = {
        "metric": "ccnet_r101_R2_train_769_crops_per_sec_per_chip",
        "value": round(train_cps, 3),
        "unit": "crops/sec/chip",
        "vs_baseline": round(train_cps / TITAN_XP_TRAIN_CROPS_PER_SEC_PER_CHIP, 2),
        "extra": {
            "batch": 8,
            "loss": round(loss, 4),
            "backend": jax.default_backend(),
            "step_time_s": round(step_s, 4),
            "baseline_titan_xp_train_crops_per_sec_per_chip": TITAN_XP_TRAIN_CROPS_PER_SEC_PER_CHIP,
            "eval_sliding_1024x2048_s_per_img": round(eval_s_img, 4),
            "eval_sliding_tiles_per_sec_per_chip": round(eval_tps, 2),
            "eval_tiles_per_img": n_tiles,
            "eval_vs_baseline": round(eval_tps / TITAN_XP_EVAL_TILES_PER_SEC_PER_CHIP, 2),
            "baseline_titan_xp_eval_tiles_per_sec_per_chip": TITAN_XP_EVAL_TILES_PER_SEC_PER_CHIP,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
