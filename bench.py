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
        step,
        state,
    )


def _ensure_corpus(root, n=64, hw=(1024, 2048)):
    """Synthetic Cityscapes-layout PNG corpus for the end-to-end input-path
    leg (decode cost comparable to real street scenes: smooth structure +
    texture, ~1-3 MB/PNG, not incompressible noise)."""
    import os

    import cv2

    img_dir = os.path.join(root, "leftImg8bit", "train", "bench")
    lbl_dir = os.path.join(root, "gtFine", "train", "bench")
    if os.path.isdir(img_dir) and len(os.listdir(img_dir)) >= n:
        return
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    h, w = hw
    yy = np.linspace(0, 4 * np.pi, h)[:, None]
    xx = np.linspace(0, 4 * np.pi, w)[None, :]
    for i in range(n):
        rng = np.random.RandomState(i)
        base = (np.sin(yy + i) * np.cos(xx * (1 + i % 3)) * 60 + 120)
        img = np.stack([base + rng.randn(h, w) * 20 + c * 10 for c in range(3)], -1)
        lab = np.zeros((h, w), np.uint8)
        for _ in range(30):  # random labelId rectangles (0..33)
            y0, x0 = rng.randint(0, h - 64), rng.randint(0, w - 64)
            dy, dx = rng.randint(32, h // 3), rng.randint(32, w // 3)
            lab[y0:y0 + dy, x0:x0 + dx] = rng.randint(0, 34)
        cv2.imwrite(os.path.join(img_dir, f"bench_{i:04d}_leftImg8bit.png"),
                    np.clip(img, 0, 255).astype(np.uint8))
        cv2.imwrite(os.path.join(lbl_dir, f"bench_{i:04d}_gtFine_labelIds.png"), lab)


def bench_train_e2e(jax, jnp, step, state, steps=30, batch=8, shape=(769, 769),
                    corpus="/tmp/ccnet_bench_corpus"):
    """END-TO-END training throughput: real PNG decode (cv2, thread pool) →
    uint8 host→device transfer → on-device augmentation → the SAME compiled
    train step as the resident-batch leg. This is the number with the whole
    input path in the loop (the reference's 8-worker DataLoader,
    reference train.py:112)."""
    from ccnet_tpu.data import CachedDataset, CityscapesDataset, DataLoader
    from ccnet_tpu.data.preprocess import device_augment_batch

    _ensure_corpus(corpus)
    n_batches = steps + 6
    ds = CachedDataset(CityscapesDataset(
        corpus, split="train", max_iters=n_batches * batch, raw_dtype="uint8"))
    loader = DataLoader(ds, batch, shuffle=True, num_workers=8, prefetch=3)
    key = jax.random.PRNGKey(3)

    def run_one(i, images, labels, state):
        imgs, lbls = device_augment_batch(
            jnp.asarray(images), jnp.asarray(labels),
            jax.random.fold_in(key, i), crop_hw=shape,
        )
        return step(state, imgs, lbls, key)

    it = iter(loader)
    for i in range(4):  # warmup: compiles augment, fills decode pipeline
        images, labels, _ = next(it)
        state, metrics = run_one(i, images, labels, state)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    done = 0
    for i, (images, labels, _) in enumerate(it):
        state, metrics = run_one(i + 4, images, labels, state)
        done += 1
        if done >= steps:
            break
    loss = float(metrics["loss"])  # forces the chained device work
    t1 = time.perf_counter()
    assert np.isfinite(loss)
    return batch * done / (t1 - t0)


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


def bench_eval_msflip(jax, jnp, model, variables, n_imgs=2, image_hw=(1024, 2048),
                      tile=(769, 769)):
    """Multi-scale (0.75, 1.0, 1.25) + flip sliding eval — the reference's
    full `predict_multiscale` surface (evaluate.py:155-175) as ONE compiled
    program per input shape."""
    from functools import partial

    from ccnet_tpu.evaluation.sliding import predict_multiscale

    @partial(jax.jit, static_argnums=())
    def eval_img(variables, img):
        logits = predict_multiscale(
            lambda x: model.apply(variables, x, train=False)["main"],
            img, tile, 19, scales=(0.75, 1.0, 1.25), flip=True,
        )
        return jnp.argmax(logits, axis=-1)

    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(1, *image_hw, 3).astype(np.float32) * 30.0)
    pred = eval_img(variables, img)  # compile + warmup
    _ = int(pred[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(n_imgs):
        pred = eval_img(variables, img)
    _ = int(pred[0, 0, 0])
    return (time.perf_counter() - t0) / n_imgs


def bench_cca_kernel(jax, jnp, B=1, H=513, W=513, cq=64, cv=512, iters=5):
    """The fused Pallas CCA kernel at a long-context shape past the measured
    jnp/kernel crossover (scripts/bench_cca.py): fwd+bwd wall time, plus the
    jnp path's at the same shape when it still fits."""
    from ccnet_tpu.ops.cc_attention import criss_cross_attention as cca_jnp
    from ccnet_tpu.ops.cc_attention_pallas import criss_cross_attention_pallas

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, W, cq).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, W, cq).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, W, cv).astype(np.float32)).astype(jnp.bfloat16)
    g = jnp.asarray(rng.randn(B, H, W, cv).astype(np.float32)).astype(jnp.bfloat16)

    out = {}
    for name, impl in (
        ("pallas", lambda q, k, v: criss_cross_attention_pallas(q, k, v, partitioned=False)),
        ("jnp", cca_jnp),
    ):
        # g is an argument, not a closure capture (captured arrays become HLO
        # constants serialized into the size-limited remote-compile request)
        def loss(q, k, v, g, impl=impl):
            return jnp.sum(impl(q, k, v).astype(jnp.float32) * g.astype(jnp.float32))

        fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        try:
            r = fb(q, k, v, g)
            _ = float(r[0].astype(jnp.float32).sum())
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fb(q, k, v, g)
            _ = float(r[0].astype(jnp.float32).sum())
            out[name] = round((time.perf_counter() - t0) / iters * 1e3, 2)
        except Exception:  # noqa: BLE001 - jnp path OOMs at long-context shapes
            out[name] = None
    return out


def main():
    import jax
    import jax.numpy as jnp

    train_cps, step_s, loss, model, variables, step, state = bench_train(jax, jnp)
    e2e_cps = bench_train_e2e(jax, jnp, step, state)
    eval_s_img, eval_tps, n_tiles = bench_eval(jax, jnp, model, variables)
    msflip_s = bench_eval_msflip(jax, jnp, model, variables)
    cca = bench_cca_kernel(jax, jnp)

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
            "train_e2e_crops_per_sec_per_chip": round(e2e_cps, 3),
            "train_e2e_fraction_of_resident": round(e2e_cps / train_cps, 3),
            "eval_msflip_1024x2048_s_per_img": round(msflip_s, 4),
            "cca_fwdbwd_513x513_ms": cca,
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
