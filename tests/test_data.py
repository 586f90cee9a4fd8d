"""Data pipeline tests: device augmentation vs the cv2 recipe, LUTs, loader."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccnet_tpu.data import (
    CITYSCAPES_MEAN_BGR,
    DataLoader,
    SyntheticDataset,
    host_augment,
    trainid_lut,
    trainid_to_labelid,
)
from ccnet_tpu.data.cityscapes import CITYSCAPES_ID_TO_TRAINID
from ccnet_tpu.data.preprocess import device_augment

cv2 = pytest.importorskip("cv2")


def reference_recipe(image, label, f, oy, ox, flip, crop, mean, ignore=255):
    """The reference's exact augmentation chain (datasets.py:173-210) given
    fixed random draws: cv2 scale → mean subtract → pad → crop → mirror."""
    image = cv2.resize(image, None, fx=f, fy=f, interpolation=cv2.INTER_LINEAR)
    label = cv2.resize(label.astype(np.uint8), None, fx=f, fy=f,
                       interpolation=cv2.INTER_NEAREST).astype(np.int32)
    image = image.astype(np.float32) - np.asarray(mean, np.float32)
    h, w = label.shape
    ch, cw = crop
    pad_h, pad_w = max(ch - h, 0), max(cw - w, 0)
    if pad_h or pad_w:
        image = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)))
        label = np.pad(label, ((0, pad_h), (0, pad_w)), constant_values=ignore)
    image = image[oy:oy + ch, ox:ox + cw]
    label = label[oy:oy + ch, ox:ox + cw]
    if flip:
        image, label = image[:, ::-1], label[:, ::-1]
    return image, label


@pytest.mark.parametrize("f,crop", [(1.0, (64, 64)), (0.7, (96, 96)), (2.1, (48, 48)), (1.3, (80, 80))])
def test_device_augment_matches_cv2_chain(f, crop):
    """Fix the random draws by monkeypatching jax.random, compare pixels."""
    rng = np.random.RandomState(0)
    H0, W0 = 100, 120
    image = rng.randint(0, 256, (H0, W0, 3)).astype(np.float32)
    label = rng.randint(0, 19, (H0, W0)).astype(np.int32)

    sH, sW = int(round(H0 * f)), int(round(W0 * f))
    ch, cw = crop
    oy = min(5, max(sH, ch) - ch)
    ox = min(7, max(sW, cw) - cw)

    want_img, want_lbl = reference_recipe(
        image, label, f, oy, ox, False, crop, CITYSCAPES_MEAN_BGR
    )

    # drive device_augment with deterministic draws
    f_idx = int(round((f - 0.7) / 0.1))
    import ccnet_tpu.data.preprocess as pp

    orig_randint, orig_bern = jax.random.randint, jax.random.bernoulli
    draws = iter([f_idx, oy, ox])

    def fake_randint(key, shape, lo, hi):
        return jnp.asarray(next(draws), jnp.int32)

    def fake_bernoulli(key, p=0.5):
        return jnp.asarray(False)

    jax.random.randint, jax.random.bernoulli = fake_randint, fake_bernoulli
    try:
        got_img, got_lbl = pp.device_augment(
            jnp.asarray(image), jnp.asarray(label), jax.random.PRNGKey(0), crop_hw=crop
        )
    finally:
        jax.random.randint, jax.random.bernoulli = orig_randint, orig_bern

    # Label parity: cv2's INTER_NEAREST computes floor(d * double(1/f)) whose
    # double rounding can land a hair *below* exact integer coordinates; in
    # f32 we land on/above. Mismatches are only legal at those tie points
    # (coordinate within eps of an integer) and shift the pick by one pixel.
    got_lbl = np.asarray(got_lbl)
    H0s, W0s = label.shape
    sH2, sW2 = int(round(H0s * f)), int(round(W0s * f))
    ys = (np.arange(ch) + oy) * (H0s / sH2)
    xs = (np.arange(cw) + ox) * (W0s / sW2)
    tie = (np.abs(ys - np.round(ys)) < 1e-6)[:, None] | (np.abs(xs - np.round(xs)) < 1e-6)[None, :]
    mismatch = got_lbl != want_lbl
    assert not (mismatch & ~tie).any(), "label mismatch beyond cv2 tie boundaries"
    assert mismatch.mean() < 0.10
    np.testing.assert_allclose(np.asarray(got_img), want_img, atol=1e-2)


def test_host_augment_shapes_and_padding():
    rng = np.random.RandomState(1)
    image = rng.randint(0, 256, (40, 50, 3)).astype(np.float32)
    label = rng.randint(0, 19, (40, 50)).astype(np.int32)
    img, lbl = host_augment(image, label, np.random.RandomState(0), crop_hw=(96, 96))
    assert img.shape == (96, 96, 3) and lbl.shape == (96, 96)
    assert (lbl == 255).any()  # padding produced ignore pixels


def test_trainid_lut_matches_dict():
    lut = trainid_lut()
    for k, v in CITYSCAPES_ID_TO_TRAINID.items():
        if k >= 0:
            assert lut[k] == v
    assert lut[200] == 255  # unmapped ids -> ignore


def test_trainid_roundtrip():
    pred = np.arange(19, dtype=np.uint8).reshape(1, 19)
    lbl = trainid_to_labelid(pred)
    back = trainid_lut()[lbl]
    np.testing.assert_array_equal(back, pred)


def test_loader_deterministic_and_complete():
    ds = SyntheticDataset(n=10, hw=(16, 16))
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=7, num_workers=2)
    dl.set_epoch(3)
    batches1 = [names for _, _, names in dl]
    dl2 = DataLoader(ds, batch_size=4, shuffle=True, seed=7, num_workers=2)
    dl2.set_epoch(3)
    batches2 = [names for _, _, names in dl2]
    assert batches1 == batches2
    assert len(batches1) == 2  # drop_last
    flat = [n for b in batches1 for n in b]
    assert len(set(flat)) == 8


def test_augmenting_dataset_voc_style(tmp_path):
    """VOC-style variable-size dataset through AugmentingDataset + DataLoader."""
    cv2_ = pytest.importorskip("cv2")
    import os

    os.makedirs(tmp_path / "JPEGImages", exist_ok=True)
    os.makedirs(tmp_path / "SegmentationClassAug", exist_ok=True)
    rng = np.random.RandomState(0)
    ids = []
    for i, (h, w) in enumerate([(60, 80), (90, 70), (50, 50)]):
        name = f"img{i}"
        ids.append(name)
        cv2_.imwrite(str(tmp_path / "JPEGImages" / f"{name}.jpg"),
                     rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
        cv2_.imwrite(str(tmp_path / "SegmentationClassAug" / f"{name}.png"),
                     rng.randint(0, 21, (h, w)).astype(np.uint8))
    (tmp_path / "list.txt").write_text("\n".join(ids))

    from ccnet_tpu.data import AugmentingDataset, DataLoader, VOCDataset
    from ccnet_tpu.data.voc import VOC_MEAN, VOC_SCALE_MIN, VOC_SCALE_STEPS

    raw = VOCDataset(str(tmp_path), str(tmp_path / "list.txt"))
    ds = AugmentingDataset(raw, crop_hw=(64, 64), mean=VOC_MEAN,
                           scale_min=VOC_SCALE_MIN, scale_steps=VOC_SCALE_STEPS)
    dl = DataLoader(ds, batch_size=3, shuffle=False, num_workers=2, drop_last=False)
    batches = list(dl)
    assert len(batches) == 1
    imgs, lbls, names = batches[0]
    assert imgs.shape == (3, 64, 64, 3) and lbls.shape == (3, 64, 64)
    assert set(names) == set(ids)
    # determinism per (seed, index)
    img2, lbl2, _ = ds[1]
    img3, lbl3, _ = ds[1]
    np.testing.assert_array_equal(img2, img3)


def test_matmul_sampler_matches_gather():
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.randint(0, 256, (2, 64, 96, 3)).astype(np.float32))
    lbl = jnp.asarray(rng.randint(0, 19, (2, 64, 96)).astype(np.int32))
    from ccnet_tpu.data import device_augment_batch

    a_i, a_l = device_augment_batch(img, lbl, jax.random.PRNGKey(7), crop_hw=(48, 48))
    b_i, b_l = device_augment_batch(img, lbl, jax.random.PRNGKey(7), crop_hw=(48, 48),
                                    sampler="matmul")
    np.testing.assert_allclose(np.asarray(a_i), np.asarray(b_i), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(a_l), np.asarray(b_l))


def test_loader_pipelined_decode_stays_ordered():
    """Cross-batch pipelined decode must still yield batches in permutation
    order with sample content intact, even when items complete out of order
    and the tail batch is short (drop_last=False)."""
    import time

    class JitteryDataset(SyntheticDataset):
        def __getitem__(self, index):
            time.sleep((index % 3) * 0.01)  # stragglers complete out of order
            return super().__getitem__(index)

    ds = JitteryDataset(n=10, hw=(8, 8))
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=5, num_workers=4,
                    drop_last=False, prefetch=2)
    dl.set_epoch(1)
    got = list(dl)
    assert [len(n) for _, _, n in got] == [4, 4, 2]  # short tail kept

    order = np.random.RandomState(5 + 1).permutation(10)
    expect = [ds.name(i) for i in order]
    names = [n for _, _, nn in got for n in nn]
    assert names == expect
    # content matches the dataset sample for its name (decode not swapped)
    for images, labels, nn in got:
        for k, name in enumerate(nn):
            idx = int(name.split("_")[1])
            img, lbl, _ = SyntheticDataset(n=10, hw=(8, 8))[idx]
            np.testing.assert_array_equal(images[k], img)
            np.testing.assert_array_equal(labels[k], lbl)


def test_u8_wire_path_matches_f32_host_augment():
    """The wire-minimal u8 path (host_augment_u8 → finish_u8_crops) must
    match the f32 host_augment chain: identical rng consumption (same
    geometry draws), exact labels, images within u8-resize rounding (the
    reference itself resizes in uint8 — datasets.py:157-161 — so the u8
    path is the MORE faithful one; the f32 twin interpolates unrounded)."""
    from ccnet_tpu.data import finish_u8_crops, host_augment_u8

    rng = np.random.RandomState(7)
    image = rng.randint(0, 256, size=(90, 130, 3)).astype(np.uint8)
    label = rng.randint(0, 19, size=(90, 130)).astype(np.uint8)
    label[rng.rand(90, 130) < 0.05] = 255

    crop = (64, 64)
    img8, lbl8 = host_augment_u8(image, label, np.random.RandomState(3),
                                 crop_hw=crop, scale_min=0.7, scale_steps=15)
    assert img8.dtype == np.uint8 and lbl8.dtype == np.uint8
    assert img8.shape == (*crop, 3) and lbl8.shape == crop

    imgf, lblf = host_augment(image.astype(np.float32), label.astype(np.int32),
                              np.random.RandomState(3), crop_hw=crop,
                              scale_min=0.7, scale_steps=15)
    fin_img, fin_lbl = finish_u8_crops(jnp.asarray(img8[None]), jnp.asarray(lbl8[None]))
    assert fin_img.dtype == jnp.float32 and fin_lbl.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(fin_lbl)[0], lblf)
    # pad pixels: |round(mean) - mean| ≤ 0.5; resized pixels: u8 rounding ≤ 1
    np.testing.assert_allclose(np.asarray(fin_img)[0], imgf, atol=1.0)


def test_u8_crop_dataset_epoch_redraw_and_loader_forwarding():
    """U8CropDataset re-draws augmentation per epoch (set_epoch forwarded by
    the DataLoader) but is deterministic for a fixed (seed, epoch, index)."""
    from ccnet_tpu.data import U8CropDataset

    class RawU8(SyntheticDataset):
        def __getitem__(self, index):
            img, lbl, name = super().__getitem__(index)
            return (np.clip(img, 0, 255).astype(np.uint8),
                    np.clip(lbl, 0, 255).astype(np.uint8), name)

    ds = U8CropDataset(RawU8(n=4, hw=(80, 120)), crop_hw=(48, 48), seed=5)
    a0 = ds[1][0].copy()
    a0_again = ds[1][0]
    np.testing.assert_array_equal(a0, a0_again)  # deterministic within epoch

    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2)
    loader.set_epoch(1)
    assert ds.epoch == 1  # forwarded through the loader
    a1 = ds[1][0]
    assert not np.array_equal(a0, a1)  # fresh draws per epoch


def test_device_prefetch_orders_places_and_raises():
    """device_prefetch preserves order, applies place_fn, and surfaces
    producer exceptions at the consumer."""
    from ccnet_tpu.data import device_prefetch

    batches = [(np.full((2, 4, 4, 3), i, np.uint8),
                np.full((2, 4, 4), i, np.uint8), [f"b{i}"]) for i in range(5)]
    out = list(device_prefetch(
        iter(batches), lambda im, lb: (jnp.asarray(im), jnp.asarray(lb)), depth=2))
    assert [n for (_, _, (n,)) in out] == [f"b{i}" for i in range(5)]
    for i, (im, lb, _) in enumerate(out):
        assert isinstance(im, jnp.ndarray)
        assert int(im[0, 0, 0, 0]) == i and int(lb[0, 0, 0]) == i

    def boom():
        yield batches[0]
        raise RuntimeError("decode failed")

    it = device_prefetch(boom(), lambda im, lb: (im, lb))
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_cached_dataset_keys_by_name_across_epoch_tiling():
    """max_iters-style epoch tiling repeats each file under many indices —
    the decode cache must key by sample NAME so tiled indices hit."""
    from ccnet_tpu.data import CachedDataset

    class Counting:
        def __init__(self):
            self.decodes = 0
        def __len__(self):
            return 6  # 3 files tiled twice
        def name(self, i):
            return f"file_{i % 3}"
        def __getitem__(self, i):
            self.decodes += 1
            return (np.full((4, 4, 3), i % 3, np.uint8),
                    np.full((4, 4), i % 3, np.uint8), self.name(i))

    inner = Counting()
    ds = CachedDataset(inner)
    for i in range(6):
        img, _, _ = ds[i]
        assert img[0, 0, 0] == i % 3
    assert inner.decodes == 3  # one decode per unique file, not per index


def test_cached_dataset_byte_budget_bounds_residency():
    """The cache stops admitting once the byte budget is hit (full
    Cityscapes in uint8 is ~25 GB — unbounded residency is unsafe on small
    hosts); beyond-budget samples decode per access, values unchanged."""
    from ccnet_tpu.data import CachedDataset

    class Counting:
        def __init__(self):
            self.decodes = 0
        def __len__(self):
            return 4
        def name(self, i):
            return f"file_{i}"
        def __getitem__(self, i):
            self.decodes += 1
            return (np.full((8, 8, 3), i, np.uint8),
                    np.full((8, 8), i, np.uint8), self.name(i))

    per_item = 8 * 8 * 3 + 8 * 8  # 256 B
    inner = Counting()
    ds = CachedDataset(inner, max_bytes=2 * per_item)
    for _ in range(2):
        for i in range(4):
            img, lbl, _ = ds[i]
            assert img[0, 0, 0] == i and lbl[0, 0] == i
    # first two samples cached (1 decode each), last two re-decoded per epoch
    assert inner.decodes == 2 + 2 * 2
    assert ds._bytes == 2 * per_item

    # default budget comes from CCNET_TPU_CACHE_GB
    import os
    old = os.environ.get("CCNET_TPU_CACHE_GB")
    os.environ["CCNET_TPU_CACHE_GB"] = "2"
    try:
        assert CachedDataset(inner).max_bytes == 2 << 30
    finally:
        if old is None:
            os.environ.pop("CCNET_TPU_CACHE_GB")
        else:
            os.environ["CCNET_TPU_CACHE_GB"] = old


def test_u8_crop_dataset_native_engine_matches_cv2():
    """The native (C++/OpenMP crop-window) engine must draw the SAME
    geometry as the cv2 engine from one rng stream (labels exactly equal —
    nearest sampling is deterministic index math) and match images within
    uint8 rounding (cv2 fixed-point vs float lerp)."""
    from ccnet_tpu import native
    from ccnet_tpu.data import U8CropDataset

    if not native.available():
        pytest.skip("native augment library unavailable")

    class RawU8(SyntheticDataset):
        def __getitem__(self, index):
            img, lbl, name = super().__getitem__(index)
            return (np.clip(img, 0, 255).astype(np.uint8),
                    np.clip(lbl, 0, 19).astype(np.uint8), name)

    kw = dict(crop_hw=(64, 64), seed=11, scale_min=0.7, scale_steps=15)
    base = RawU8(n=6, hw=(90, 130))
    ds_cv2 = U8CropDataset(base, engine="cv2", **kw)
    ds_nat = U8CropDataset(base, engine="native", **kw)
    for ep in (0, 1):
        ds_cv2.set_epoch(ep)
        ds_nat.set_epoch(ep)
        for i in range(6):
            img_c, lbl_c, _ = ds_cv2[i]
            img_n, lbl_n, _ = ds_nat[i]
            assert img_n.dtype == np.uint8 and lbl_n.dtype == np.uint8
            np.testing.assert_array_equal(lbl_n, lbl_c)
            diff = np.abs(img_n.astype(np.int32) - img_c.astype(np.int32))
            assert diff.max() <= 2, (i, ep, diff.max())


def _no_pipeline_threads():
    import threading
    return not any(t.name.startswith(("ccnet-loader-producer",
                                      "ccnet-prefetch-producer"))
                   for t in threading.enumerate() if t.is_alive())


def test_loader_early_break_reclaims_producer_thread():
    """Abandoning a DataLoader iterator mid-epoch must not leak the producer
    (previously a producer blocked in q.put never observed stop and pinned
    the decode executor + lookahead samples forever)."""
    import time

    ds = SyntheticDataset(n=32, hw=(16, 16))
    loader = DataLoader(ds, 2, shuffle=False, num_workers=2, prefetch=1)
    it = iter(loader)
    next(it)
    it.close()  # generator finally -> _shutdown_pipeline
    deadline = time.time() + 5
    while not _no_pipeline_threads() and time.time() < deadline:
        time.sleep(0.02)
    assert _no_pipeline_threads(), "loader producer thread leaked"


def test_device_prefetch_depth1_early_break_reclaims_thread():
    """depth=1 is the adversarial case: after the consumer's drain, the
    producer's pending put refills the single slot and the sentinel put
    would deadlock without the drain-until-dead shutdown."""
    import time

    from ccnet_tpu.data import device_prefetch

    ds = SyntheticDataset(n=32, hw=(16, 16))
    loader = DataLoader(ds, 2, shuffle=False, num_workers=2, prefetch=1)
    it = device_prefetch(iter(loader), lambda im, lb: (im, lb), depth=1)
    next(it)
    it.close()
    deadline = time.time() + 5
    while not _no_pipeline_threads() and time.time() < deadline:
        time.sleep(0.02)
    assert _no_pipeline_threads(), "prefetch producer thread leaked"
