"""Manifest generation: reproduce the reference's .lst recipes from a layout
(reference dataset/list/* consumed at dataset/datasets.py:129). A fake
Cityscapes/VOC tree stands in for the real data; structure, ordering and
composition (train+/train++ coarse mixes) are asserted exactly, and the
generated lists must round-trip through the dataset classes."""

import os
import os.path as osp

from ccnet_tpu.data import (CityscapesDataset, generate_cityscapes_lists,
                            generate_voc_lists)


def _touch(path):
    os.makedirs(osp.dirname(path), exist_ok=True)
    open(path, "wb").close()


def make_fake_cityscapes(root, with_coarse=True):
    cities = {"train": ["aachen", "zurich"], "val": ["frankfurt"],
              "test": ["berlin"], "train_extra": ["augsburg"]}
    counts = {"train": 3, "val": 2, "test": 2, "train_extra": 4}
    for split, cs in cities.items():
        if split == "train_extra" and not with_coarse:
            continue
        gt = "gtCoarse" if split == "train_extra" else "gtFine"
        for city in cs:
            for i in range(counts[split]):
                stem = f"{city}_{i:06d}_000019"
                _touch(osp.join(root, "leftImg8bit", split, city,
                                f"{stem}_leftImg8bit.png"))
                if split != "test":
                    _touch(osp.join(root, gt, split, city,
                                    f"{stem}_{gt}_labelIds.png"))
    return counts


def test_cityscapes_list_generation(tmp_path):
    root, out = str(tmp_path / "cs"), str(tmp_path / "lists")
    make_fake_cityscapes(root)
    counts = generate_cityscapes_lists(root, out)
    assert counts == {"train.lst": 6, "val.lst": 2, "trainval.lst": 8,
                      "test.lst": 2, "train+.lst": 10, "train++.lst": 12}

    train = open(osp.join(out, "train.lst")).read().splitlines()
    assert train[0] == ("leftImg8bit/train/aachen/aachen_000000_000019_leftImg8bit.png"
                        "\tgtFine/train/aachen/aachen_000000_000019_gtFine_labelIds.png")
    assert train == sorted(train)  # lexicographic within the section

    # test split: image-only lines
    test_lines = open(osp.join(out, "test.lst")).read().splitlines()
    assert all("\t" not in l and l.endswith("_leftImg8bit.png") for l in test_lines)

    # train+ = train(gtFine) ++ train_extra(gtCoarse); train++ adds val(gtFine)
    plus = open(osp.join(out, "train+.lst")).read().splitlines()
    assert plus[:6] == train
    assert all("gtCoarse" in l and "/train_extra/" in l for l in plus[6:])
    plusplus = open(osp.join(out, "train++.lst")).read().splitlines()
    assert plusplus[:10] == plus
    assert all("/val/" in l and "gtFine" in l for l in plusplus[10:])

    # trainval = train ++ val
    val = open(osp.join(out, "val.lst")).read().splitlines()
    assert open(osp.join(out, "trainval.lst")).read().splitlines() == train + val


def test_generated_list_roundtrips_through_dataset(tmp_path):
    root, out = str(tmp_path / "cs"), str(tmp_path / "lists")
    make_fake_cityscapes(root, with_coarse=False)
    generate_cityscapes_lists(root, out)
    from_list = CityscapesDataset(root, list_path=osp.join(out, "train.lst"))
    discovered = CityscapesDataset(root, split="train")
    assert len(from_list) == len(discovered) == 6
    assert [from_list.name(i) for i in range(6)] == \
           [discovered.name(i) for i in range(6)]
    # test list (no labels): dataset must accept image-only lines
    test_ds = CityscapesDataset(root, list_path=osp.join(out, "test.lst"))
    assert len(test_ds) == 2 and test_ds.items[0][1] is None


def test_voc_list_generation(tmp_path):
    root, out = str(tmp_path / "voc"), str(tmp_path / "lists")
    ids = [f"2007_{i:06d}" for i in range(8)]
    for i in ids:
        _touch(osp.join(root, "SegmentationClassAug", f"{i}.png"))
    os.makedirs(osp.join(root, "ImageSets", "Segmentation"), exist_ok=True)
    with open(osp.join(root, "ImageSets", "Segmentation", "val.txt"), "w") as f:
        f.write("\n".join(ids[5:]) + "\n")
    counts = generate_voc_lists(root, out)
    assert counts == {"val.txt": 3, "train_aug.txt": 5}
    assert open(osp.join(out, "train_aug.txt")).read().splitlines() == ids[:5]
    assert open(osp.join(out, "val.txt")).read().splitlines() == ids[5:]


# ------------------------------------------------------------------------
# The reference's SHIPPED manifests as fixtures (/root/reference/dataset/
# list/) — the generator's recipe and our reader are checked against the
# actual files, not just their documented structure.

REF_LISTS = "/root/reference/dataset/list/cityscapes"

import pytest

pytestmark_ref = pytest.mark.skipif(
    not osp.isdir(REF_LISTS), reason="reference checkout not present")


def _ref_lines(name):
    return open(osp.join(REF_LISTS, name)).read().splitlines()


@pytestmark_ref
def test_shipped_lists_structure():
    """Counts, tab separator, path shape, label derivation and section
    composition of the reference's shipped .lst files (consumed at
    dataset/datasets.py:129-133)."""
    train, val, test = _ref_lines("train.lst"), _ref_lines("val.lst"), _ref_lines("test.lst")
    trainval, plus, plusplus = (_ref_lines("trainval.lst"),
                                _ref_lines("train+.lst"), _ref_lines("train++.lst"))
    assert (len(train), len(val), len(test)) == (2975, 500, 1525)
    assert (len(trainval), len(plus), len(plusplus)) == (3475, 22973, 23473)

    # composition: trainval = train ++ val; train+ = train ++ extra(gtCoarse);
    # train++ = train+ ++ val — exactly the recipe lists.py regenerates
    assert trainval == train + val
    assert plus[:2975] == train
    assert plusplus == plus + val

    for line in train + val + plus[2975:]:
        img, lbl = line.split("\t")  # exactly one tab
        gt = "gtCoarse" if "/train_extra/" in img else "gtFine"
        expect = img.replace("leftImg8bit/", f"{gt}/", 1).replace(
            "_leftImg8bit.png", f"_{gt}_labelIds.png")
        assert lbl == expect, line
    assert all("\t" not in l and l.endswith("_leftImg8bit.png") for l in test)

    # each section is lexicographically sorted (the generator's ordering)
    for section in (train, val, test, plus[2975:]):
        assert section == sorted(section)


@pytestmark_ref
def test_generator_reproduces_shipped_lists_byte_for_byte(tmp_path):
    """Touch a synthetic tree holding the first K images of each shipped
    section; the generated .lst files must equal the corresponding shipped
    lines byte-for-byte (same derivation, ordering, separators, newlines)."""
    K = 5
    train, val, test = _ref_lines("train.lst"), _ref_lines("val.lst"), _ref_lines("test.lst")
    extra = _ref_lines("train+.lst")[2975:]

    root, out = str(tmp_path / "cs"), str(tmp_path / "lists")
    for line in train[:K] + val[:K] + extra[:K]:
        _touch(osp.join(root, line.split("\t")[0]))
    for line in test[:K]:
        _touch(osp.join(root, line))
    generate_cityscapes_lists(root, out)

    def _gen(name):
        return open(osp.join(out, name)).read()

    def _join(lines):
        return "\n".join(lines) + "\n"

    assert _gen("train.lst") == _join(train[:K])
    assert _gen("val.lst") == _join(val[:K])
    assert _gen("test.lst") == _join(test[:K])
    assert _gen("trainval.lst") == _join(train[:K] + val[:K])
    assert _gen("train+.lst") == _join(train[:K] + extra[:K])
    assert _gen("train++.lst") == _join(train[:K] + extra[:K] + val[:K])


@pytestmark_ref
def test_reader_parses_shipped_lists():
    """Our CityscapesDataset consumes the actual shipped manifests (path
    join semantics of dataset/datasets.py:129-133: lines are relative to
    root; test split has image-only lines)."""
    val = CityscapesDataset("/data/cs", list_path=osp.join(REF_LISTS, "val.lst"))
    assert len(val) == 500
    img0, lbl0 = val.items[0]
    assert img0 == "/data/cs/leftImg8bit/val/frankfurt/frankfurt_000000_000294_leftImg8bit.png"
    assert lbl0 == "/data/cs/gtFine/val/frankfurt/frankfurt_000000_000294_gtFine_labelIds.png"

    test = CityscapesDataset("/data/cs", list_path=osp.join(REF_LISTS, "test.lst"))
    assert len(test) == 1525 and all(lbl is None for _, lbl in test.items)

    # max_iters replication semantics (datasets.py:132-133): ceil-replicate
    rep = CityscapesDataset("/data/cs", list_path=osp.join(REF_LISTS, "val.lst"),
                            max_iters=1200)
    assert len(rep) == 1500 and rep.items[500] == rep.items[0]
