"""Photo scene tier: real package-photo backgrounds as the real-data proxy.

The container ships no ICDAR-2015 data (REAL_DATA.md); the closest
available proxy to real scene-text statistics is compositing the v2
instance geometry over genuine photographs found inside installed
packages. These tests pin the tier's contract: disjoint train/val
background sets, valid ICDAR-format GT, in-bounds quads, determinism.
"""

import numpy as np
import pytest

from tensorflow_ocr_tpu.data.icdar import (
    _photo_sources,
    load_annotation,
    make_synthetic_dataset,
)

_HAVE = all(_photo_sources().values())
pytestmark = pytest.mark.skipif(
    not _HAVE, reason="no real package photos available in this container")


def test_splits_disjoint():
    src = _photo_sources()
    assert src["train"] and src["val"]
    assert not set(src["train"]) & set(src["val"])


def test_photo_scenes_valid_gt(tmp_path):
    h, w = 256, 320
    files = make_synthetic_dataset(
        str(tmp_path), 3, (h, w), seed=0, hard="photo:train")
    assert len(files) == 3
    n_text = 0
    for fn in files:
        import cv2
        im = cv2.imread(fn)
        assert im.shape == (h, w, 3)
        gt = str(tmp_path / ("gt_" + fn.rsplit("/", 1)[1]
                             .replace(".jpg", ".txt")))
        polys, tags = load_annotation(gt)
        assert len(polys) >= 1
        assert polys[..., 0].min() >= 0 and polys[..., 0].max() <= w - 1
        assert polys[..., 1].min() >= 0 and polys[..., 1].max() <= h - 1
        n_text += int((~tags).sum())
    assert n_text >= 1  # at least one non-ignored instance across the set


def test_photo_deterministic(tmp_path):
    a = make_synthetic_dataset(str(tmp_path / "a"), 2, (128, 128),
                               seed=7, hard="photo:val")
    b = make_synthetic_dataset(str(tmp_path / "b"), 2, (128, 128),
                               seed=7, hard="photo:val")
    for fa, fb in zip(a, b):
        assert open(fa, "rb").read() == open(fb, "rb").read()


def test_mixed_tier_start_index(tmp_path):
    """photo_mix layout: two tiers share one ICDAR dir via start_index
    without filename collisions, and every image has a matching GT."""
    import os
    d = str(tmp_path / "mix")
    a = make_synthetic_dataset(d, 2, (128, 128), seed=0, hard="v2")
    b = make_synthetic_dataset(d, 2, (128, 128), seed=2,
                               hard="photo:train", start_index=2)
    names = sorted(os.listdir(d))
    assert [n for n in names if n.endswith(".jpg")] == [
        f"img_{i}.jpg" for i in range(4)]
    assert [n for n in names if n.endswith(".txt")] == [
        f"gt_img_{i}.txt" for i in range(4)]
    assert not set(a) & set(b)


def test_photo2_supersets_photo_and_stays_disjoint():
    """photo2 = photo sources + real-texture additions, per split, with
    no cross-split sharing (near-duplicate sources must sit on the same
    side; see _photo_sources docstring)."""
    p1, p2 = _photo_sources("photo"), _photo_sources("photo2")
    for split in ("train", "val"):
        assert set(p1[split]) <= set(p2[split])
    assert not set(p2["train"]) & set(p2["val"])
    if len(p2["train"]) == len(p1["train"]):
        pytest.skip("no dm_control/gymnasium texture assets here — "
                    "photo2 degrades to the photo tier")
    assert len(p2["val"]) > len(p1["val"])


def test_photo2_scenes_render(tmp_path):
    files = make_synthetic_dataset(
        str(tmp_path), 2, (128, 160), seed=3, hard="photo2:val")
    assert len(files) == 2
    for fn in files:
        import cv2
        assert cv2.imread(fn).shape == (128, 160, 3)
        gt = str(tmp_path / ("gt_" + fn.rsplit("/", 1)[1]
                             .replace(".jpg", ".txt")))
        polys, _ = load_annotation(gt)
        assert len(polys) >= 1


def test_photo_backgrounds_vary_between_splits(tmp_path):
    """Same seed, different split -> different background imagery (the
    split selects from disjoint source photo sets)."""
    a = make_synthetic_dataset(str(tmp_path / "t"), 1, (128, 128),
                               seed=5, hard="photo:train")
    b = make_synthetic_dataset(str(tmp_path / "u"), 1, (128, 128),
                               seed=5, hard="photo:val")
    assert open(a[0], "rb").read() != open(b[0], "rb").read()
