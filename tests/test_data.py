"""Data pipeline: annotation parsing, augmentation, batching, prefetch."""

import os

import numpy as np
import pytest

from tensorflow_ocr_tpu.config import DataConfig
from tensorflow_ocr_tpu.data import icdar
from tensorflow_ocr_tpu.data.pipeline import PrefetchLoader, batch_generator


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("icdar"))
    files = icdar.make_synthetic_dataset(path, num_images=6, seed=3)
    return path, files


def test_load_annotation_parses_tags(tmp_path):
    p = tmp_path / "gt_img_0.txt"
    p.write_text(
        "﻿10,10,50,10,50,30,10,30,hello\n"
        "60,60,90,60,90,80,60,80,###\n"
        "5,5,20,5,20,15,5,15,*\n"
    )
    polys, tags = icdar.load_annotation(str(p))
    assert polys.shape == (3, 4, 2)
    assert list(tags) == [False, True, True]
    np.testing.assert_allclose(polys[0][0], [10, 10])


def test_gt_path_for_image():
    assert icdar.gt_path_for_image("/a/b/img_12.jpg") == "/a/b/gt_img_12.txt"


def test_prepare_sample_shapes(dataset):
    path, files = dataset
    cfg = DataConfig(training_data_path=path, input_size=256, max_polys=16)
    s = icdar.prepare_sample(files[0], cfg, np.random.RandomState(0))
    assert s is not None
    assert s.image.shape == (256, 256, 3)
    assert s.polys.shape == (16, 4, 2)
    assert s.valid.any()
    # polys are inside the resized frame
    assert s.polys[s.valid].min() >= -1
    assert s.polys[s.valid].max() <= 256 + 1


def test_prepare_sample_east_extras(dataset):
    path, files = dataset
    cfg = DataConfig(training_data_path=path, input_size=256, max_polys=16)
    s = icdar.prepare_sample(
        files[0], cfg, np.random.RandomState(0), want_east=True
    )
    k = s.valid.sum()
    assert (np.abs(s.angles) <= np.pi / 2).all()
    # shrunk polys have smaller area than originals
    from tensorflow_ocr_tpu.ops.geometry import polygon_area
    for i in range(k):
        assert abs(polygon_area(s.shrunk[i])) < abs(polygon_area(s.polys[i]))


def test_crop_area_keeps_whole_polys(dataset):
    rng = np.random.RandomState(1)
    im = np.zeros((200, 300, 3), np.uint8)
    polys = np.array(
        [[[50, 50], [120, 50], [120, 90], [50, 90]]], np.float32
    )
    tags = np.array([False])
    im2, p2, t2 = icdar.crop_area(im, polys, tags, rng=rng)
    if p2.shape[0]:  # either kept whole (shifted) or crop failed -> unchanged
        bw = p2[0, :, 0].max() - p2[0, :, 0].min()
        bh = p2[0, :, 1].max() - p2[0, :, 1].min()
        assert bw == pytest.approx(70) and bh == pytest.approx(40)


def test_batch_generator_shapes(dataset):
    path, _ = dataset
    cfg = DataConfig(
        training_data_path=path, input_size=128, batch_size=2, max_polys=8
    )
    batch = next(batch_generator(cfg))
    assert batch["images"].shape == (2, 128, 128, 3)
    assert batch["polys"].shape == (2, 8, 4, 2)
    assert batch["valid"].shape == (2, 8)
    assert len(batch["fns"]) == 2


def test_prefetch_loader_delivers(dataset):
    path, _ = dataset
    cfg = DataConfig(
        training_data_path=path, input_size=128, batch_size=2,
        num_workers=2, max_queue_size=4, max_polys=8,
    )
    loader = PrefetchLoader(cfg, seed=0)
    try:
        b1 = next(loader)
        b2 = next(loader)
        assert b1["images"].shape == (2, 128, 128, 3)
        assert b2["images"].shape == (2, 128, 128, 3)
    finally:
        loader.stop()


def test_grain_loader_batches(dataset):
    path, _ = dataset
    cfg = DataConfig(
        training_data_path=path, input_size=128, batch_size=2,
        max_polys=8, num_workers=1,
    )
    from tensorflow_ocr_tpu.data.grain_pipeline import grain_loader

    it = grain_loader(cfg, seed=0, num_epochs=1)
    b = next(it)
    assert b["images"].shape == (2, 128, 128, 3)
    assert b["images"].dtype == np.uint8
    assert b["polys"].shape == (2, 8, 4, 2)


def test_rotate_keeps_poly_count():
    im = np.zeros((100, 100, 3), np.uint8)
    polys = np.array([[[20, 20], [60, 20], [60, 40], [20, 40]]], np.float32)
    im2, p2 = icdar.rotate_image_and_polys(im, polys, 10.0)
    assert p2.shape == (1, 4, 2)
    center_before = polys[0].mean(0)
    center_after = p2[0].mean(0)
    assert np.linalg.norm(center_before - center_after) < 12


def test_background_crop_sampling(dataset):
    """background_ratio=1 with use_crop draws text-free crops: zero valid
    polys, square input-size image (intended branch of reference
    datasets/icdar.py:582-598). Images where no text-free crop exists are
    skipped (None)."""
    path, files = dataset
    cfg = DataConfig(training_data_path=path, input_size=64, max_polys=8,
                     use_crop=True, background_ratio=1.0)
    rng = np.random.RandomState(0)
    got_background = 0
    for fn in files * 3:
        s = icdar.prepare_sample(fn, cfg, rng)
        if s is None:
            continue
        assert s.image.shape == (64, 64, 3)
        assert not s.valid.any()
        got_background += 1
    assert got_background > 0

    # background_ratio=0 keeps the text path: every sample has text
    cfg0 = DataConfig(training_data_path=path, input_size=64, max_polys=8,
                      use_crop=True, background_ratio=0.0)
    s = None
    for fn in files:
        s = icdar.prepare_sample(fn, cfg0, np.random.RandomState(1))
        if s is not None:
            break
    assert s is not None and s.valid.any()


def test_synthetic_v2_scenes_parse_and_label(tmp_path):
    """hard='v2' scenes (perspective/curved/crowded/extreme-scale) must
    produce loader-parseable GT whose polys survive validation and
    rasterize to non-trivial labels."""
    import numpy as np
    import jax.numpy as jnp

    from tensorflow_ocr_tpu.data import icdar
    from tensorflow_ocr_tpu.config import DataConfig

    path = str(tmp_path / "v2")
    files = icdar.make_synthetic_dataset(
        path, num_images=4, size=(256, 256), seed=5, hard="v2")
    assert len(files) == 4
    cfg = DataConfig()
    cfg.training_data_path = path
    cfg.input_size = 256
    cfg.max_polys = 24
    n_valid = 0
    for fn in files:
        polys, tags = icdar.load_annotation(icdar.gt_path_for_image(fn))
        assert len(polys) >= 1
        s = icdar.prepare_sample(fn, cfg, rng=np.random.RandomState(0))
        assert s is not None
        n_valid += int(np.sum(s.valid))
    assert n_valid >= 4  # across 4 images, several usable instances
