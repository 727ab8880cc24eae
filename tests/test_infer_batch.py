"""Batched inference path + stride-direct label equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest

from tensorflow_ocr_tpu.config import Config
from tensorflow_ocr_tpu.infer import Predictor
from tensorflow_ocr_tpu.ops.labels import (
    pixellink_labels,
    pixellink_labels_stride,
)

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


def test_stride_direct_score_matches_fullres_subsample():
    """Score maps from stride-direct rasterization must be bit-identical to
    the reference's full-res [::4,::4] sampling (same sample points)."""
    h = w = 64
    polys = np.zeros((4, 4, 2), np.float32)
    polys[0] = [[5, 7], [49, 9], [47, 30], [4, 28]]
    polys[1] = [[30, 40], [60, 40], [60, 60], [30, 60]]
    valid = np.array([True, True, False, False])
    ig = np.zeros(4, bool)
    s_full, _, m_full = pixellink_labels(
        jnp.array(polys), jnp.array(ig), jnp.array(valid), h, w, 10
    )
    s_stride, _, m_stride = pixellink_labels_stride(
        jnp.array(polys), jnp.array(ig), jnp.array(valid), h // 4, w // 4, 4, 10
    )
    np.testing.assert_array_equal(
        np.asarray(s_full)[::4, ::4], np.asarray(s_stride)
    )
    np.testing.assert_array_equal(
        np.asarray(m_full)[::4, ::4], np.asarray(m_stride)
    )


@pytest.fixture(scope="module")
def predictor():
    cfg = Config()
    cfg.model.name = "pixellink_vgg16"
    cfg.infer.pixel_conf_threshold = 0.3
    cfg.infer.link_conf_threshold = 0.01
    cfg.infer.min_component_size = 1
    cfg.infer.max_components = 16
    # no checkpoint dir -> fresh weights; enough to exercise the path
    cfg.infer.checkpoint_path = "/nonexistent"
    return Predictor(cfg)


def test_detect_batch_shapes(predictor):
    rng = np.random.RandomState(0)
    imgs = (rng.rand(2, 64, 64, 3) * 255).astype(np.float32)
    results = predictor.detect_batch(imgs)
    assert len(results) == 2
    for boxes in results:
        for b in boxes:
            assert np.asarray(b).shape == (4, 2)


def test_detect_single_matches_api(predictor):
    rng = np.random.RandomState(1)
    im = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    boxes, ms = predictor.detect(im)
    assert isinstance(boxes, list) and ms > 0


def test_detect_batches_pipelined_matches_detect_batch(predictor):
    """The pipelined stream path must yield exactly detect_batch's
    results, in order, for every batch in the stream."""
    rng = np.random.RandomState(2)
    stream = [(rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)
              for _ in range(4)]
    expected = [predictor.detect_batch(b) for b in stream]
    got = list(predictor.detect_batches(iter(stream), depth=2))
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert len(g) == len(e)
        for gb, eb in zip(g, e):
            assert len(gb) == len(eb)
            for a, b in zip(gb, eb):
                np.testing.assert_allclose(a, b, rtol=1e-5)
