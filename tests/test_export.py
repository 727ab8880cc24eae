"""Serving export (tensorflow_ocr_tpu/export.py): StableHLO round-trip.

The exported program must reproduce the live Predictor's outputs exactly
(same trace), deserialize in a fresh context, and carry the decode
operating point in its metadata.
"""

import json
import os

import jax
import numpy as np
import pytest

from tensorflow_ocr_tpu.config import Config
from tensorflow_ocr_tpu.export import (
    META_FILE,
    PROGRAM_FILE,
    load_serving_bundle,
    save_serving_bundle,
)
from tensorflow_ocr_tpu.infer import Predictor


@pytest.fixture(scope="module")
def predictor():
    cfg = Config()
    cfg.model.name = "pixellink_resnet50"
    cfg.infer.checkpoint_path = "/nonexistent"  # fresh random weights
    return Predictor(cfg)


def test_bundle_roundtrip_matches_live(predictor, tmp_path):
    b, h, w = 1, 64, 64
    out = save_serving_bundle(str(tmp_path / "bundle"), predictor,
                              b, h, w, with_decode=False,
                              platforms=("cpu",))
    assert os.path.exists(os.path.join(out, PROGRAM_FILE))
    run, meta = load_serving_bundle(out)
    assert meta["model"] == "pixellink_resnet50"
    assert meta["operating_point"]["pixel"] == predictor.pixel_thresh

    rng = np.random.RandomState(0)
    images = rng.rand(b, h, w, 3).astype(np.float32) * 255

    got = run(predictor.variables, images)
    # live reference: same fn, direct jit
    from tensorflow_ocr_tpu.export import _serving_fn
    want = jax.jit(_serving_fn(predictor, False))(
        predictor.variables, images)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_bundle_with_decode_and_meta(predictor, tmp_path):
    out = save_serving_bundle(str(tmp_path / "b2"), predictor, 1, 64, 64,
                              with_decode=True, platforms=("cpu",))
    run, meta = load_serving_bundle(out)
    assert meta["with_decode"] is True
    images = np.zeros((1, 64, 64, 3), np.float32)
    res = run(predictor.variables, images)
    assert set(res) == {"boxes", "sizes", "valid"}
    # decoded shapes: (B, max_components, 4, 2) boxes at map resolution
    assert np.asarray(res["boxes"]).shape[0] == 1
    meta2 = json.load(open(os.path.join(out, META_FILE)))
    assert meta2["weights"].startswith("external")
