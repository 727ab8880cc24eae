"""Checkpoint-time threshold calibration (train/calibrate.py).

The operating point is swept on a TRAIN-split slice, stored next to the
checkpoints, and adopted by infer.Predictor — replacing the reference's
fixed decode thresholds (test.py:56, test_pixellink_fast.py:119-150)
that drift with the training recipe (QUALITY_r04 default-vs-swept gap).
"""

import json
import os

import numpy as np

from tensorflow_ocr_tpu.config import Config
from tensorflow_ocr_tpu.train.calibrate import (
    LINK_GRID,
    OPERATING_POINT_FILE,
    PIXEL_GRID,
    calibrate_and_store,
    calibrate_thresholds,
    load_operating_point,
    save_operating_point,
)


class _StubHook:
    """EvalDuringTraining stand-in with a known F landscape."""

    def __init__(self, best=(0.6, 0.7), east=False):
        self.images = np.zeros((1, 8, 8, 3))  # "has images"
        self.best = best
        self.east = east
        self.calls = 0

    def __call__(self, model, state, use_ema=True, pixel_thresh=None,
                 link_thresh=None, score_thresh=None, nms_thresh=None):
        self.calls += 1
        if self.east:
            d = abs(score_thresh - self.best[0]) + abs(
                nms_thresh - self.best[1])
        else:
            d = abs(pixel_thresh - self.best[0]) + abs(
                link_thresh - self.best[1])
        return {"fmean": 1.0 - d, "precision": 1.0, "recall": 1.0}


class _StubState:
    step = 123


def test_calibrate_finds_best_grid_point():
    cfg = Config()
    cfg.model.name = "pixellink_resnet50"
    hook = _StubHook(best=(0.6, 0.7))
    op = calibrate_thresholds(None, _StubState(), cfg, "/unused", hook=hook)
    assert op["pixel"] == 0.6 and op["link"] == 0.7
    assert hook.calls == len(PIXEL_GRID) * len(LINK_GRID)
    assert op["fmean"] == 1.0


def test_calibrate_east_family_grid():
    cfg = Config()
    cfg.model.name = "east_resnet50"
    hook = _StubHook(best=(0.7, 0.2), east=True)
    op = calibrate_thresholds(None, _StubState(), cfg, "/unused", hook=hook)
    assert op["score"] == 0.7 and op["nms"] == 0.2


def test_operating_point_roundtrip(tmp_path):
    op = {"pixel": 0.6, "link": 0.7, "fmean": 0.91}
    p = save_operating_point(str(tmp_path), op, step=500)
    assert os.path.basename(p) == OPERATING_POINT_FILE
    got = load_operating_point(str(tmp_path))
    assert got["pixel"] == 0.6 and got["link"] == 0.7 and got["step"] == 500
    # corrupt file -> None, never an exception
    with open(p, "w") as f:
        f.write("{not json")
    assert load_operating_point(str(tmp_path)) is None
    assert load_operating_point("/nonexistent_dir_xyz") is None


def test_calibrate_and_store_writes_with_step(tmp_path):
    cfg = Config()
    cfg.model.name = "pixellink_resnet50"
    hook = _StubHook(best=(0.5, 0.9))
    op = calibrate_and_store(None, _StubState(), cfg, "/unused",
                             str(tmp_path), hook=hook)
    assert op["pixel"] == 0.5
    rec = json.load(open(tmp_path / OPERATING_POINT_FILE))
    assert rec["step"] == 123 and rec["link"] == 0.9


def test_calibrate_no_images_returns_none(tmp_path):
    cfg = Config()
    cfg.model.name = "pixellink_resnet50"
    hook = _StubHook()
    hook.images = None
    assert calibrate_thresholds(None, _StubState(), cfg, "/u",
                                hook=hook) is None
    assert not (tmp_path / OPERATING_POINT_FILE).exists()


class _PlateauHook:
    """F landscape with a noisy spike at a plateau EDGE: the plateau is
    pixel in {0.5,0.6,0.7} x link in {0.5,0.7} at F=0.90, with a +eps/2
    spike at its corner (0.7, 0.5); far-off combos score poorly."""

    def __init__(self):
        self.images = np.zeros((1, 8, 8, 3))

    def __call__(self, model, state, use_ema=True, pixel_thresh=None,
                 link_thresh=None, **kw):
        on_plateau = pixel_thresh in (0.5, 0.6, 0.7) and \
            link_thresh in (0.5, 0.7)
        f = 0.90 if on_plateau else 0.40
        if (pixel_thresh, link_thresh) == (0.7, 0.5):
            f += 0.007  # small-slice noise spike at the plateau corner
        return {"fmean": f, "precision": 1.0, "recall": 1.0}


def test_calibrate_prefers_plateau_center_over_noisy_edge():
    cfg = Config()
    cfg.model.name = "pixellink_resnet50"
    op = calibrate_thresholds(None, _StubState(), cfg, "/unused",
                              hook=_PlateauHook())
    # the 0.907 spike sits at the plateau's corner; the centered pick
    # (0.6, x) generalizes better and must win under the eps band
    assert op["pixel"] == 0.6, op
    assert op["link"] in (0.5, 0.7)
