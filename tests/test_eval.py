"""Eval: matching rules, streaming P/R/F, directory evaluator."""

import numpy as np
import pytest

from tensorflow_ocr_tpu.eval.bboxes import bboxes_jaccard, bboxes_matching
from tensorflow_ocr_tpu.eval.metrics import (
    StreamingPRF,
    evaluate_icdar_directory,
    fmean,
    safe_divide,
)


def _quad(x, y, w, h):
    return np.array(
        [[x, y], [x + w, y], [x + w, y + h], [x, y + h]], np.float32
    )


def test_jaccard_against_rasterization(rng):
    """Exact polygon IoU vs the reference's mask-rasterization method
    (tool/bboxes.py:247-282 semantics)."""
    import cv2

    for _ in range(5):
        q1 = _quad(rng.randint(0, 50), rng.randint(0, 50),
                   rng.randint(20, 60), rng.randint(20, 60))
        q2 = _quad(rng.randint(0, 50), rng.randint(0, 50),
                   rng.randint(20, 60), rng.randint(20, 60))
        got = bboxes_jaccard(q1, q2[None])[0]
        m1 = np.zeros((160, 160), np.uint8)
        m2 = np.zeros((160, 160), np.uint8)
        cv2.fillPoly(m1, [q1.astype(np.int32)], 1)
        cv2.fillPoly(m2, [q2.astype(np.int32)], 1)
        inter = (m1 & m2).sum()
        union = (m1 | m2).sum()
        want = inter / union if union else 0.0
        assert got == pytest.approx(want, abs=0.05)


def test_matching_basic_tp_fp():
    gt = np.stack([_quad(0, 0, 20, 10), _quad(50, 50, 20, 10)])
    ignored = np.array([False, False])
    det = np.stack([_quad(1, 0, 20, 10), _quad(100, 100, 10, 10)])
    scores = np.array([0.9, 0.8])
    n_gt, tp, fp = bboxes_matching(det, scores, gt, ignored)
    assert n_gt == 2
    assert tp.tolist() == [True, False]
    assert fp.tolist() == [False, True]


def test_matching_duplicate_detection_is_fp():
    gt = _quad(0, 0, 20, 10)[None]
    det = np.stack([_quad(0, 0, 20, 10), _quad(1, 0, 20, 10)])
    scores = np.array([0.9, 0.8])
    n_gt, tp, fp = bboxes_matching(det, scores, gt, np.array([False]))
    assert tp.sum() == 1 and fp.sum() == 1


def test_icdar_dontcare_excludes_partial_overlap():
    """Official rule: a detection covering an ignored GT with >50% of its
    OWN area is excluded even if IoU with the GT is below threshold."""
    gt = _quad(0, 0, 100, 100)[None]  # large ignored region
    det = _quad(10, 10, 10, 10)[None]  # small det fully inside
    n_gt, tp, fp = bboxes_matching(
        det, np.array([0.9]), gt, np.array([True])
    )
    assert n_gt == 0 and tp.sum() == 0 and fp.sum() == 0  # excluded

    # with the rule off, the small det is a plain FP (IoU tiny)
    n_gt, tp, fp = bboxes_matching(
        det, np.array([0.9]), gt, np.array([True]), icdar_dontcare=False
    )
    assert fp.sum() == 1


def test_matching_ignored_gt_neither_tp_nor_fp():
    gt = _quad(0, 0, 20, 10)[None]
    det = _quad(0, 0, 20, 10)[None]
    n_gt, tp, fp = bboxes_matching(
        det, np.array([0.9]), gt, np.array([True])
    )
    assert n_gt == 0 and tp.sum() == 0 and fp.sum() == 0


def test_streaming_prf():
    prf = StreamingPRF()
    gt = np.stack([_quad(0, 0, 20, 10), _quad(50, 50, 20, 10)])
    det = _quad(0, 0, 20, 10)[None]
    prf.update(det, np.array([0.9]), gt, np.array([False, False]))
    prf.update(
        _quad(200, 200, 5, 5)[None], np.array([0.7]),
        np.zeros((0, 4, 2)), np.zeros(0, bool),
    )
    r = prf.result()
    assert r["tp"] == 1 and r["fp"] == 1 and r["n_gt"] == 2
    assert r["precision"] == pytest.approx(0.5)
    assert r["recall"] == pytest.approx(0.5)
    assert r["fmean"] == pytest.approx(0.5)


def test_safe_divide_and_fmean():
    assert safe_divide(1.0, 0.0) == 0.0
    assert fmean(0.0, 0.0) == 0.0
    assert fmean(1.0, 1.0) == 1.0


def test_evaluate_directory(tmp_path):
    gt_dir = tmp_path / "gt"
    res_dir = tmp_path / "res"
    gt_dir.mkdir()
    res_dir.mkdir()
    (gt_dir / "gt_img_1.txt").write_text(
        "0,0,20,0,20,10,0,10,text\n50,50,70,50,70,60,50,60,###\n"
    )
    (res_dir / "res_img_1.txt").write_text("0,0,20,0,20,10,0,10\r\n")
    r = evaluate_icdar_directory(str(res_dir), str(gt_dir))
    assert r["precision"] == 1.0 and r["recall"] == 1.0 and r["fmean"] == 1.0
