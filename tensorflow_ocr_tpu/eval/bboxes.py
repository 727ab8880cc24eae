"""Detection-to-GT matching (Pascal-VOC greedy, ICDAR ignore handling).

Rebuild of /root/reference/tool/bboxes.py (orphaned there — its imports are
broken, SURVEY.md §2.6):

- bboxes_matching (bboxes.py:158-245): score-sorted greedy matching at
  IoU > 0.5, each GT matched at most once, detections matching ignored GT
  counted neither TP nor FP.
- bboxes_jaccard  (bboxes.py:247-282): the reference rasterizes 4000x4000
  masks per pair in a py_func; we compute exact convex-polygon IoU
  (utils/nms.quad_iou) — validated against mask rasterization in tests.
- bboxes_resize / filter_overlap / intersection (bboxes.py:22-128) became
  the crop bookkeeping inside data/icdar.crop_area.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from tensorflow_ocr_tpu.utils.nms import quad_iou


def bboxes_jaccard(quad: np.ndarray, quads: np.ndarray) -> np.ndarray:
    """IoU of one (4,2) quad against (N,4,2) quads."""
    return np.array([quad_iou(quad, q) for q in quads], np.float32)


def _intersection_over_det(det: np.ndarray, gt: np.ndarray) -> float:
    """Intersection area / detection area (the ICDAR don't-care measure)."""
    import cv2

    det = det.astype(np.float32)
    inter, _ = cv2.intersectConvexConvex(det, gt.astype(np.float32))
    x, y = det[:, 0], det[:, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    return float(inter / area) if area > 0 else 0.0


def bboxes_matching(
    det_quads: np.ndarray,      # (N, 4, 2), any order
    det_scores: np.ndarray,     # (N,)
    gt_quads: np.ndarray,       # (M, 4, 2)
    gt_ignored: np.ndarray,     # (M,) bool
    matching_threshold: float = 0.5,
    icdar_dontcare: bool = True,
) -> Tuple[int, np.ndarray, np.ndarray]:
    """Greedy match in descending score order.

    Returns (n_gt_not_ignored, tp (N,), fp (N,)) — per-detection arrays in
    the ORIGINAL detection order, like the reference's gather-back at
    bboxes.py:236-244.

    icdar_dontcare: use the official ICDAR-2015 don't-care rule — a
    detection whose intersection-over-own-area with any ignored GT exceeds
    0.5 is excluded entirely (neither TP nor FP). With False, the
    reference's simpler IoU-match rule applies instead.
    """
    n = len(det_quads)
    m = len(gt_quads)
    tp = np.zeros(n, bool)
    fp = np.zeros(n, bool)
    gt_match = np.zeros(m, bool)
    gt_ignored = np.asarray(gt_ignored, bool)
    n_gt = int((~gt_ignored).sum()) if m else 0
    if n == 0:
        return n_gt, tp, fp
    dontcare = gt_quads[gt_ignored] if (m and icdar_dontcare) else []
    order = np.argsort(-np.asarray(det_scores))
    for i in order:
        if len(dontcare):
            ioa = max(
                _intersection_over_det(det_quads[i], dc) for dc in dontcare
            )
            if ioa > 0.5:
                continue  # excluded: neither TP nor FP
        if m == 0:
            fp[i] = True
            continue
        ious = bboxes_jaccard(det_quads[i], gt_quads)
        j = int(np.argmax(ious))
        jmax = ious[j]
        if jmax > matching_threshold:
            if gt_ignored[j]:
                continue  # neither TP nor FP (bboxes.py ignore rule)
            if not gt_match[j]:
                gt_match[j] = True
                tp[i] = True
            else:
                fp[i] = True  # duplicate detection of a matched GT
        else:
            fp[i] = True
    return n_gt, tp, fp
