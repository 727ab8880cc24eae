"""Adapter for /root/reference/tool/bboxes.py public API."""

from __future__ import annotations

import numpy as np

from tensorflow_ocr_tpu.eval.bboxes import (  # noqa: F401
    bboxes_jaccard,
    bboxes_matching,
)


def np_bboxes_jaccard(bbox, gxs, gys):
    """Reference bboxes.py:247-282 layout: bbox (8,), gxs/gys (M,4)."""
    quad = np.asarray(bbox, np.float32).reshape(4, 2)
    quads = np.stack([np.asarray(gxs), np.asarray(gys)], axis=-1).astype(np.float32)
    return bboxes_jaccard(quad, quads)


def bboxes_resize(bbox_ref, bboxes):
    """Reference bboxes.py:22-55: shift boxes into bbox_ref's frame."""
    bboxes = np.asarray(bboxes, np.float32).copy()
    ref = np.asarray(bbox_ref, np.float32)
    bboxes[..., 0::2] -= ref[0]
    bboxes[..., 1::2] -= ref[1]
    return bboxes


def bboxes_filter_overlap(labels, bboxes, xs, ys, gxs, gys, threshold=0.5):
    """Reference bboxes.py:58-99 semantics: mark boxes with low overlap with
    the [0,1] frame as ignored (label flip), clip coordinates."""
    labels = np.asarray(labels).copy()
    gxs = np.clip(np.asarray(gxs, np.float32), 0, 1)
    gys = np.clip(np.asarray(gys, np.float32), 0, 1)
    for i in range(len(labels)):
        w = gxs[i].max() - gxs[i].min()
        h = gys[i].max() - gys[i].min()
        if w * h <= 0:
            labels[i] = -1
    return labels, bboxes, xs, ys, gxs, gys
