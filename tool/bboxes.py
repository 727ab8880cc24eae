"""Adapter for /root/reference/tool/bboxes.py public API.

Matching/IoU delegate to the framework's eval machinery; the crop
bookkeeping helpers (`bboxes_resize` / `bboxes_filter_overlap` /
`bboxes_intersection`, reference tool/bboxes.py:22-128) are full-semantics
numpy rebuilds of the TF originals. Reference conventions preserved:
boxes are `[ymin, xmin, ymax, xmax]` in normalized coordinates, `xs`/`ys`
carry the quad vertices (N, 4), and the reference frame after a crop is
`[0, 0, 1, 1]`.
"""

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


def bboxes_resize(bbox_ref, bboxes, xs=None, ys=None):
    """Express boxes relative to a crop window (reference bboxes.py:22-44).

    bbox_ref: (4,) [ymin, xmin, ymax, xmax] crop window; after the
    transform the window is [0, 0, 1, 1]. bboxes: (N, 4) same layout.
    xs/ys: optional (N, 4) quad vertex coordinates, translated and scaled
    by the window width/height respectively.

    Returns bboxes or (bboxes, xs, ys) when vertices are given.
    """
    ref = np.asarray(bbox_ref, np.float32)
    bboxes = np.asarray(bboxes, np.float32).copy()
    h_ref = ref[2] - ref[0]
    w_ref = ref[3] - ref[1]
    bboxes -= np.array([ref[0], ref[1], ref[0], ref[1]], np.float32)
    bboxes /= np.array([h_ref, w_ref, h_ref, w_ref], np.float32)
    if xs is None and ys is None:
        return bboxes
    xs = (np.asarray(xs, np.float32) - ref[1]) / w_ref
    ys = (np.asarray(ys, np.float32) - ref[0]) / h_ref
    return bboxes, xs, ys


def bboxes_intersection(bbox_ref, bboxes):
    """Relative intersection: area(box ∩ ref) / area(box)
    (reference bboxes.py:102-128). 0 where the box has no area."""
    ref = np.asarray(bbox_ref, np.float32)
    bboxes = np.asarray(bboxes, np.float32)
    int_ymin = np.maximum(bboxes[:, 0], ref[0])
    int_xmin = np.maximum(bboxes[:, 1], ref[1])
    int_ymax = np.minimum(bboxes[:, 2], ref[2])
    int_xmax = np.minimum(bboxes[:, 3], ref[3])
    h = np.maximum(int_ymax - int_ymin, 0.0)
    w = np.maximum(int_xmax - int_xmin, 0.0)
    inter = h * w
    vol = (bboxes[:, 2] - bboxes[:, 0]) * (bboxes[:, 3] - bboxes[:, 1])
    return np.where(vol > 0, inter / np.where(vol > 0, vol, 1.0), 0.0)


def bboxes_filter_overlap(labels, bboxes, xs, ys, threshold=0.5,
                          assign_negative=False):
    """Keep (or negate) boxes by relative overlap with the [0,0,1,1] frame
    (reference bboxes.py:69-99).

    assign_negative=False: drop rows with overlap <= threshold from every
    array. assign_negative=True: keep all rows, flip the label sign of the
    filtered ones (the SSD-style "ignore" convention).
    """
    labels = np.asarray(labels).copy()
    bboxes = np.asarray(bboxes, np.float32)
    xs = np.asarray(xs, np.float32)
    ys = np.asarray(ys, np.float32)
    scores = bboxes_intersection(
        np.array([0, 0, 1, 1], np.float32), bboxes
    )
    mask = scores > threshold
    if assign_negative:
        labels = np.where(mask, labels, -labels)
        return labels, bboxes, xs, ys
    return labels[mask], bboxes[mask], xs[mask], ys[mask]
