"""Adapter for /root/reference/tool/pixellink_fn.py public API.

- generate_rbox(h, w, xs, ys, bboxes, ignored): stride-4 score/link label
  maps from normalized quads (reference :53-110) — device kernels, numpy
  out. Links use the same-instance rule (reference :9-47).
- pixel_detect(score_map, geo_map, ...): corrected link filter
  (reference :120-154).
- valid_link(x, y, score_map, val, w, h, direction) (reference :9-47).
"""

from __future__ import annotations

import numpy as np

_DIRS = {
    "up": (0, -1), "down": (0, 1), "left": (-1, 0), "right": (1, 0),
    "left_up": (-1, -1), "left_down": (-1, 1),
    "right_up": (1, -1), "right_down": (1, 1),
}


def valid_link(x, y, score_map, val, w, h, direction):
    """Reference pixellink_fn.py:9-47 (same-instance neighbor check)."""
    if x == w - 1 or y == h - 1 or x == 0 or y == 0:
        return 1.0
    dx, dy = _DIRS[direction]
    return 1.0 if score_map[y + dy, x + dx] == val else 0.0


def generate_rbox(h, w, xs, ys, bboxes=None, ignored=None):
    """Reference pixellink_fn.py:53-110: stride-4 (score, link, show_bboxes).

    xs, ys: (K, 4) normalized [0,1] quad coordinates.
    """
    import jax.numpy as jnp

    from tensorflow_ocr_tpu.ops.labels import pixellink_labels_stride

    xs = np.asarray(xs, np.float32)
    ys = np.asarray(ys, np.float32)
    k = max(xs.shape[0], 1)
    polys = np.zeros((k, 4, 2), np.float32)
    valid = np.zeros((k,), bool)
    if xs.shape[0]:
        polys[: xs.shape[0], :, 0] = xs * w
        polys[: xs.shape[0], :, 1] = ys * h
        valid[: xs.shape[0]] = True
    ig = np.zeros((k,), bool)
    if ignored is not None and len(ignored):
        ig[: len(ignored)] = np.asarray(ignored).astype(bool)
    new_h, new_w = h // 4, w // 4
    score, link, _ = pixellink_labels_stride(
        jnp.asarray(polys), jnp.asarray(ig), jnp.asarray(valid),
        new_h, new_w, 4, 0,
    )
    show_bboxes = np.zeros((200, 4), np.float32)
    if bboxes is not None and len(bboxes):
        show_bboxes[: len(bboxes)] = np.asarray(bboxes, np.float32)[:200]
    return np.asarray(score, np.float32), np.asarray(link, np.float32), show_bboxes


def pixel_detect(score_map, geo_map, score_map_thresh=0.8, link_thresh=0.8):
    """Reference pixellink_fn.py:120-154 (the corrected filter loop).

    score_map: (h, w) or (1, h, w, 1); geo_map: (h, w, 8) link probs or the
    reference's stacked (8, 1, h, w, 2) softmax layout.
    """
    score_map = np.asarray(score_map)
    geo_map = np.asarray(geo_map)
    if score_map.ndim == 4:
        score_map = score_map[0, :, :, 0]
    if geo_map.ndim == 5:  # (8, 1, h, w, 2) stacked per-direction softmax
        geo_map = np.transpose(geo_map[:, 0, :, :, 1], (1, 2, 0))
    res = (score_map > score_map_thresh).astype(np.uint8)
    for i in range(8):
        res[geo_map[..., i] < link_thresh] = 0
    return res
