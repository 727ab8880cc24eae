"""Locality-aware NMS for EAST quads (host-side NumPy).

The EAST paper merges row-adjacent detections by weighted average before a
standard polygon NMS. The reference repo delegates this to checkpoints of
the argman/EAST lineage but ships no NMS of its own; this fills the gap for
the EAST model family (BASELINE config #2/#4).
"""

from __future__ import annotations

import numpy as np


def _poly_area(p):
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _clip_polygon(subject, clip):
    """Sutherland-Hodgman convex clip; both (N,2) arrays, clip convex."""
    output = list(subject)
    for i in range(len(clip)):
        a, b = clip[i], clip[(i + 1) % len(clip)]
        input_list, output = output, []
        if not input_list:
            break
        edge = b - a

        def inside(p):
            return edge[0] * (p[1] - a[1]) - edge[1] * (p[0] - a[0]) >= 0

        s = input_list[-1]
        for e in input_list:
            if inside(e):
                if not inside(s):
                    output.append(_intersect(s, e, a, b))
                output.append(e)
            elif inside(s):
                output.append(_intersect(s, e, a, b))
            s = e
    return np.array(output) if output else np.zeros((0, 2))


def _intersect(p1, p2, a, b):
    d1, d2 = p2 - p1, b - a
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    if abs(denom) < 1e-12:
        return p1
    t = ((a[0] - p1[0]) * d2[1] - (a[1] - p1[1]) * d2[0]) / denom
    return p1 + t * d1


def quad_iou(p1: np.ndarray, p2: np.ndarray) -> float:
    """Polygon IoU of two convex quads (exact clip, not rasterized).

    Uses OpenCV's native intersectConvexConvex when available (the pure-
    Python Sutherland-Hodgman fallback is ~100x slower, which matters in
    the O(N^2) NMS loops).
    """
    try:
        import cv2

        a1 = _poly_area(p1)
        a2 = _poly_area(p2)
        inter, _ = cv2.intersectConvexConvex(
            p1.astype(np.float32), p2.astype(np.float32)
        )
        union = a1 + a2 - inter
        return float(inter / union) if union > 0 else 0.0
    except Exception:
        pass
    inter_poly = _clip_polygon(p1.astype(np.float64), p2.astype(np.float64))
    if len(inter_poly) < 3:
        return 0.0
    inter = _poly_area(inter_poly)
    union = _poly_area(p1) + _poly_area(p2) - inter
    return float(inter / union) if union > 0 else 0.0


def _weighted_merge(g: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Score-weighted vertex average of two (9,) rows [8 coords + score]."""
    out = np.empty(9)
    out[:8] = (g[8] * g[:8] + p[8] * p[:8]) / (g[8] + p[8])
    out[8] = g[8] + p[8]
    return out


def standard_nms(polys: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy score-ordered NMS on (N, 9) rows.

    The exact quad IoU runs only for pairs whose axis-aligned bounding
    boxes overlap (vectorized prefilter) — without it the O(N^2) Python
    pair loop on a dense early-training score map (2k candidates) takes
    minutes per image.
    """
    if len(polys) == 0:
        return polys
    quads = polys[:, :8].reshape(-1, 4, 2)
    xmin, ymin = quads[:, :, 0].min(1), quads[:, :, 1].min(1)
    xmax, ymax = quads[:, :, 0].max(1), quads[:, :, 1].max(1)
    order = np.argsort(-polys[:, 8])
    keep = []
    suppressed = np.zeros(len(polys), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        pi = quads[i]
        overlap = ~suppressed & (xmin <= xmax[i]) & (xmax >= xmin[i]) \
            & (ymin <= ymax[i]) & (ymax >= ymin[i])
        overlap[i] = False
        for j in np.flatnonzero(overlap):
            if quad_iou(pi, quads[j]) > thresh:
                suppressed[j] = True
    return polys[keep]


def locality_aware_nms(polys: np.ndarray, thresh: float = 0.3,
                       max_candidates: int = 1024) -> np.ndarray:
    """EAST locality-aware NMS.

    polys: (N, 9) float — rows are raster-order detections
    [x0,y0,...,x3,y3,score]. Row-adjacent quads with IoU > thresh are
    merged by score-weighted averaging first, then standard NMS runs on
    the merged set.
    """
    if len(polys) == 0:
        return polys.reshape(0, 9)
    if max_candidates and len(polys) > max_candidates:
        # keep the top-K by score but preserve raster order (the merge
        # pass depends on row adjacency)
        import warnings

        warnings.warn(
            f"locality_aware_nms: {len(polys)} candidates capped to the "
            f"top {max_candidates} by score (cfg.infer.nms_max_candidates; "
            f"0 disables)", RuntimeWarning, stacklevel=2)
        top = np.argpartition(-polys[:, 8], max_candidates)[:max_candidates]
        polys = polys[np.sort(top)]
    merged = []
    g = None
    for p in polys:
        if g is not None and quad_iou(
            g[:8].reshape(4, 2), p[:8].reshape(4, 2)
        ) > thresh:
            g = _weighted_merge(g, p)
        else:
            if g is not None:
                merged.append(g)
            g = p.copy()
    if g is not None:
        merged.append(g)
    return standard_nms(np.array(merged), thresh)
