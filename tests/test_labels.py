"""Label generation vs goldens.

Goldens re-execute the reference's algorithms (cv2.fillPoly raster + the
intended same-instance link rule of tool/pixellink_fn.py:9-47) in NumPy.
"""

import cv2
import numpy as np
import jax.numpy as jnp

from tensorflow_ocr_tpu.ops import labels as L
from tensorflow_ocr_tpu.ops import rasterize as R
from tensorflow_ocr_tpu.ops import geometry as G


def _pad_polys(polys, max_k=8):
    k = len(polys)
    out = np.zeros((max_k, 4, 2), np.float32)
    valid = np.zeros((max_k,), bool)
    if k:
        out[:k] = polys
        valid[:k] = True
    return out, valid


def _golden_link_map(inst):
    """Spec re-execution of pixellink_fn.py:9-47 link rule."""
    h, w = inst.shape
    link = np.zeros((h, w, 8), np.float32)
    offsets = L.LINK_OFFSETS
    for y in range(h):
        for x in range(w):
            v = inst[y, x]
            if v == 0:
                continue
            for c, (dx, dy) in enumerate(offsets):
                if x == 0 or x == w - 1 or y == 0 or y == h - 1:
                    link[y, x, c] = 1.0
                    continue
                ny, nx = y + dy, x + dx
                link[y, x, c] = 1.0 if inst[ny, nx] == v else 0.0
    return link


def test_rasterize_matches_cv2_fillpoly():
    h, w = 64, 80
    polys = [
        np.array([[5, 5], [30, 8], [28, 20], [4, 18]], np.float32),
        np.array([[40, 30], [70, 30], [70, 50], [40, 50]], np.float32),
    ]
    padded, valid = _pad_polys(polys)
    inst = np.asarray(R.rasterize_instances(jnp.array(padded), jnp.array(valid), h, w))

    golden = np.zeros((h, w), np.uint8)
    for i, p in enumerate(polys):
        cv2.fillPoly(golden, p.astype(np.int32)[None], i + 1)

    # identical up to boundary-pixel rounding: demand >97% pixel agreement
    # and exact interior match
    agree = (inst == golden).mean()
    assert agree > 0.97, f"agreement {agree}"
    interior = cv2.erode((golden > 0).astype(np.uint8), np.ones((3, 3), np.uint8))
    assert ((inst > 0) & (interior > 0)).sum() == interior.sum()


def test_overlap_later_poly_wins():
    h, w = 32, 32
    p1 = np.array([[2, 2], [20, 2], [20, 20], [2, 20]], np.float32)
    p2 = np.array([[10, 10], [28, 10], [28, 28], [10, 28]], np.float32)
    padded, valid = _pad_polys([p1, p2])
    inst = np.asarray(R.rasterize_instances(jnp.array(padded), jnp.array(valid), h, w))
    assert inst[15, 15] == 2  # overlap region: later poly overwrites (icdar.py:508)
    assert inst[5, 5] == 1


def test_link_map_same_instance_rule():
    h, w = 24, 40
    p1 = np.array([[2, 4], [18, 4], [18, 12], [2, 12]], np.float32)
    p2 = np.array([[19, 4], [36, 4], [36, 12], [19, 12]], np.float32)  # adjacent
    padded, valid = _pad_polys([p1, p2])
    inst = np.asarray(R.rasterize_instances(jnp.array(padded), jnp.array(valid), h, w))
    link = np.asarray(L.link_map_from_instances(jnp.array(inst)))
    golden = _golden_link_map(inst)
    np.testing.assert_array_equal(link, golden)


def test_pixellink_labels_masks():
    h, w = 64, 64
    big = np.array([[4, 4], [40, 4], [40, 30], [4, 30]], np.float32)
    tiny = np.array([[50, 50], [54, 50], [54, 54], [50, 54]], np.float32)  # < min size
    ignored = np.array([[4, 40], [30, 40], [30, 60], [4, 60]], np.float32)
    padded, valid = _pad_polys([big, tiny, ignored])
    ig = np.zeros(8, bool)
    ig[2] = True
    score, link, mask = L.pixellink_labels(
        jnp.array(padded), jnp.array(ig), jnp.array(valid), h, w, min_text_size=10
    )
    score, mask = np.asarray(score), np.asarray(mask)
    # all three polys are in the score map (icdar.py:507 fills before masking)
    assert score[10, 10] == 1 and score[52, 52] == 1 and score[50, 10] == 1
    # mask zeroed inside tiny + ignored polys, kept elsewhere
    assert mask[52, 52] == 0 and mask[50, 10] == 0
    assert mask[10, 10] == 1 and mask[0, 0] == 1
    assert np.asarray(link).shape == (h, w, 8)


def test_pixellink_labels_batch_shapes():
    h = w = 64
    p = np.zeros((2, 8, 4, 2), np.float32)
    p[0, 0] = [[4, 4], [40, 4], [40, 30], [4, 30]]
    valid = np.zeros((2, 8), bool)
    valid[0, 0] = True
    ig = np.zeros((2, 8), bool)
    score, link, mask = L.pixellink_labels_batch(
        jnp.array(p), jnp.array(ig), jnp.array(valid), h, w, stride=4
    )
    assert score.shape == (2, 16, 16, 1)
    assert link.shape == (2, 16, 16, 8)
    assert mask.shape == (2, 16, 16, 1)
    assert np.asarray(score)[0].sum() > 0
    assert np.asarray(score)[1].sum() == 0  # empty image


def test_east_geo_maps_distances():
    h = w = 64
    rect = np.array([[8, 8], [40, 8], [40, 24], [8, 24]], np.float32)
    sorted_rect, angle = G.sort_rectangle(rect)
    padded, valid = _pad_polys([sorted_rect])
    rects = np.zeros((8, 4, 2), np.float32)
    rects[0] = sorted_rect
    angles = np.zeros((8,), np.float32)
    angles[0] = angle
    score, geo = L.east_geo_maps(
        jnp.array(padded), jnp.array(rects), jnp.array(angles),
        jnp.array(valid), h, w,
    )
    score, geo = np.asarray(score), np.asarray(geo)
    assert score[16, 20] == 1 and score[0, 0] == 0
    # pixel (x=20, y=16): d_top=8, d_right=20, d_bottom=8, d_left=12
    np.testing.assert_allclose(geo[16, 20, :4], [8, 20, 8, 12], atol=0.51)
    assert geo[16, 20, 4] == 0.0
    # restore round-trip through the inference path
    quad = G.restore_rectangle_rbox(
        np.array([[20.0, 16.0]], np.float32), geo[16, 20][None]
    )[0]
    got = quad[np.lexsort((quad[:, 1], quad[:, 0]))]
    want = sorted_rect[np.lexsort((sorted_rect[:, 1], sorted_rect[:, 0]))]
    np.testing.assert_allclose(got, want, atol=1.0)
