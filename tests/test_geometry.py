"""Geometry ops vs reference-spec golden values.

The golden expectations re-execute the reference algorithms
(/root/reference/datasets/icdar.py) as independent NumPy specs written from
the cited line ranges — not imports of the reference (it is py2/TF1).
"""

import numpy as np
import pytest

from tensorflow_ocr_tpu.ops import geometry as G


def test_polygon_area_clockwise_negative():
    # clockwise in image coords (y down): TL, TR, BR, BL
    poly = np.array([[0, 0], [10, 0], [10, 5], [0, 5]], np.float32)
    assert G.polygon_area(poly) == pytest.approx(-50.0)
    assert G.polygon_area(poly[::-1]) == pytest.approx(50.0)


def test_check_and_validate_polys_filters_and_reorders():
    h, w = 100, 200
    good = np.array([[5, 5], [50, 5], [50, 30], [5, 30]], np.float32)
    degenerate = np.array([[1, 1], [1, 1], [1, 1], [1, 1]], np.float32)
    wrong_dir = good[::-1]  # counter-clockwise
    polys = np.stack([good, degenerate, wrong_dir])
    tags = np.array([False, False, True])
    out_p, out_t = G.check_and_validate_polys(polys, tags, (h, w))
    assert out_p.shape == (2, 4, 2)
    # wrong-direction poly gets reordered with (0,3,2,1) (icdar.py:132)
    np.testing.assert_allclose(out_p[1], wrong_dir[(0, 3, 2, 1), :])
    assert list(out_t) == [False, True]


def test_check_and_validate_clips_to_bounds():
    poly = np.array([[-5, -5], [300, -5], [300, 150], [-5, 150]], np.float32)
    out_p, _ = G.check_and_validate_polys(
        poly[None], np.array([False]), (100, 200)
    )
    assert out_p[:, :, 0].max() == 199 and out_p[:, :, 1].max() == 99
    assert out_p.min() == 0


def test_shrink_poly_moves_inward():
    poly = np.array([[0, 0], [100, 0], [100, 20], [0, 20]], np.float32)
    r = np.array(
        [
            min(np.linalg.norm(poly[i] - poly[(i + 1) % 4]),
                np.linalg.norm(poly[i] - poly[(i - 1) % 4]))
            for i in range(4)
        ]
    )
    shrunk = G.shrink_poly(poly, r)
    # long edge pair moved by R*r = 0.3*20 = 6 in x; short pair in y
    np.testing.assert_allclose(shrunk[0], [6.0, 6.0], atol=1e-4)
    np.testing.assert_allclose(shrunk[1], [94.0, 6.0], atol=1e-4)
    np.testing.assert_allclose(shrunk[2], [94.0, 14.0], atol=1e-4)
    np.testing.assert_allclose(shrunk[3], [6.0, 14.0], atol=1e-4)


def test_sort_rectangle_axis_aligned():
    rect = np.array([[10, 5], [50, 5], [50, 25], [10, 25]], np.float32)
    for shift in range(4):
        rolled = np.roll(rect, shift, axis=0)
        sorted_rect, angle = G.sort_rectangle(rolled)
        assert angle == 0.0
        np.testing.assert_allclose(sorted_rect, rect)


def test_sort_rectangle_rotated_angle_sign():
    # rectangle rotated by +20 degrees (counter-clockwise in math coords)
    theta = np.deg2rad(20)
    c, s = np.cos(theta), np.sin(theta)
    base = np.array([[-20, -5], [20, -5], [20, 5], [-20, 5]], np.float32)
    rot = base @ np.array([[c, -s], [s, c]], np.float32).T + 100
    sorted_rect, angle = G.sort_rectangle(rot)
    assert abs(angle) == pytest.approx(theta, abs=1e-3)
    assert sorted_rect.shape == (4, 2)


def test_rectangle_from_parallelogram_rectangle_fixed_point():
    rect = np.array([[0, 0], [40, 0], [40, 10], [0, 10]], np.float32)
    fitted = G.rectangle_from_parallelogram(rect)
    np.testing.assert_allclose(fitted, rect, atol=1e-3)


def test_restore_rectangle_axis_aligned():
    # pixel at (8, 4) with distances top=4, right=12, bottom=6, left=8
    origin = np.array([[8.0, 4.0]], np.float32)
    geo = np.array([[4.0, 12.0, 6.0, 8.0, 0.0]], np.float32)
    quads = G.restore_rectangle_rbox(origin, geo)
    expected = np.array([[[0, 0], [20, 0], [20, 10], [0, 10]]], np.float32)
    np.testing.assert_allclose(quads, expected, atol=1e-4)


def test_restore_rectangle_roundtrip_rotated():
    """restore(geo(point)) must reproduce the rect for +/- angles."""
    for deg in (15.0, -15.0, 30.0, -30.0):
        theta = np.deg2rad(deg)
        c, s = np.cos(theta), np.sin(theta)
        rot = np.array([[c, -s], [s, c]], np.float32)
        base = np.array([[0, 0], [40, 0], [40, 10], [0, 10]], np.float32)
        center = base.mean(axis=0)
        quad = (base - center) @ rot.T + center + 50
        sorted_quad, angle = G.sort_rectangle(quad)
        # geometry at the rect's own p3 uses distances to the 4 edges
        pt = sorted_quad.mean(axis=0)
        d = [
            G.point_dist_to_line(sorted_quad[0], sorted_quad[1], pt),
            G.point_dist_to_line(sorted_quad[1], sorted_quad[2], pt),
            G.point_dist_to_line(sorted_quad[2], sorted_quad[3], pt),
            G.point_dist_to_line(sorted_quad[3], sorted_quad[0], pt),
        ]
        geo = np.array([d + [angle]], np.float32)
        restored = G.restore_rectangle_rbox(pt[None].astype(np.float32), geo)[0]
        # same rect up to vertex rotation; compare sorted corner sets
        got = restored[np.lexsort((restored[:, 1], restored[:, 0]))]
        want = sorted_quad[np.lexsort((sorted_quad[:, 1], sorted_quad[:, 0]))]
        np.testing.assert_allclose(got, want, atol=0.5)


def test_restore_rectangle_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    origin = rng.uniform(0, 100, size=(16, 2)).astype(np.float32)
    d = rng.uniform(1, 20, size=(16, 4)).astype(np.float32)
    angle = rng.uniform(-np.pi / 4, np.pi / 4, size=(16, 1)).astype(np.float32)
    geo = np.concatenate([d, angle], axis=1)
    got = np.asarray(G.restore_rectangle_rbox_jax(jnp.array(origin), jnp.array(geo)))
    # numpy version reorders rows (angle>=0 first) — compare per-row by sign
    want = np.concatenate(
        [
            G.restore_rectangle_rbox(origin[angle[:, 0] >= 0], geo[angle[:, 0] >= 0]),
            G.restore_rectangle_rbox(origin[angle[:, 0] < 0], geo[angle[:, 0] < 0]),
        ]
    )
    got_reordered = np.concatenate([got[angle[:, 0] >= 0], got[angle[:, 0] < 0]])
    np.testing.assert_allclose(got_reordered, want, atol=1e-3)


def test_order_points():
    box = np.array([[50, 50], [10, 10], [50, 10], [10, 50]], np.float32)
    ordered = G.order_points(box)
    np.testing.assert_array_equal(
        ordered, np.array([[10, 10], [50, 10], [50, 50], [10, 50]])
    )


def test_sort_poly():
    p = np.array([[10, 10], [50, 10], [50, 50], [10, 50]], np.int32)
    np.testing.assert_array_equal(G.sort_poly(p), p)


def test_min_area_rect_matches_cv2():
    import cv2
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    for _ in range(5):
        theta = rng.uniform(0, np.pi / 2)
        c, s = np.cos(theta), np.sin(theta)
        n = 200
        pts = rng.uniform(0, 1, size=(n, 2)) * [60, 12]
        pts = pts @ np.array([[c, -s], [s, c]]).T + 100
        pts = pts.astype(np.float32)
        cv_rect = cv2.minAreaRect(pts)
        cv_area = cv_rect[1][0] * cv_rect[1][1]
        box = np.asarray(
            G.min_area_rect_angles(jnp.array(pts), jnp.ones(n, bool), 180)
        )
        e1 = np.linalg.norm(box[1] - box[0])
        e2 = np.linalg.norm(box[2] - box[1])
        area = e1 * e2
        assert area <= cv_area * 1.05 + 1e-3
        assert area >= cv_area * 0.95 - 1e-3
