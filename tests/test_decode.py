"""Decode path vs golden DFS/cv2 re-executions of the reference algorithms."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from tensorflow_ocr_tpu.ops import decode as D
from tensorflow_ocr_tpu.ops.labels import LINK_OFFSETS
from tensorflow_ocr_tpu.utils import nms as N


def _golden_components(pixel_mask, link_scores, thresh):
    """Spec re-execution of test_pixellink_fast.py:114-178 (DFS grouping),
    generalized to the full map (no 1-px border skip)."""
    h, w = pixel_mask.shape
    graph = {}
    for y in range(h):
        for x in range(w):
            if not pixel_mask[y, x]:
                continue
            nb = []
            for c, (dx, dy) in enumerate(LINK_OFFSETS):
                ny, nx = y + dy, x + dx
                if 0 <= ny < h and 0 <= nx < w:
                    if link_scores[y, x, c] > thresh and pixel_mask[ny, nx]:
                        nb.append(ny * w + nx)
            graph[y * w + x] = nb
    # undirected closure (weak connectivity), then DFS
    undirected = {k: set(v) for k, v in graph.items()}
    for k, vs in graph.items():
        for v in vs:
            undirected.setdefault(v, set()).add(k)
    seen = {}
    gid = 0
    for start in sorted(undirected):
        if start in seen:
            continue
        gid += 1
        stack = [start]
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen[v] = gid
            stack.extend(undirected.get(v, ()))
    out = np.zeros((h, w), np.int32)
    for v, g in seen.items():
        out[v // w, v % w] = g
    return out


def _labels_to_partition(labels, mask):
    """Normalize a label map to a canonical partition id map."""
    out = np.zeros_like(labels)
    mapping = {}
    nxt = 1
    h, w = labels.shape
    for y in range(h):
        for x in range(w):
            if not mask[y, x]:
                continue
            v = labels[y, x]
            if v not in mapping:
                mapping[v] = nxt
                nxt += 1
            out[y, x] = mapping[v]
    return out


def test_pixel_link_mask_corrected_semantics():
    scores = np.full((4, 4), 0.9, np.float32)
    links = np.full((4, 4, 8), 0.95, np.float32)
    links[1, 1, 3] = 0.5  # one bad link kills the pixel
    m = np.asarray(D.pixel_link_mask(jnp.array(scores), jnp.array(links), 0.8, 0.8))
    assert not m[1, 1] and m[0, 0] and m[3, 3]


def test_pixel_link_mask_compat_mode_no_filter():
    scores = np.full((4, 4), 0.9, np.float32)
    links = np.zeros((4, 4, 8), np.float32)
    m = np.asarray(
        D.pixel_link_mask(jnp.array(scores), jnp.array(links), 0.8, 0.8,
                          compat_reference_bugs=True)
    )
    assert m.all()


def test_connected_components_two_blobs():
    h, w = 16, 24
    mask = np.zeros((h, w), bool)
    mask[2:6, 2:10] = True
    mask[10:14, 12:20] = True
    links = np.ones((h, w, 8), np.float32)
    edges = D.link_adjacency(jnp.array(mask), jnp.array(links), 0.5)
    labels = np.asarray(D.connected_components(edges, jnp.array(mask)))
    golden = _golden_components(mask, np.ones((h, w, 8)), 0.5)
    got = _labels_to_partition(labels, mask)
    want = _labels_to_partition(golden, mask)
    np.testing.assert_array_equal(got, want)
    assert len(np.unique(got[mask])) == 2


def test_connected_components_link_cut():
    """Two touching blobs stay separate when the links across the seam are off."""
    h, w = 8, 16
    mask = np.zeros((h, w), bool)
    mask[2:6, 2:14] = True
    links = np.ones((h, w, 8), np.float32)
    # cut all links crossing column 7/8 in both directions
    links[:, 7, 3] = 0.0   # right from col 7
    links[:, 7, 4] = 0.0   # right_down
    links[:, 7, 5] = 0.0   # right_up
    links[:, 8, 0] = 0.0   # left from col 8
    links[:, 8, 1] = 0.0   # left_down
    links[:, 8, 2] = 0.0   # left_up
    edges = D.link_adjacency(jnp.array(mask), jnp.array(links), 0.5)
    labels = np.asarray(D.connected_components(edges, jnp.array(mask)))
    got = _labels_to_partition(labels, mask)
    golden = _golden_components(mask, links, 0.5)
    want = _labels_to_partition(golden, mask)
    np.testing.assert_array_equal(got, want)
    assert len(np.unique(got[mask])) == 2


def test_connected_components_random_vs_dfs(rng):
    h, w = 24, 32
    mask = rng.rand(h, w) > 0.55
    links = rng.rand(h, w, 8).astype(np.float32)
    edges = D.link_adjacency(jnp.array(mask), jnp.array(links), 0.6)
    labels = np.asarray(D.connected_components(edges, jnp.array(mask)))
    golden = _golden_components(mask, links, 0.6)
    got = _labels_to_partition(labels, mask)
    want = _labels_to_partition(golden, mask)
    np.testing.assert_array_equal(got, want)


def test_extract_components_filters_and_boxes():
    h, w = 32, 48
    mask = np.zeros((h, w), bool)
    mask[4:10, 4:28] = True      # 144 px blob
    mask[20:22, 40:43] = True    # 6 px blob -> filtered (<=10)
    links = np.ones((h, w, 8), np.float32)
    edges = D.link_adjacency(jnp.array(mask), jnp.array(links), 0.5)
    labels = D.connected_components(edges, jnp.array(mask))
    boxes, sizes, valid = D.extract_components(labels, max_components=16, min_size=10)
    boxes, sizes, valid = map(np.asarray, (boxes, sizes, valid))
    assert valid.sum() == 1
    big = boxes[valid][0]
    # min-area rect of the axis-aligned blob: corners ~(4,4)-(27,9)
    assert big[:, 0].min() == pytest.approx(4, abs=1.0)
    assert big[:, 0].max() == pytest.approx(27, abs=1.0)
    assert big[:, 1].min() == pytest.approx(4, abs=1.0)
    assert big[:, 1].max() == pytest.approx(9, abs=1.0)


def test_full_decode_vs_cv2_on_rotated_blob():
    h, w = 48, 64
    mask_img = np.zeros((h, w), np.uint8)
    rect = ((30, 22), (36, 10), 25.0)  # center, size, angle
    box = cv2.boxPoints(rect).astype(np.int32)
    cv2.fillPoly(mask_img, [box], 1)
    scores = mask_img.astype(np.float32)
    links = np.ones((h, w, 8), np.float32)
    boxes, sizes, valid = D.pixellink_decode(
        jnp.array(scores), jnp.array(links), 0.5, 0.5,
        min_size=10, max_components=8, num_angles=180,
    )
    boxes, valid = np.asarray(boxes), np.asarray(valid)
    assert valid.sum() == 1
    got = boxes[valid][0]
    pts = np.argwhere(mask_img > 0)[:, ::-1].astype(np.float32)
    cv_box = cv2.boxPoints(cv2.minAreaRect(pts))
    got_area = np.linalg.norm(got[1] - got[0]) * np.linalg.norm(got[2] - got[1])
    cv_area = rect[1][0] * rect[1][1]
    assert got_area == pytest.approx(cv_area, rel=0.15)
    # centers agree
    np.testing.assert_allclose(got.mean(0), cv_box.mean(0), atol=1.5)


def test_east_detect_shapes_and_restore():
    h, w = 32, 32
    score = np.zeros((h, w), np.float32)
    score[10, 12] = 0.95
    geo = np.zeros((h, w, 5), np.float32)
    geo[10, 12] = [8, 16, 8, 16, 0.0]
    quads, scores, valid = D.east_detect(jnp.array(score), jnp.array(geo),
                                         0.8, max_boxes=16)
    quads, scores, valid = map(np.asarray, (quads, scores, valid))
    assert valid.sum() == 1
    q = quads[0]
    # pixel (12,10)*4 = (48,40); box extends 16 l/r and 8 u/d
    np.testing.assert_allclose(sorted(q[:, 0]), [32, 32, 64, 64], atol=0.1)
    np.testing.assert_allclose(sorted(q[:, 1]), [32, 32, 48, 48], atol=0.1)


def test_quad_iou_exact():
    a = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float32)
    b = a + [5, 0]
    assert N.quad_iou(a, a) == pytest.approx(1.0)
    assert N.quad_iou(a, b) == pytest.approx(50 / 150, abs=1e-6)
    assert N.quad_iou(a, a + [20, 20]) == 0.0


def test_locality_aware_nms_merges_row_neighbors():
    base = np.array([0, 0, 10, 0, 10, 10, 0, 10], np.float32)
    rows = []
    for dx in (0.0, 0.5, 1.0):
        rows.append(np.concatenate([base + np.tile([dx, 0], 4), [0.9]]))
    far = np.concatenate([base + np.tile([100.0, 0], 4), [0.8]])
    rows.append(far)
    out = N.locality_aware_nms(np.stack(rows), 0.3)
    assert len(out) == 2  # 3 merged into 1, plus the far one
    merged = out[np.argmax(out[:, 8])]
    assert merged[8] == pytest.approx(2.7)  # scores summed on merge


def test_extract_components_budget_overflow_stays_finite():
    """When foreground exceeds the compaction budget, components whose
    pixels were all dropped must be invalidated instead of emitting
    +/-inf segment sentinels as box coordinates."""
    import numpy as np
    import jax.numpy as jnp
    from tensorflow_ocr_tpu.ops.decode import (
        connected_components, extract_components, link_adjacency,
    )

    # dense foreground: everything is one big component + a distant blob
    mask = np.ones((16, 16), bool)
    mask[:, 7] = False
    mask[12:, :] = False
    mask[14:, 12:] = True                             # trailing blob
    links = jnp.ones((16, 16, 8), jnp.float32)
    edges = link_adjacency(jnp.asarray(mask), links, 0.5)
    labels = connected_components(edges, jnp.asarray(mask))
    boxes, sizes, valid = extract_components(
        labels, max_components=8, min_size=1, max_pixels=32)
    boxes = np.asarray(boxes)
    valid = np.asarray(valid)
    assert np.all(np.isfinite(boxes))
    # every surviving component has finite, sane coordinates
    for k in np.where(valid)[0]:
        assert np.all(np.abs(boxes[k]) <= 32)
    # partially-truncated components (box fit to a raster-order prefix of
    # their pixels) must NOT pass as valid — the dominant component here
    # has far more pixels than the 32-pixel budget
    assert not np.any(valid)
    # with an ample budget the same labels produce exact, valid boxes
    boxes2, sizes2, valid2 = extract_components(
        labels, max_components=8, min_size=1, max_pixels=512)
    assert np.asarray(valid2).sum() >= 2


def test_overflow_retry_detection_and_full_budget_heal():
    """overflow_retry_needed: True exactly on the budget-overflow outcome
    (size-qualified component invalidated), False on a clean decode or on
    components failing min_size alone; a full-budget re-run heals it —
    the Predictor/eval_hook self-healing contract (VERDICT r4 item 5)."""
    import numpy as np
    import jax.numpy as jnp
    from tensorflow_ocr_tpu.ops.decode import (
        connected_components, extract_components, link_adjacency,
        overflow_retry_needed, pixellink_decode,
    )

    mask = np.ones((16, 16), bool)
    links = jnp.ones((16, 16, 8), jnp.float32)
    edges = link_adjacency(jnp.asarray(mask), links, 0.5)
    labels = connected_components(edges, jnp.asarray(mask))

    # overflow: 256 foreground px vs a 32-px budget
    _, sizes, valid = extract_components(
        labels, max_components=8, min_size=5, max_pixels=32)
    assert overflow_retry_needed(sizes, valid, min_size=5)

    # the prescribed heal: re-run with max_pixels = h*w -> exact & clean
    _, sizes_f, valid_f = extract_components(
        labels, max_components=8, min_size=5, max_pixels=256)
    assert not overflow_retry_needed(sizes_f, valid_f, min_size=5)
    assert np.asarray(valid_f).sum() == 1  # the single dense component

    # min_size-only rejection must NOT trigger a retry
    ps = jnp.zeros((16, 16), jnp.float32).at[2, 2].set(1.0)
    ls = jnp.ones((16, 16, 8), jnp.float32)
    _, sizes_s, valid_s = pixellink_decode(ps, ls, 0.5, 0.5, min_size=10)
    assert not np.asarray(valid_s).any()
    assert not overflow_retry_needed(sizes_s, valid_s, min_size=10)


def test_pixellink_decode_fuzz_no_nonfinite():
    """Property: decode never emits non-finite box coordinates or
    negative sizes, across random dense/sparse score maps and threshold
    values (thresholds are traced, so this also covers the dynamic-
    threshold path with a single compile)."""
    import numpy as np
    import jax.numpy as jnp
    from tensorflow_ocr_tpu.ops.decode import pixellink_decode

    rng = np.random.RandomState(7)
    for trial in range(6):
        h, w = 32, 48
        density = rng.choice([0.05, 0.3, 0.9])
        ps = jnp.asarray(
            (rng.rand(h, w) < density) * rng.rand(h, w), jnp.float32)
        ls = jnp.asarray(rng.rand(h, w, 8), jnp.float32)
        pt = float(rng.choice([0.1, 0.5, 0.8]))
        lt = float(rng.choice([0.3, 0.9]))
        boxes, sizes, valid = pixellink_decode(
            ps, ls, pt, lt, min_size=int(rng.choice([1, 10])),
            max_components=32)
        boxes = np.asarray(boxes)
        sizes = np.asarray(sizes)
        assert np.all(np.isfinite(boxes)), trial
        assert np.all(sizes >= 0), trial
        assert np.asarray(valid).dtype == np.bool_
