"""Property tests: invariants of label generation on random polygons."""

import numpy as np
import jax.numpy as jnp
import pytest

from tensorflow_ocr_tpu.ops import labels as L
from tensorflow_ocr_tpu.ops.rasterize import rasterize_instances


def _random_quads(rng, k, h, w):
    quads = np.zeros((k, 4, 2), np.float32)
    for i in range(k):
        cx, cy = rng.uniform(10, w - 10), rng.uniform(10, h - 10)
        bw, bh = rng.uniform(6, w / 3), rng.uniform(4, h / 4)
        ang = rng.uniform(0, np.pi)
        c, s = np.cos(ang), np.sin(ang)
        base = np.array(
            [[-bw / 2, -bh / 2], [bw / 2, -bh / 2],
             [bw / 2, bh / 2], [-bw / 2, bh / 2]], np.float32
        )
        quads[i] = base @ np.array([[c, -s], [s, c]], np.float32).T + [cx, cy]
    return quads


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_link_symmetry_within_instances(rng, seed):
    """If pixel p links to neighbor q (same instance), q links back to p
    in the opposite direction — except at map borders (forced to 1)."""
    r = np.random.RandomState(seed)
    h = w = 40
    quads = _random_quads(r, 3, h, w)
    valid = np.ones(3, bool)
    inst = np.asarray(rasterize_instances(jnp.array(quads), jnp.array(valid), h, w))
    link = np.asarray(L.link_map_from_instances(jnp.array(inst)))
    opposite = {0: 3, 3: 0, 1: 5, 5: 1, 2: 4, 4: 2, 6: 7, 7: 6}
    offsets = L.LINK_OFFSETS
    for c, (dx, dy) in enumerate(offsets):
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                if link[y, x, c] == 1 and inst[y, x] > 0:
                    ny, nx = y + dy, x + dx
                    if 1 <= ny < h - 1 and 1 <= nx < w - 1 and inst[ny, nx] == inst[y, x]:
                        assert link[ny, nx, opposite[c]] == 1


@pytest.mark.parametrize("seed", [3, 4])
def test_score_map_equals_union_of_instances(seed):
    r = np.random.RandomState(seed)
    h = w = 48
    quads = _random_quads(r, 4, h, w)
    valid = np.ones(4, bool)
    ig = np.zeros(4, bool)
    score, link, mask = L.pixellink_labels(
        jnp.array(quads), jnp.array(ig), jnp.array(valid), h, w, 0
    )
    inst = np.asarray(rasterize_instances(jnp.array(quads), jnp.array(valid), h, w))
    np.testing.assert_array_equal(np.asarray(score) > 0, inst > 0)


def test_links_zero_outside_text():
    h = w = 32
    quads = np.array([[[8, 8], [24, 8], [24, 16], [8, 16]]], np.float32)
    score, link, mask = L.pixellink_labels(
        jnp.array(quads), jnp.zeros(1, bool), jnp.ones(1, bool), h, w, 0
    )
    link = np.asarray(link)
    bg = np.asarray(score) == 0
    assert (link[bg] == 0).all()


def test_mask_only_zeroed_inside_flagged_instances():
    h = w = 48
    quads = np.stack([
        np.array([[4, 4], [20, 4], [20, 12], [4, 12]], np.float32),
        np.array([[30, 30], [44, 30], [44, 38], [30, 38]], np.float32),
    ])
    ig = np.array([False, True])
    score, link, mask = L.pixellink_labels(
        jnp.array(quads), jnp.array(ig), jnp.ones(2, bool), h, w, 0
    )
    mask = np.asarray(mask)
    inst = np.asarray(rasterize_instances(jnp.array(quads), jnp.ones(2, bool), h, w))
    assert (mask[inst == 2] == 0).all()
    assert (mask[inst != 2] == 1).all()
