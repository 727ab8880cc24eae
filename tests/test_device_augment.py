"""On-device augmentation: similarity transforms, warps, poly bookkeeping.

The TPU-native replacement for the reference's host-worker augmentation
(/root/reference/datasets/icdar.py:576-619 random_scale + crop_area).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensorflow_ocr_tpu.config import DataConfig
from tensorflow_ocr_tpu.data import device_augment as DA
from tensorflow_ocr_tpu.ops import geometry as G


def _cfg(**kw):
    cfg = DataConfig(input_size=64, max_polys=4)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _rect(cx, cy, w, h, th):
    c, s = np.cos(th), np.sin(th)
    base = np.array(
        [[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]],
        np.float32,
    )
    R = np.array([[c, -s], [s, c]], np.float32)
    return base @ R.T + [cx, cy]


def test_sort_rectangle_jax_matches_numpy_reference():
    rng = np.random.RandomState(0)
    rects, refs_p, refs_a = [], [], []
    for _ in range(200):
        rect = _rect(*rng.uniform(50, 400, 2), *rng.uniform(5, 100, 2),
                     rng.uniform(-np.pi / 2, np.pi / 2))
        rect = np.roll(rect, rng.randint(4), axis=0)
        p, a = G.sort_rectangle(rect.copy())
        rects.append(rect)
        refs_p.append(p)
        refs_a.append(a)
    jp, ja = G.sort_rectangle_jax(jnp.asarray(np.stack(rects)))
    np.testing.assert_allclose(np.asarray(jp), np.stack(refs_p), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ja), np.array(refs_a), atol=1e-4)


def test_identity_transform_is_noop():
    cfg = _cfg()  # all augmentation off -> identity
    key = jax.random.PRNGKey(0)
    img = np.random.RandomState(1).randint(
        0, 255, (2, 64, 64, 3)).astype(np.uint8)
    polys = np.zeros((2, 4, 4, 2), np.float32)
    polys[0, 0] = _rect(30, 30, 20, 10, 0.0)
    batch = {
        "images": jnp.asarray(img),
        "polys": jnp.asarray(polys),
        "tags": jnp.zeros((2, 4), bool),
        "valid": jnp.asarray(polys.any((-2, -1))),
    }
    out = DA.augment_batch(key, batch, cfg, want_east=False)
    np.testing.assert_allclose(
        np.asarray(out["images"]), img.astype(np.float32), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["polys"]), polys, atol=1e-4)
    assert np.asarray(out["valid"])[0, 0]


def test_pure_rotation_transforms_polys_exactly():
    cfg = _cfg(use_rotate=True, max_rotate_deg=30.0)
    key = jax.random.PRNGKey(3)
    params = DA.sample_similarity_params(key, 3, cfg)
    M, t, Minv = DA.similarity_matrices(params, 64)
    # forward then inverse returns the original points
    pts = jnp.asarray(np.random.RandomState(0).uniform(0, 64, (3, 5, 2))
                      .astype(np.float32))
    fwd = DA.transform_points(pts, M, t)
    back = DA.transform_points(fwd - t[:, None, :], Minv,
                               jnp.zeros_like(t))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)
    # rotation preserves distances (similarity with s=1)
    d0 = np.linalg.norm(np.asarray(pts)[:, 0] - np.asarray(pts)[:, 1], axis=-1)
    d1 = np.linalg.norm(np.asarray(fwd)[:, 0] - np.asarray(fwd)[:, 1], axis=-1)
    np.testing.assert_allclose(d1, d0, rtol=1e-4)


def test_scale_changes_poly_size_proportionally():
    cfg = _cfg(use_random_scale=True, random_scale=(2.0,))
    params = DA.sample_similarity_params(jax.random.PRNGKey(0), 1, cfg)
    assert float(params["scale"][0]) == 2.0
    M, t, _ = DA.similarity_matrices(params, 64)
    poly = jnp.asarray(_rect(32, 32, 10, 6, 0.0)[None, None])  # (1,1,4,2)
    out = DA.transform_points(poly, M, t)
    w_out = np.linalg.norm(np.asarray(out)[0, 0, 1] - np.asarray(out)[0, 0, 0])
    assert w_out == pytest.approx(20.0, rel=1e-4)


def test_warp_rotates_image_content():
    """A bright vertical stripe rotated 90 deg becomes horizontal."""
    img = np.zeros((1, 64, 64, 3), np.float32)
    img[0, :, 30:34, :] = 255.0
    params = {
        "scale": jnp.ones((1,)),
        "angle": jnp.asarray([np.pi / 2], jnp.float32),
        "focal": jnp.full((1, 2), 32.0),
    }
    M, t, Minv = DA.similarity_matrices(params, 64)
    out = np.asarray(DA.warp_images(jnp.asarray(img), Minv, t))
    # center row bright across x, center column only bright near stripe
    row = out[0, 31, 10:54, 0]
    col = out[0, 10:54, 31, 0]
    assert (row > 200).mean() > 0.9
    assert (col > 200).mean() < 0.3


def test_out_of_frame_fill_is_imagenet_mean():
    img = np.full((1, 64, 64, 3), 255, np.uint8)
    params = {
        "scale": jnp.asarray([0.5], jnp.float32),  # shrink: borders empty
        "angle": jnp.zeros((1,)),
        "focal": jnp.full((1, 2), 32.0),
    }
    M, t, Minv = DA.similarity_matrices(params, 64)
    out = np.asarray(DA.warp_images(jnp.asarray(img), Minv, t))
    np.testing.assert_allclose(out[0, 1, 1], DA._FILL_RGB, atol=1.0)
    np.testing.assert_allclose(out[0, 32, 32], [255, 255, 255], atol=1.0)


def test_visibility_bookkeeping():
    """Fully-outside polys invalidated; partially-visible polys ignored."""
    cfg = _cfg(use_random_scale=True, random_scale=(2.0,))
    polys = np.zeros((1, 4, 4, 2), np.float32)
    polys[0, 0] = _rect(32, 32, 10, 6, 0.0)   # center: stays inside at 2x
    polys[0, 1] = _rect(4, 4, 6, 4, 0.0)      # corner: pushed out at 2x
    polys[0, 2] = _rect(16, 32, 14, 6, 0.0)   # mid-left: partially visible
    batch = {
        "images": jnp.zeros((1, 64, 64, 3), jnp.uint8),
        "polys": jnp.asarray(polys),
        "tags": jnp.zeros((1, 4), bool),
        "valid": jnp.asarray(polys.any((-2, -1))),
    }
    # no crop -> focal pinned at center, deterministic geometry
    out = DA.augment_batch(jax.random.PRNGKey(0), batch, cfg,
                           want_east=False)
    valid = np.asarray(out["valid"])[0]
    tags = np.asarray(out["tags"])[0]
    assert valid[0] and not tags[0]          # kept
    assert not valid[1]                      # fully outside
    assert valid[2] and tags[2]              # partial -> ignored
    assert not valid[3]                      # empty slot stays invalid


def test_east_rects_recanonicalized():
    cfg = _cfg(use_rotate=True, max_rotate_deg=40.0)
    rect = _rect(32, 32, 20, 8, 0.2)
    sorted_rect, angle = G.sort_rectangle(rect.copy())
    polys = np.zeros((1, 4, 4, 2), np.float32)
    polys[0, 0] = sorted_rect
    batch = {
        "images": jnp.zeros((1, 64, 64, 3), jnp.uint8),
        "polys": jnp.asarray(polys),
        "tags": jnp.zeros((1, 4), bool),
        "valid": jnp.asarray(polys.any((-2, -1))),
        "shrunk": jnp.asarray(polys),
        "rects": jnp.asarray(polys),
        "angles": jnp.asarray(np.full((1, 4), angle, np.float32)),
    }
    out = DA.augment_batch(jax.random.PRNGKey(7), batch, cfg, want_east=True)
    new_rect = np.asarray(out["rects"])[0, 0]
    new_angle = float(np.asarray(out["angles"])[0, 0])
    # the transformed rect must re-canonicalize to sort_rectangle semantics
    ref_rect, ref_angle = G.sort_rectangle(
        np.asarray(out["polys"])[0, 0].copy())
    # rects was transformed from the same corners -> same canonical output
    np.testing.assert_allclose(new_rect, ref_rect, atol=1e-2)
    assert new_angle == pytest.approx(ref_angle, abs=1e-3)
    assert -np.pi / 4 - 1e-6 <= new_angle <= np.pi / 4 + 1e-6
    # padded slots untouched
    np.testing.assert_array_equal(np.asarray(out["angles"])[0, 1:],
                                  np.full((3,), angle, np.float32))


def test_augment_batch_is_jittable():
    cfg = _cfg(use_crop=True, use_rotate=True, use_random_scale=True)
    batch = {
        "images": jnp.zeros((2, 64, 64, 3), jnp.uint8),
        "polys": jnp.zeros((2, 4, 4, 2), jnp.float32),
        "tags": jnp.zeros((2, 4), bool),
        "valid": jnp.zeros((2, 4), bool),
    }
    f = jax.jit(lambda k, b: DA.augment_batch(k, b, cfg, want_east=False))
    out = f(jax.random.PRNGKey(0), batch)
    assert out["images"].shape == (2, 64, 64, 3)
    assert out["images"].dtype == jnp.float32
