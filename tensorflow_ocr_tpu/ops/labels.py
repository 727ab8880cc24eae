"""Label-map generation (PixelLink 8-neighbor links + EAST RBOX geometry).

TPU-native replacement for the reference's label generators:

- PixelLink maps: /root/reference/datasets/icdar.py:486-539 (``generate_rbox``
  — despite the name it emits a score map + 8-channel link map) and
  /root/reference/tool/pixellink_fn.py:53-110 (the intended, instance-aware
  variant). The reference computes links with a per-pixel Python loop per
  data worker — its actual throughput ceiling (SURVEY.md §3.2). Here the
  whole thing is a handful of vectorized shifts over the instance-id raster,
  jittable and vmappable over the batch.

- EAST RBOX maps: the classic EAST geometry (4 edge distances + angle) that
  the surviving EAST heads consume (reference nets/model.py:33-82,
  icdar.py:410-483 restore path). The per-poly rectangle fit is host-side
  scalar work (see data/icdar.py); the dense per-pixel distance maps are
  computed here on device.

Link channel order (icdar.py:522-537, pixellink_fn.py:93-108,
test_pixellink_fast.py:124-146):
  0=left, 1=left_down, 2=left_up, 3=right, 4=right_down, 5=right_up,
  6=up, 7=down.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tensorflow_ocr_tpu.ops.rasterize import rasterize_instances

# (dx, dy) per link channel, matching the reference channel order.
LINK_OFFSETS = (
    (-1, 0),   # 0 left
    (-1, 1),   # 1 left_down
    (-1, -1),  # 2 left_up
    (1, 0),    # 3 right
    (1, 1),    # 4 right_down
    (1, -1),   # 5 right_up
    (0, -1),   # 6 up
    (0, 1),    # 7 down
)


def _shift2d(x: jnp.ndarray, dx: int, dy: int, fill) -> jnp.ndarray:
    """Shift a (H, W) map so out[y, x] = in[y + dy, x + dx], edge-filled."""
    h, w = x.shape
    out = x
    if dy != 0:
        pad = jnp.full((abs(dy), w), fill, x.dtype)
        if dy > 0:
            out = jnp.concatenate([out[dy:], pad], axis=0)
        else:
            out = jnp.concatenate([pad, out[:dy]], axis=0)
    if dx != 0:
        pad = jnp.full((h, abs(dx)), fill, x.dtype)
        if dx > 0:
            out = jnp.concatenate([out[:, dx:], pad], axis=1)
        else:
            out = jnp.concatenate([pad, out[:, :dx]], axis=1)
    return out


def link_map_from_instances(inst: jnp.ndarray) -> jnp.ndarray:
    """8-channel link map from an instance-id raster.

    Link c at (y, x) is 1 iff the pixel belongs to an instance AND its
    neighbor in direction c belongs to the *same instance* — the intended
    semantics of tool/pixellink_fn.py:9-47 (the primary-pipeline variant at
    icdar.py:83-105 checks any-text with transposed indices; that is the
    documented reference bug SURVEY.md §2.1 says not to reproduce).
    Border pixels of the map get link=1 in every direction when they belong
    to an instance (pixellink_fn.py:10-11 returns 1.0 at x/y extremes).

    inst: (H, W) int32. Returns (H, W, 8) float32.
    """
    h, w = inst.shape
    fg = inst > 0
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    on_border = (xs == 0) | (xs == w - 1) | (ys == 0) | (ys == h - 1)
    chans = []
    for dx, dy in LINK_OFFSETS:
        neigh = _shift2d(inst, dx, dy, 0)
        same = fg & (neigh == inst)
        chans.append(jnp.where(fg & on_border, True, same))
    return jnp.stack(chans, axis=-1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("height", "width", "min_text_size"))
def pixellink_labels(polys: jnp.ndarray, ignored: jnp.ndarray,
                     valid: jnp.ndarray, height: int, width: int,
                     min_text_size: int = 10):
    """Full-res PixelLink labels for one image, entirely on device.

    Mirrors reference icdar.py:486-539:
      - score_map: union raster of all polys (ignored ones included — the
        training_mask removes them from the loss, icdar.py:507,514-515);
      - training_mask: zeroed inside ignored polys and polys whose min side
        (as defined at icdar.py:510-511) is below ``min_text_size``;
      - link_map: 8-direction same-instance links.

    polys:   (K, 4, 2) float32 in pixel coords.
    ignored: (K,) bool ('###'/'*' tag, icdar.py:62-63).
    valid:   (K,) bool padding mask.
    Returns (score_map (H,W) f32, link_map (H,W,8) f32, training_mask (H,W) f32).
    """
    inst = rasterize_instances(polys, valid, height, width)
    score = (inst > 0).astype(jnp.float32)
    link = link_map_from_instances(inst)

    # Poly side lengths for the min-size mask (icdar.py:510-512).
    p = polys
    poly_h = jnp.minimum(
        jnp.linalg.norm(p[:, 0] - p[:, 3], axis=-1),
        jnp.linalg.norm(p[:, 1] - p[:, 2], axis=-1),
    )
    poly_w = jnp.minimum(
        jnp.linalg.norm(p[:, 0] - p[:, 1], axis=-1),
        jnp.linalg.norm(p[:, 2] - p[:, 3], axis=-1),
    )
    too_small = jnp.minimum(poly_h, poly_w) < float(min_text_size)
    mask_out = valid & (too_small | ignored)  # (K,)
    # A pixel is masked out if its instance is flagged. Instance ids are
    # k+1, so gather the flag by id (id 0 -> not masked).
    flag = jnp.concatenate([jnp.zeros((1,), bool), mask_out])
    masked = flag[inst]
    training_mask = jnp.where(masked, 0.0, 1.0)
    return score, link, training_mask


@functools.partial(jax.jit, static_argnames=("stride",))
def subsample_maps(score, link, mask, stride: int = 4):
    """Stride subsample, matching icdar.py:632-634 ([::4, ::4])."""
    return (
        score[::stride, ::stride],
        link[::stride, ::stride],
        mask[::stride, ::stride],
    )


@functools.partial(
    jax.jit, static_argnames=("out_height", "out_width", "stride", "min_text_size")
)
def pixellink_labels_stride(polys, ignored, valid, out_height: int,
                            out_width: int, stride: int = 4,
                            min_text_size: int = 10):
    """Stride-direct PixelLink labels (the production train-step path).

    Rasterizes straight onto the output grid (pixel (i,j) = full-res
    (j*stride, i*stride)), matching the intended pipeline's stride-4
    label generation (tool/pixellink_fn.py:84-108: NEAREST-resized masks,
    links computed between stride-4 neighbors). 16x cheaper than full-res
    raster + [::4]; the score map is bit-identical to the reference's
    subsample (same sample points), links differ only by the neighbor
    stride, which is the intended-pipeline convention.

    polys in FULL-RES coords. Returns (score (h,w), link (h,w,8),
    mask (h,w)) float32.
    """
    inst = rasterize_instances(
        polys / float(stride), valid, out_height, out_width
    )
    score = (inst > 0).astype(jnp.float32)
    link = link_map_from_instances(inst)

    p = polys  # size thresholds measured at full res (icdar.py:510-512)
    poly_h = jnp.minimum(
        jnp.linalg.norm(p[:, 0] - p[:, 3], axis=-1),
        jnp.linalg.norm(p[:, 1] - p[:, 2], axis=-1),
    )
    poly_w = jnp.minimum(
        jnp.linalg.norm(p[:, 0] - p[:, 1], axis=-1),
        jnp.linalg.norm(p[:, 2] - p[:, 3], axis=-1),
    )
    too_small = jnp.minimum(poly_h, poly_w) < float(min_text_size)
    mask_out = valid & (too_small | ignored)
    flag = jnp.concatenate([jnp.zeros((1,), bool), mask_out])
    training_mask = jnp.where(flag[inst], 0.0, 1.0)
    return score, link, training_mask


def pixellink_labels_batch(polys, ignored, valid, height: int, width: int,
                           min_text_size: int = 10, stride: int = 4):
    """vmapped batched label gen at output stride.

    polys (B,K,4,2), ignored (B,K), valid (B,K) ->
    score (B,h,w,1), link (B,h,w,8), mask (B,h,w,1) with h=H//stride.

    To exactly match the reference's [::4,::4] subsampling we rasterize at
    full res then subsample; for peak throughput callers can instead pass
    polys scaled by 1/stride with height/width pre-divided (stride=1),
    which rasterizes 16x fewer pixels — equivalent to the broken pipeline's
    stride-4 label gen (pixellink_fn.py:84-85, NEAREST resize).
    """
    def one(p, ig, va):
        s, l, m = pixellink_labels(p, ig, va, height, width, min_text_size)
        if stride > 1:
            s, l, m = s[::stride, ::stride], l[::stride, ::stride], m[::stride, ::stride]
        return s[..., None], l, m[..., None]

    return jax.vmap(one)(polys, ignored, valid)


def east_labels_batch(polys, shrunk, rects, angles, ignored, valid,
                      out_height: int, out_width: int, stride: int = 4,
                      min_text_size: int = 10, geometry: str = "RBOX"):
    """Batched EAST labels on the output grid: score, geo, training mask.

    The training mask is rasterized from the FULL polys (ignored or
    too-small instances zeroed), matching the PixelLink mask rule
    (icdar.py:509-515); the score map comes from the SHRUNK polys.

    geometry="RBOX": geo (B,h,w,5) = 4 rect-edge distances + angle
    (reference datasets/icdar.py:620-672).
    geometry="QUAD": geo (B,h,w,9) = 8 signed corner offsets (EAST paper
    §3.3.2 QUAD: per-pixel shift to each GT-quad vertex) + the quad's
    short-edge length N_Q (the loss normalizer) — the option the
    reference declares (datasets/icdar.py:30) but never implements.
    Returns score (B,h,w,1), geo, mask (B,h,w,1).
    """

    def one(p, sh, rc, an, ig, va):
        if geometry == "QUAD":
            score, geo = east_quad_geo_maps(
                sh, p, va, out_height, out_width, stride=stride
            )
        else:
            score, geo = east_geo_maps(
                sh, rc, an, va, out_height, out_width, stride=stride
            )
        _, _, mask = pixellink_labels_stride(
            p, ig, va, out_height, out_width, stride, min_text_size
        )
        return score[..., None], geo, mask[..., None]

    return jax.vmap(one)(polys, shrunk, rects, angles, ignored, valid)


# --------------------------------------------------------------------------
# EAST QUAD geometry maps
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("height", "width", "stride"))
def east_quad_geo_maps(shrunk_polys: jnp.ndarray, polys: jnp.ndarray,
                       valid: jnp.ndarray, height: int, width: int,
                       stride: int = 1):
    """Dense EAST QUAD maps: score + 8 corner offsets + short-edge norm.

    For every pixel inside an instance's SHRUNK poly, the geometry target
    is the signed offset from the pixel to each of the FULL GT quad's 4
    vertices (EAST paper QUAD formulation; the reference only ever built
    the RBOX maps, datasets/icdar.py:620-672). Offsets are in full-res
    units; channel layout [dx0,dy0,dx1,dy1,dx2,dy2,dx3,dy3, N_Q] where
    N_Q = min GT edge length (the smoothed-L1 normalizer).
    Returns score (H,W) f32, geo (H,W,9) f32.
    """
    inst = rasterize_instances(
        shrunk_polys / float(stride), valid, height, width
    )
    score = (inst > 0).astype(jnp.float32)

    ys = jax.lax.broadcasted_iota(
        jnp.int32, (height, width), 0).astype(jnp.float32) * stride
    xs = jax.lax.broadcasted_iota(
        jnp.int32, (height, width), 1).astype(jnp.float32) * stride

    pad_poly = jnp.concatenate(
        [jnp.zeros((1, 4, 2), polys.dtype), polys], axis=0)
    q = pad_poly[inst]                        # (H, W, 4, 2)
    pix = jnp.stack([xs, ys], axis=-1)        # (H, W, 2)
    offsets = (q - pix[:, :, None, :]).reshape(height, width, 8)

    edges = jnp.linalg.norm(polys - jnp.roll(polys, -1, axis=1), axis=-1)
    short = jnp.min(edges, axis=-1)           # (K,)
    pad_short = jnp.concatenate(
        [jnp.zeros((1,), short.dtype), short], axis=0)
    nq = pad_short[inst]                      # (H, W)

    geo = jnp.concatenate([offsets, nq[..., None]], axis=-1)
    geo = geo * score[..., None]
    return score, geo


# --------------------------------------------------------------------------
# EAST RBOX geometry maps
# --------------------------------------------------------------------------


def _dist_point_to_segment_line(px, py, ax, ay, bx, by):
    """Unsigned distance from (px,py) to the infinite line through a-b.

    Same formula as reference icdar.py:269-271 (cross norm / edge norm).
    """
    cross = (bx - ax) * (ay - py) - (ax - px) * (by - ay)
    denom = jnp.sqrt((bx - ax) ** 2 + (by - ay) ** 2)
    return jnp.abs(cross) / jnp.maximum(denom, 1e-8)


@functools.partial(jax.jit, static_argnames=("height", "width", "stride"))
def east_geo_maps(shrunk_polys: jnp.ndarray, rects: jnp.ndarray,
                  angles: jnp.ndarray, valid: jnp.ndarray,
                  height: int, width: int, stride: int = 1):
    """Dense EAST RBOX maps: score + (d_top, d_right, d_bottom, d_left, angle).

    shrunk_polys: (K,4,2) — shrunk quads that define the positive region
                  (EAST score map uses the shrunk poly), in FULL-RES coords.
    rects:        (K,4,2) — fitted rectangles (sorted clockwise from TL,
                  host-side via ops.geometry.rectangle_from_parallelogram +
                  sort_rectangle), in FULL-RES coords.
    angles:       (K,)    — rect angles from sort_rectangle.
    valid:        (K,)    bool.
    stride:       generate directly on the (height, width) output grid whose
                  pixel (i, j) sits at full-res (j*stride, i*stride) —
                  equivalent to the reference's full-res-then-[::4] sampling
                  (icdar.py:632-634) at 1/stride**2 the raster cost.
                  Distances stay in full-res units (what restore_rectangle
                  expects, icdar.py:410-483).
    Returns score (H,W) f32, geo (H,W,5) f32.
    """
    inst = rasterize_instances(
        shrunk_polys / float(stride), valid, height, width
    )
    score = (inst > 0).astype(jnp.float32)

    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0).astype(jnp.float32) * stride
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1).astype(jnp.float32) * stride

    # distances from every pixel to the 4 rect edges of its own instance:
    # gather rect by instance id then compute 4 line distances.
    pad_rect = jnp.concatenate([jnp.zeros((1, 4, 2), rects.dtype), rects], axis=0)
    pad_ang = jnp.concatenate([jnp.zeros((1,), angles.dtype), angles], axis=0)
    r = pad_rect[inst]          # (H, W, 4, 2)
    a = pad_ang[inst]           # (H, W)

    def edge_dist(i, j):
        return _dist_point_to_segment_line(
            xs, ys, r[..., i, 0], r[..., i, 1], r[..., j, 0], r[..., j, 1]
        )

    d_top = edge_dist(0, 1)
    d_right = edge_dist(1, 2)
    d_bottom = edge_dist(2, 3)
    d_left = edge_dist(3, 0)
    geo = jnp.stack([d_top, d_right, d_bottom, d_left, a], axis=-1)
    geo = geo * score[..., None]
    return score, geo
