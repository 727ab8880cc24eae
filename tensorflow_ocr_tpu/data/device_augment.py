"""On-device data augmentation for the HBM-cached training loop.

The reference augments on the host: ``random_scale`` then ``crop_area``
inside every data-worker process (/root/reference/datasets/icdar.py:
576-619), which on this container's single CPU core caps augmented
training at ~16 img/s while the TPU idles. The TPU-native design moves
the whole geometric augmentation into the train step itself: images stay
staged in HBM (data/device_cache.DeviceDataset), each scan step gathers a
batch and applies a per-image random **similarity transform** (uniform
scale x rotation x translation) with one bilinear warp, transforms the
polygon tensors by the same matrix, and the existing on-device label
kernels (ops/labels) rasterize the maps from the transformed polys.
Nothing touches the host; augmented throughput matches the cached loop.

Similarity transforms cover the reference's augmentation surface exactly:
``random_scale`` choices (icdar.py:22,576-580), crop translation
(crop_area icdar.py:138-199), plus the rotation this repo adds
(DataConfig.use_rotate). They also transform EAST's rectangle geometry
exactly — a rotated rect stays a rect — so shrunk quads and rect corners
map through the matrix and only the RBOX angle needs re-canonicalizing
(ops/geometry.sort_rectangle_jax).

Poly visibility after the transform follows the crop_area contract made
kinder: fully inside -> kept; partially visible -> marked ignored (the
reference drops them to background, injecting label noise); fully
outside -> invalidated.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tensorflow_ocr_tpu.config import DataConfig
from tensorflow_ocr_tpu.ops import geometry as G

# ImageNet means (reference nets/model.py:18-31) — the fill for pixels the
# warp pulls from outside the source frame, so padding is neutral after
# the model's mean subtraction.
_FILL_RGB = (123.68, 116.78, 103.94)


def sample_similarity_params(
    key: jax.Array, batch: int, cfg: DataConfig
) -> Dict[str, jnp.ndarray]:
    """Per-image (scale, angle_rad, focal point) draws.

    scale: choice over cfg.random_scale when use_random_scale (reference
    icdar.py:576-580 np.random.choice), else 1.
    angle: uniform +-max_rotate_deg when use_rotate, else 0.
    focal: the source point that lands at the output center — uniform
    within the translation budget that keeps the crop window (mostly)
    inside the source, the device analog of crop_area's random origin.
    """
    k_s, k_a, k_f = jax.random.split(key, 3)
    size = float(cfg.input_size)

    if cfg.use_random_scale and len(cfg.random_scale) > 0:
        choices = jnp.asarray(cfg.random_scale, jnp.float32)
        scale = choices[jax.random.randint(k_s, (batch,), 0, len(choices))]
    else:
        scale = jnp.ones((batch,), jnp.float32)

    if cfg.use_rotate:
        max_rad = cfg.max_rotate_deg * jnp.pi / 180.0
        angle = jax.random.uniform(
            k_a, (batch,), minval=-max_rad, maxval=max_rad)
    else:
        angle = jnp.zeros((batch,), jnp.float32)

    # Half-extent of the output window in source coords is size/(2*scale);
    # the focal point may wander by |size/2 - size/(2*scale)| per axis and
    # keep the window inside (scale>1) or the source inside the window
    # (scale<1). With use_crop off the focal point stays centered.
    if cfg.use_crop:
        max_off = jnp.abs(size / 2.0 - size / (2.0 * scale))
        off = jax.random.uniform(
            k_f, (batch, 2), minval=-1.0, maxval=1.0) * max_off[:, None]
    else:
        off = jnp.zeros((batch, 2), jnp.float32)
    focal = size / 2.0 + off
    return {"scale": scale, "angle": angle, "focal": focal}


def similarity_matrices(
    params: Dict[str, jnp.ndarray], size: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Forward (src->dst) matrices M (B,2,2), translations t (B,2), and
    inverse matrices Minv (B,2,2) with dst = M@src + t."""
    s, th = params["scale"], params["angle"]
    c, sn = jnp.cos(th), jnp.sin(th)
    M = s[:, None, None] * jnp.stack(
        [jnp.stack([c, -sn], -1), jnp.stack([sn, c], -1)], -2)  # (B,2,2)
    o = jnp.full((2,), size / 2.0, jnp.float32)
    t = o[None, :] - jnp.einsum("bij,bj->bi", M, params["focal"])
    Minv = jnp.stack(
        [jnp.stack([c, sn], -1), jnp.stack([-sn, c], -1)], -2
    ) / s[:, None, None]
    return M, t, Minv


def warp_images(images: jnp.ndarray, Minv: jnp.ndarray,
                t: jnp.ndarray) -> jnp.ndarray:
    """Inverse-warp bilinear resample: out[y,x] = img[Minv @ ([x,y]-t)].

    images: (B,H,W,3) uint8 or float. Returns float32 RGB in [0,255]
    with out-of-frame pixels filled with the ImageNet means.
    """
    b, h, w, _ = images.shape
    xs, ys = jnp.meshgrid(
        jnp.arange(w, dtype=jnp.float32) + 0.5,
        jnp.arange(h, dtype=jnp.float32) + 0.5,
    )  # pixel centers
    dst = jnp.stack([xs, ys], axis=-1).reshape(-1, 2)  # (HW,2) as (x,y)

    def one(img, mi, ti):
        src = (dst - ti[None, :]) @ mi.T  # (HW,2) x,y
        sx = src[:, 0] - 0.5
        sy = src[:, 1] - 0.5
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = (sx - x0)[:, None]
        fy = (sy - y0)[:, None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        imgf = img.astype(jnp.float32)
        fill = jnp.asarray(_FILL_RGB, jnp.float32)

        def tap(yi, xi):
            inside = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))[:, None]
            v = imgf[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
            return jnp.where(inside, v, fill[None, :])

        v00 = tap(y0i, x0i)
        v01 = tap(y0i, x0i + 1)
        v10 = tap(y0i + 1, x0i)
        v11 = tap(y0i + 1, x0i + 1)
        top = v00 * (1 - fx) + v01 * fx
        bot = v10 * (1 - fx) + v11 * fx
        return (top * (1 - fy) + bot * fy).reshape(h, w, 3)

    return jax.vmap(one)(images, Minv, t)


def transform_points(pts: jnp.ndarray, M: jnp.ndarray,
                     t: jnp.ndarray) -> jnp.ndarray:
    """Apply per-image forward transforms to (B, ..., 2) point tensors."""
    b = pts.shape[0]
    flat = pts.reshape(b, -1, 2)
    out = jnp.einsum("bij,bnj->bni", M, flat) + t[:, None, :]
    return out.reshape(pts.shape)


def augment_batch(key: jax.Array, batch: Dict[str, jnp.ndarray],
                  cfg: DataConfig, want_east: bool) -> Dict[str, jnp.ndarray]:
    """Jittable whole-batch augmentation; runs inside the scan train step.

    batch: images (B,H,W,3), polys (B,K,4,2), tags (B,K) bool ignored,
    valid (B,K) bool, and for EAST shrunk/rects (B,K,4,2) + angles (B,K).
    Labels are NOT expected in the batch — the in-step label kernels
    rasterize from the transformed polys.
    """
    b = batch["images"].shape[0]
    size = batch["images"].shape[1]
    params = sample_similarity_params(key, b, cfg)
    M, t, Minv = similarity_matrices(params, size)

    out = dict(batch)
    out["images"] = warp_images(batch["images"], Minv, t)
    polys = transform_points(batch["polys"], M, t)
    out["polys"] = polys

    # Visibility: corners inside the output frame (B,K,4)
    inside = ((polys[..., 0] >= 0) & (polys[..., 0] <= size)
              & (polys[..., 1] >= 0) & (polys[..., 1] <= size))
    n_in = inside.sum(-1)
    out["valid"] = batch["valid"] & (n_in > 0)
    out["tags"] = batch["tags"] | ((n_in > 0) & (n_in < 4))

    if want_east:
        out["shrunk"] = transform_points(batch["shrunk"], M, t)
        rects = transform_points(batch["rects"], M, t)
        sorted_rects, angles = G.sort_rectangle_jax(rects)
        # zero-padded poly slots must stay zero (sort would reorder the
        # zeros harmlessly but angle of a degenerate rect is garbage)
        live = batch["valid"][..., None, None]
        out["rects"] = jnp.where(live, sorted_rects, batch["rects"])
        out["angles"] = jnp.where(batch["valid"], angles, batch["angles"])
    return out
