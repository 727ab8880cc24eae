"""On-device polygon rasterization.

Replaces the reference's host-side ``cv2.fillPoly`` calls
(/root/reference/datasets/icdar.py:507-515, tool/pixellink_fn.py:79-80) with
a vectorized even-odd point-in-polygon test evaluated at every pixel center.
The test is a dense (H*W, K, E) computation of pure elementwise/VPU work —
fully jittable, vmappable over the batch, and fusable into the train step,
which removes the reference's per-image Python rasterization bottleneck
entirely (SURVEY.md §2.9 item 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def points_in_polygons(px: jnp.ndarray, py: jnp.ndarray,
                       polys: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Even-odd (crossing-number) test of points against many polygons.

    px, py: (N,) float32 query coordinates.
    polys:  (K, V, 2) float32 polygon vertices (x, y).
    valid:  (K,) bool — padding mask for the static poly count.
    Returns (N, K) bool: point i inside polygon k.
    """
    x1 = polys[:, :, 0]                      # (K, V)
    y1 = polys[:, :, 1]
    x2 = jnp.roll(x1, -1, axis=1)
    y2 = jnp.roll(y1, -1, axis=1)

    pxe = px[:, None, None]                  # (N, 1, 1)
    pye = py[:, None, None]
    # Edge straddles the horizontal ray through py.
    straddle = (y1[None] > pye) != (y2[None] > pye)
    dy = y2 - y1
    safe_dy = jnp.where(dy == 0, 1.0, dy)
    x_cross = (x2 - x1)[None] * (pye - y1[None]) / safe_dy[None] + x1[None]
    crossings = straddle & (pxe < x_cross)
    inside = jnp.sum(crossings.astype(jnp.int32), axis=2) % 2 == 1  # (N, K)
    return inside & valid[None, :]


@functools.partial(jax.jit, static_argnames=("height", "width"))
def rasterize_instances(polys: jnp.ndarray, valid: jnp.ndarray,
                        height: int, width: int) -> jnp.ndarray:
    """Rasterize polygons into an int32 instance-id map.

    Matches the reference's sequential ``cv2.fillPoly(poly_mask, idx+1)``
    overwrite semantics (icdar.py:508): where polygons overlap, the
    later (higher-index) polygon wins, because we take the max id.

    polys: (K, 4, 2) float32; valid: (K,) bool.
    Returns (H, W) int32 — 0 background, k+1 for polygon k.
    """
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    inside = points_in_polygons(gx.reshape(-1), gy.reshape(-1), polys, valid)
    ids = jnp.arange(1, polys.shape[0] + 1, dtype=jnp.int32)
    inst = jnp.max(jnp.where(inside, ids[None, :], 0), axis=1)
    return inst.reshape(height, width)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def rasterize_mask(polys: jnp.ndarray, valid: jnp.ndarray,
                   height: int, width: int) -> jnp.ndarray:
    """Boolean union raster of the valid polygons (cv2.fillPoly(…, 1))."""
    return rasterize_instances(polys, valid, height, width) > 0
