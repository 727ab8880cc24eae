"""Pallas TPU kernels for the decode hot path.

``cc_sweeps_pallas``: runs K min-label propagation sweeps of the PixelLink
link graph per kernel invocation, with the label map and the packed edge
bitmask resident in VMEM for all K sweeps. The XLA while_loop version
(ops/decode.connected_components) round-trips HBM between sweeps; at
decode-map sizes (192x320 i32 = 245 KB) the whole working set fits in VMEM
(~16 MB/core), so a single pallas_call eliminates that traffic entirely.

Edge packing: bit c of edges_packed[y, x] says "pixel (y,x) reaches its
LINK_OFFSETS[c] neighbor" — bits 0..7 are forward links, bits 8..15 the
reverse links (neighbor links back to me), matching the weak-connectivity
union in ops/decode.connected_components.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorflow_ocr_tpu.ops.labels import LINK_OFFSETS


def pack_edges(edges: jnp.ndarray) -> jnp.ndarray:
    """(h, w, 8) bool forward edges -> (h, w) int32 fwd|rev bitmask."""
    from tensorflow_ocr_tpu.ops.decode import _shift_bool

    h, w, _ = edges.shape
    packed = jnp.zeros((h, w), jnp.int32)
    for c, (dx, dy) in enumerate(LINK_OFFSETS):
        packed = packed | (edges[..., c].astype(jnp.int32) << c)
        rev = _shift_bool(edges[..., c], -dx, -dy)
        packed = packed | (rev.astype(jnp.int32) << (8 + c))
    return packed


def _shift_kernel(x, dx: int, dy: int, fill):
    """Shift a (h, w) VMEM-resident array: out[y,x] = in[y+dy, x+dx].

    Implemented with static slicing + pad concat (all shapes static).
    """
    h, w = x.shape
    out = x
    if dy > 0:
        out = jnp.concatenate(
            [out[dy:, :], jnp.full((dy, w), fill, x.dtype)], axis=0
        )
    elif dy < 0:
        out = jnp.concatenate(
            [jnp.full((-dy, w), fill, x.dtype), out[:dy, :]], axis=0
        )
    if dx > 0:
        out = jnp.concatenate(
            [out[:, dx:], jnp.full((h, dx), fill, x.dtype)], axis=1
        )
    elif dx < 0:
        out = jnp.concatenate(
            [jnp.full((h, -dx), fill, x.dtype), out[:, :dx]], axis=1
        )
    return out


def _cc_sweep_body(labels, packed, sentinel):
    best = labels
    for c, (dx, dy) in enumerate(LINK_OFFSETS):
        fwd_bit = (packed >> c) & 1
        neigh = _shift_kernel(labels, dx, dy, sentinel)
        best = jnp.minimum(best, jnp.where(fwd_bit == 1, neigh, sentinel))
        rev_bit = (packed >> (8 + c)) & 1
        neigh_r = _shift_kernel(labels, -dx, -dy, sentinel)
        best = jnp.minimum(best, jnp.where(rev_bit == 1, neigh_r, sentinel))
    return best


def _cc_kernel(labels_ref, packed_ref, out_ref, *, num_sweeps: int,
               sentinel: int):
    labels = labels_ref[:]
    packed = packed_ref[:]

    def body(_, labels):
        return _cc_sweep_body(labels, packed, jnp.int32(sentinel))

    out_ref[:] = jax.lax.fori_loop(0, num_sweeps, body, labels)


@functools.partial(jax.jit, static_argnames=("num_sweeps", "interpret"))
def cc_sweeps_pallas(labels: jnp.ndarray, packed_edges: jnp.ndarray,
                     num_sweeps: int, interpret: bool = False) -> jnp.ndarray:
    """Run ``num_sweeps`` propagation sweeps in one VMEM-resident kernel."""
    h, w = labels.shape
    sentinel = h * w
    kernel = functools.partial(
        _cc_kernel, num_sweeps=num_sweeps, sentinel=sentinel
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(labels, packed_edges)


@functools.partial(jax.jit, static_argnames=("sweeps_per_call", "interpret"))
def connected_components_pallas(edges: jnp.ndarray, pixel_mask: jnp.ndarray,
                                sweeps_per_call: int = 16,
                                interpret: bool = False) -> jnp.ndarray:
    """Drop-in alternative to ops.decode.connected_components.

    Alternates VMEM sweep bursts with one XLA pointer-jumping step (labels
    indexing labels — a dynamic gather, which stays in XLA where it is
    efficient), looping until a full burst changes nothing.
    """
    h, w = pixel_mask.shape
    sentinel = jnp.int32(h * w)
    init = jnp.where(
        pixel_mask,
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1),
        sentinel,
    )
    packed = pack_edges(edges)
    max_rounds = (h + w) // sweeps_per_call + 2

    def jump(labels):
        flat = labels.reshape(-1)
        padded = jnp.concatenate([flat, jnp.array([sentinel], jnp.int32)])
        jumped = padded[jnp.clip(flat, 0, h * w)]
        jumped = jnp.where(jumped == sentinel, flat, jumped)
        return jnp.minimum(labels, jumped.reshape(h, w))

    def cond(state):
        _, changed, it = state
        return changed & (it < max_rounds)

    def body(state):
        labels, _, it = state
        labels = jump(labels)
        new = cc_sweeps_pallas(labels, packed, sweeps_per_call, interpret)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), 0))
    return labels
