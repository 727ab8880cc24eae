"""Pallas CC kernel vs the XLA reference implementation (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tensorflow_ocr_tpu.ops import decode as D
from tensorflow_ocr_tpu.ops.pallas_kernels import (
    connected_components_pallas,
    pack_edges,
)

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


def _partition(labels, mask):
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


def test_pack_edges_bits():
    h, w = 8, 8
    edges = np.zeros((h, w, 8), bool)
    edges[4, 4, 3] = True  # right link from (4,4)
    packed = np.asarray(pack_edges(jnp.array(edges)))
    assert packed[4, 4] & (1 << 3)
    # reverse bit set on the neighbor (4,5): bit 8+3
    assert packed[4, 5] & (1 << 11)


def test_pallas_cc_matches_xla(rng):
    h, w = 24, 32
    mask = rng.rand(h, w) > 0.5
    links = rng.rand(h, w, 8).astype(np.float32)
    edges = D.link_adjacency(jnp.array(mask), jnp.array(links), 0.6)
    want = np.asarray(D.connected_components(edges, jnp.array(mask)))
    got = np.asarray(
        connected_components_pallas(edges, jnp.array(mask), interpret=True)
    )
    np.testing.assert_array_equal(
        _partition(got, mask), _partition(want, mask)
    )


def test_pallas_cc_two_blobs():
    h, w = 16, 16
    mask = np.zeros((h, w), bool)
    mask[2:6, 2:6] = True
    mask[10:14, 10:14] = True
    links = np.ones((h, w, 8), np.float32)
    edges = D.link_adjacency(jnp.array(mask), jnp.array(links), 0.5)
    got = np.asarray(
        connected_components_pallas(edges, jnp.array(mask), interpret=True)
    )
    p = _partition(got, mask)
    assert len(np.unique(p[mask])) == 2
