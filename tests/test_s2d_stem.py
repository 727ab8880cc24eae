"""Space-to-depth root-conv rewrite: exact equivalence to the 7x7/2 conv.

The transform (models/layers.py Conv2D.space_to_depth) must be
mathematically identical to the strided conv it replaces — same output,
same gradients, same parameter tree — for any kernel/padding the ResNet
root uses. PERF.md §4.1.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorflow_ocr_tpu.models.layers import Conv2D


@pytest.mark.parametrize("k,pad", [(7, 3), (3, 1)])
def test_s2d_conv_matches_strided_conv(k, pad):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 40, 3), jnp.float32)
    padding = ((pad, pad), (pad, pad))
    m_ref = Conv2D(64, (k, k), (2, 2), padding=padding, use_bias=False,
                   dtype=jnp.float32)
    m_s2d = Conv2D(64, (k, k), (2, 2), padding=padding, use_bias=False,
                   dtype=jnp.float32, space_to_depth=True)
    v = m_ref.init(jax.random.PRNGKey(0), x)
    y_ref = m_ref.apply(v, x)
    y_s2d = m_s2d.apply(v, x)  # same params: tree is identical
    assert y_ref.shape == y_s2d.shape
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)

    wy = jnp.asarray(rng.randn(*y_ref.shape), jnp.float32)
    g_ref = jax.grad(lambda v: jnp.sum(m_ref.apply(v, x) * wy))(v)
    g_s2d = jax.grad(lambda v: jnp.sum(m_s2d.apply(v, x) * wy))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g_s2d),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-4)


def test_s2d_falls_back_on_odd_input():
    """Odd spatial dims can't block into 2x2 — must use the plain conv."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 31, 33, 3), jnp.float32)
    padding = ((3, 3), (3, 3))
    m = Conv2D(8, (7, 7), (2, 2), padding=padding, use_bias=False,
               dtype=jnp.float32, space_to_depth=True)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)  # must not crash; fallback path
    m_ref = Conv2D(8, (7, 7), (2, 2), padding=padding, use_bias=False,
                   dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(m_ref.apply(v, x)),
                               atol=1e-5)


def test_resnet_s2d_param_tree_unchanged():
    """ResNetV1 with/without the s2d stem has an identical variables tree
    (checkpoints and the slim importer must not see a difference)."""
    from tensorflow_ocr_tpu.models.resnet import ResNetV1, RESNET_UNITS

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v0 = ResNetV1(units=RESNET_UNITS[50], s2d_stem=False).init(
        jax.random.PRNGKey(0), x)
    v1 = ResNetV1(units=RESNET_UNITS[50], s2d_stem=True).init(
        jax.random.PRNGKey(0), x)
    p0 = jax.tree_util.tree_structure(v0)
    p1 = jax.tree_util.tree_structure(v1)
    assert p0 == p1
    # same init values too (params don't depend on the compute path)
    for a, b in zip(jax.tree_util.tree_leaves(v0),
                    jax.tree_util.tree_leaves(v1)):
        assert a.shape == b.shape
