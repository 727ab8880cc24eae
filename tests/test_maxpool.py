"""Fast-backward 3x3/2 maxpool (models/layers.max_pool_3x3s2).

Forward must equal nn.max_pool exactly; backward must equal the XLA
SelectAndScatter gradient on tie-free inputs (ties: both are valid
subgradients of max — ours SPLITS each window's gradient equally among
the tied maxima, XLA routes it all to the first; either way the mass per
window is conserved, see layers.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from tensorflow_ocr_tpu.models.layers import max_pool_3x3s2


def _ref(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")


@pytest.mark.parametrize("h,w", [(8, 8), (9, 7), (16, 10), (5, 5)])
def test_forward_matches_nn_max_pool(h, w):
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, h, w, 3).astype(np.float32))
    np.testing.assert_array_equal(max_pool_3x3s2(x), _ref(x))


@pytest.mark.parametrize("h,w", [(8, 8), (9, 7), (16, 10), (5, 5), (12, 6)])
def test_backward_matches_selectandscatter_tie_free(h, w):
    # distinct values everywhere -> unique argmax per window -> the two
    # subgradients coincide exactly
    rs = np.random.RandomState(1)
    base = rs.permutation(2 * h * w * 3).astype(np.float32)
    x = jnp.asarray(base.reshape(2, h, w, 3)) / 7.0
    g = jnp.asarray(rs.randn(*_ref(x).shape).astype(np.float32))

    def loss_fast(x):
        return jnp.sum(max_pool_3x3s2(x) * g)

    def loss_ref(x):
        return jnp.sum(_ref(x) * g)

    # identical routing; tolerance only for summation order when one
    # element is the max of several overlapping windows
    np.testing.assert_allclose(
        jax.grad(loss_fast)(x), jax.grad(loss_ref)(x), rtol=1e-6,
        atol=1e-6)


def test_backward_ties_split_gradient_and_conserve_mass():
    # an all-equal input: every window member ties; the gradient is split
    # equally among them, so total mass equals total incoming mass (a
    # valid subgradient — an unnormalized mask would inflate it up to 9x).
    x = jnp.ones((1, 4, 4, 1), jnp.float32)
    g = jnp.ones((1, 2, 2, 1), jnp.float32)
    dx = jax.grad(lambda x: jnp.sum(max_pool_3x3s2(x) * g))(x)
    # every input position belongs to >=1 window of an all-ones input
    assert (np.asarray(dx) > 0).all()
    np.testing.assert_allclose(float(dx.sum()), float(g.sum()), rtol=1e-6)


@pytest.mark.parametrize("h,w", [(8, 8), (9, 7)])
def test_backward_tied_input_conserves_per_window_mass(h, w):
    # random input quantized to few levels -> many (partial) ties; the
    # split rule must still conserve total gradient mass because every
    # window's gradient is distributed with weights summing to 1.
    rs = np.random.RandomState(3)
    x = jnp.asarray(
        np.round(rs.rand(2, h, w, 3) * 3).astype(np.float32))
    g = jnp.asarray(rs.rand(*_ref(x).shape).astype(np.float32))
    dx = jax.grad(lambda x: jnp.sum(max_pool_3x3s2(x) * g))(x)
    np.testing.assert_allclose(float(dx.sum()), float(g.sum()), rtol=1e-5)


def test_backward_bf16_and_jit():
    x = jnp.asarray(
        np.random.RandomState(2).randn(1, 10, 10, 8).astype(np.float32)
    ).astype(jnp.bfloat16)
    f = jax.jit(jax.grad(lambda x: jnp.sum(max_pool_3x3s2(x).astype(
        jnp.float32) ** 2)))
    dx = f(x)
    assert dx.shape == x.shape and dx.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(dx.astype(jnp.float32)).all())
