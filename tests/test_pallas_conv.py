"""Numerics of ops/pallas_conv (1x1 and 3x3 custom-VJP convs) vs lax.conv.

Runs the kernels in interpreter mode on CPU (the same fixture style as
test_pallas_fused.py). Covers the ADVICE round-2 finding: the module's
dispatch path (`conv2d` / `supported`) was previously untested and
crashed on import of its interpret toggle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorflow_ocr_tpu.ops import pallas_conv as PCV

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


@pytest.fixture(autouse=True)
def _interpret():
    PCV.set_interpret(True)
    yield
    PCV.set_interpret(False)


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-6)


def _ref_conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=stride, padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("stride", [(1, 1), (2, 2)])
def test_conv1x1_fwd_bwd(stride):
    rng = np.random.RandomState(0)
    # m = n*(h/sh)*(w/sw) must be divisible by a block size (>=256)
    n, ci, co = 2, 16, 32
    h = wd = 16 if stride == (1, 1) else 32
    x = jnp.asarray(rng.randn(n, h, wd, ci), jnp.float32)
    w = jnp.asarray(rng.randn(1, 1, ci, co) * 0.1, jnp.float32)
    assert PCV.supported(x.shape, (1, 1), stride, (1, 1), co)

    y = PCV.conv2d(x, w, stride)
    y_ref = _ref_conv(x, w, stride)
    assert _rel(y, y_ref) < 1e-4

    wy = jnp.asarray(rng.randn(*y.shape), jnp.float32)
    gx, gw = jax.grad(lambda x, w: jnp.sum(PCV.conv2d(x, w, stride) * wy),
                      argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(
        lambda x, w: jnp.sum(_ref_conv(x, w, stride) * wy),
        argnums=(0, 1))(x, w)
    assert _rel(gx, gx_r) < 1e-4
    assert _rel(gw, gw_r) < 1e-4


def test_conv3x3_fwd_bwd():
    rng = np.random.RandomState(1)
    n, h, wd, ci, co = 1, 8, 16, 8, 16
    x = jnp.asarray(rng.randn(n, h, wd, ci), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, ci, co) * 0.1, jnp.float32)
    assert PCV.supported(x.shape, (3, 3), (1, 1), (1, 1), co)

    y = PCV.conv2d(x, w, (1, 1))
    y_ref = _ref_conv(x, w, (1, 1))
    assert _rel(y, y_ref) < 1e-4

    wy = jnp.asarray(rng.randn(*y.shape), jnp.float32)
    gx, gw = jax.grad(lambda x, w: jnp.sum(PCV.conv2d(x, w, (1, 1)) * wy),
                      argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(
        lambda x, w: jnp.sum(_ref_conv(x, w, (1, 1)) * wy),
        argnums=(0, 1))(x, w)
    assert _rel(gx, gx_r) < 1e-4
    assert _rel(gw, gw_r) < 1e-4


def test_unsupported_shapes_rejected():
    # dilation, odd widths, and non-tileable M must fall back
    assert not PCV.supported((2, 8, 16, 16), (3, 3), (1, 1), (2, 2), 32)
    assert not PCV.supported((2, 8, 12, 16), (3, 3), (1, 1), (1, 1), 32)
    assert not PCV.supported((1, 3, 5, 16), (1, 1), (1, 1), (1, 1), 32)
