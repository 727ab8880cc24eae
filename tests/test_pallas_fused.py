"""Numerics of the fused conv+BN+relu kernels vs an unfused composition.

Runs the Pallas kernels in interpreter mode on CPU; forward values AND
all gradients (input, prologue affine, weights) must match the jnp
reference within bf16 tolerances.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorflow_ocr_tpu.ops import pallas_fused as PF

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


@pytest.fixture(autouse=True)
def _interpret():
    PF.set_interpret(True)
    yield
    PF.set_interpret(False)


def _loss(y, s, wy, ws):
    return jnp.sum(y.astype(jnp.float32) * wy) + jnp.sum(s * ws)


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-6)


@pytest.mark.parametrize("ci,co", [(16, 32), (32, 16)])
def test_fused_conv1x1_matches_reference(ci, co):
    rng = np.random.RandomState(0)
    n, h, w = 2, 8, 16
    x = jnp.asarray(rng.randn(n, h, w, ci), jnp.bfloat16)
    ab = jnp.asarray(np.stack([rng.rand(ci) + 0.5, rng.randn(ci) * 0.1]),
                     jnp.float32)
    wk = jnp.asarray(rng.randn(ci, co) * 0.1, jnp.bfloat16)
    wy = jnp.asarray(rng.randn(n, h, w, co), jnp.float32)
    ws = jnp.asarray(rng.randn(2, co) * 0.01, jnp.float32)
    bm = PF.pick_bm(n * h * w, ci, co)
    assert bm is not None

    def f_fused(x, ab, wk):
        y, s = PF.fused_conv1x1(x, ab, wk, bm)
        return _loss(y, s, wy, ws)

    def f_ref(x, ab, wk):
        y, s = PF.reference_conv_bn_act(x, ab, wk, (1, 1))
        return _loss(y, s, wy, ws)

    y_f, s_f = PF.fused_conv1x1(x, ab, wk, bm)
    y_r, s_r = PF.reference_conv_bn_act(x, ab, wk, (1, 1))
    assert _rel(y_f, y_r) < 2e-2
    assert _rel(s_f, s_r) < 2e-2

    g_f = jax.grad(f_fused, argnums=(0, 1, 2))(x, ab, wk)
    g_r = jax.grad(f_ref, argnums=(0, 1, 2))(x, ab, wk)
    for a, b, name in zip(g_f, g_r, ("dx", "dab", "dw")):
        assert _rel(a, b) < 3e-2, name


def test_fused_conv3x3_matches_reference():
    rng = np.random.RandomState(1)
    n, h, w, ci, co = 2, 16, 16, 16, 16
    x = jnp.asarray(rng.randn(n, h, w, ci), jnp.bfloat16)
    ab = jnp.asarray(np.stack([rng.rand(ci) + 0.5, rng.randn(ci) * 0.1]),
                     jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, ci, co) * 0.1, jnp.bfloat16)
    w2 = wk.reshape(9 * ci, co)
    wy = jnp.asarray(rng.randn(n, h, w, co), jnp.float32)
    ws = jnp.asarray(rng.randn(2, co) * 0.01, jnp.float32)
    th = PF.pick_th(h, w, ci, co)
    assert th is not None

    y_f, s_f = PF.fused_conv3x3(x, ab, w2, th)
    y_r, s_r = PF.reference_conv_bn_act(x, ab, wk, (3, 3))
    assert _rel(y_f, y_r) < 2e-2
    assert _rel(s_f, s_r) < 2e-2

    def f_fused(x, ab, w2):
        y, s = PF.fused_conv3x3(x, ab, w2, th)
        return _loss(y, s, wy, ws)

    def f_ref(x, ab, wk):
        y, s = PF.reference_conv_bn_act(x, ab, wk, (3, 3))
        return _loss(y, s, wy, ws)

    g_f = jax.grad(f_fused, argnums=(0, 1, 2))(x, ab, w2)
    g_r = jax.grad(f_ref, argnums=(0, 1, 2))(x, ab, wk)
    assert _rel(g_f[0], g_r[0]) < 3e-2, "dx"
    assert _rel(g_f[1], g_r[1]) < 3e-2, "dab"
    assert _rel(g_f[2], np.asarray(g_r[2]).reshape(9 * ci, co)) < 3e-2, "dw"


def test_fused_im2col_tap_order():
    """The (9*Ci, Co) weight layout must equal w.reshape(9*ci, co) with
    (ky, kx) row-major tap order — guaranteed by comparing against
    lax.conv in the other tests, pinned explicitly here."""
    rng = np.random.RandomState(2)
    ci, co = 8, 8
    n, h, w = 1, 8, 8
    x = np.zeros((n, h, w, ci), np.float32)
    x[0, 3, 4, 0] = 1.0  # single impulse
    xj = jnp.asarray(x, jnp.bfloat16)
    wk = jnp.asarray(rng.randn(3, 3, ci, co) * 0.1, jnp.bfloat16)
    ab = jnp.asarray(np.stack([np.ones(ci), np.zeros(ci)]), jnp.float32)
    th = PF.pick_th(h, w, ci, co)
    y, _ = PF.fused_conv3x3(xj, ab, wk.reshape(9 * ci, co), th)
    # impulse at (3,4): output at (2,3) sees tap (ky=2 [below], kx=2)
    want = np.asarray(wk, np.float32)[2, 2, 0]
    np.testing.assert_allclose(
        np.asarray(y, np.float32)[0, 2, 3], want, atol=1e-2
    )
