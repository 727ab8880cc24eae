"""Unit-fused ghost-BN bottleneck kernels vs the band-local jnp reference.

The forward must match bit-for-bit (same helpers, same order); the
two-sweep backward must match jax.grad of the reference to f32 precision
(it is constructed to be exact, including cross-band seam terms), with a
loose check at the production bf16 dtype. Kernels run in interpreter
mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorflow_ocr_tpu.ops import pallas_unit as PU

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


@pytest.fixture(autouse=True)
def _interpret():
    PU.set_interpret(True)
    yield
    PU.set_interpret(False)


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-6)


def _inputs(dtype, n=2, h=16, wd=16, ci=16, db=8, co=16, seed=0):
    rng = np.random.RandomState(seed)
    o = jnp.asarray(rng.randn(n, h, wd, ci) ** 2, dtype)
    w1 = jnp.asarray(rng.randn(ci, db) * 0.1, dtype)
    gb1 = jnp.asarray(np.stack([np.ones(db) * 1.1, np.zeros(db) + 0.05]),
                      jnp.float32)
    w2 = jnp.asarray(rng.randn(9 * db, db) * 0.1, dtype)
    w3 = jnp.asarray(rng.randn(db, co) * 0.1, dtype)
    gb3 = jnp.asarray(np.stack([np.ones(co) * 0.9, np.zeros(co) - 0.02]),
                      jnp.float32)
    ws = jnp.asarray(rng.randn(ci, co) * 0.1, dtype)
    wy = jnp.asarray(rng.randn(n, h, wd, co), jnp.float32)
    return o, w1, gb1, w2, gb1, w3, gb3, ws, gb3, wy


@pytest.mark.parametrize("gh,proj", [(16, False), (16, True),
                                     (8, False), (8, True)])
def test_forward_matches_reference(gh, proj):
    o, w1, gb1, w2, gb2, w3, gb3, ws, gbs, _ = _inputs(jnp.bfloat16)
    ws_, gbs_ = (ws, gbs) if proj else (None, None)
    ref = PU.reference_ghost_unit(o, w1, gb1, w2, gb2, w3, gb3,
                                  ws_, gbs_, gh)
    if proj:
        got = PU.ghost_unit_proj(o, w1, gb1, w2, gb2, w3, gb3, ws, gbs,
                                 gh, 1e-5)
    else:
        got = PU.ghost_unit_id(o, w1, gb1, w2, gb2, w3, gb3, gh, 1e-5)
    assert _rel(got[0], ref[0]) < 1e-5          # identical up to FMA order
    for k in (1, 2, 3):
        assert _rel(got[k], ref[k]) < 1e-5      # f32 sum association
    if proj:
        assert _rel(got[4], ref[4]) < 1e-5


@pytest.mark.parametrize("gh,proj", [(16, False), (16, True),
                                     (8, False), (8, True)])
def test_backward_exact_f32(gh, proj):
    o, w1, gb1, w2, gb2, w3, gb3, ws, gbs, wy = _inputs(jnp.float32)
    args = (o, w1, gb1, w2, gb2, w3, gb3) + ((ws, gbs) if proj else ())

    def loss_k(*a):
        fn = PU.ghost_unit_proj if proj else PU.ghost_unit_id
        return jnp.sum(fn(*a, gh, 1e-5)[0].astype(jnp.float32) * wy)

    def loss_r(*a):
        w_s, gb_s = (a[7], a[8]) if proj else (None, None)
        out = PU.reference_ghost_unit(a[0], a[1], a[2], a[3], a[4],
                                      a[5], a[6], w_s, gb_s, gh)[0]
        return jnp.sum(out.astype(jnp.float32) * wy)

    gk = jax.grad(loss_k, argnums=tuple(range(len(args))))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(len(args))))(*args)
    for i, (a, b) in enumerate(zip(gk, gr)):
        assert _rel(a, b) < 1e-4, f"arg {i}"


def test_backward_bf16():
    o, w1, gb1, w2, gb2, w3, gb3, ws, gbs, wy = _inputs(jnp.bfloat16)
    args = (o, w1, gb1, w2, gb2, w3, gb3)

    def loss_k(*a):
        return jnp.sum(
            PU.ghost_unit_id(*a, 8, 1e-5)[0].astype(jnp.float32) * wy)

    def loss_r(*a):
        out = PU.reference_ghost_unit(*a, None, None, 8)[0]
        return jnp.sum(out.astype(jnp.float32) * wy)

    gk = jax.grad(loss_k, argnums=tuple(range(len(args))))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(len(args))))(*args)
    for i, (a, b) in enumerate(zip(gk, gr)):
        assert _rel(a, b) < 5e-2, f"arg {i}"


def test_stats_feed_running_averages():
    """The s* outputs are global sums usable for running-stat updates."""
    o, w1, gb1, w2, gb2, w3, gb3, _, _, _ = _inputs(jnp.bfloat16)
    out, s1, s2, s3 = PU.ghost_unit_id(o, w1, gb1, w2, gb2, w3, gb3,
                                       8, 1e-5)
    n, h, wd, _ = o.shape
    cnt = n * h * wd
    mu1 = np.asarray(s1[0]) / cnt
    var1 = np.asarray(s1[1]) / cnt - mu1 ** 2
    assert np.all(np.isfinite(mu1)) and np.all(var1 >= -1e-5)


def test_pick_gh_fits_and_divides():
    # blocks 1-2 of pixellink_resnet50 @512 fit; block3/4's channel
    # counts crowd VMEM -> None (falls back to the per-op path there;
    # budgets measured against Mosaic scoped-vmem OOMs on a v5e)
    gh = PU.pick_gh(128, 128, 256, 64, 256)
    assert gh is not None and 128 % gh == 0
    assert PU.pick_gh(64, 64, 512, 128, 512) is not None
    assert PU.pick_gh(16, 16, 2048, 512, 2048) is None


def test_ghost_module_eval_matches_standard_bottleneck():
    """In eval mode BN is a constant affine, so GhostBottleneck and the
    standard Bottleneck must agree on the same parameters/running stats
    regardless of how training computed the statistics."""
    from tensorflow_ocr_tpu.models.resnet import Bottleneck, GhostBottleneck

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 16, 32) ** 2, jnp.float32)
    std = Bottleneck(32, 8, stride=1)
    ghost = GhostBottleneck(32, 8)
    v = std.init(jax.random.PRNGKey(0), x, train=True)
    # perturb running stats so the eval path is non-trivial
    bs = jax.tree_util.tree_map(lambda a: a + 0.25, v["batch_stats"])
    v = {"params": v["params"], "batch_stats": bs}
    y_std = std.apply(v, x, train=False)
    y_ghost = ghost.apply(v, x, train=False)
    assert _rel(y_ghost, y_std) < 3e-2


def test_ghost_module_train_updates_running_stats():
    from tensorflow_ocr_tpu.models.resnet import GhostBottleneck

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 16, 16, 32) ** 2, jnp.bfloat16)
    ghost = GhostBottleneck(32, 8)
    v = ghost.init(jax.random.PRNGKey(0), x, train=True)
    _, mut = ghost.apply(v, x, train=True, mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(v["batch_stats"])
    new = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))
