"""FusedBottleneck (Pallas) vs standard Bottleneck: same params, same math.

The fused module must be a drop-in: identical parameter tree, matching
forward values, gradients, and running-statistics updates (bf16
tolerances). Kernels run in interpreter mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorflow_ocr_tpu.models.resnet import Bottleneck, FusedBottleneck
from tensorflow_ocr_tpu.ops import pallas_fused as PF

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


@pytest.fixture(autouse=True)
def _interpret():
    PF.set_interpret(True)
    yield
    PF.set_interpret(False)


def _tree_paths(tree):
    return {
        tuple(str(getattr(p, "key", p)) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-6)


@pytest.mark.parametrize(
    "cin,depth,db,dtype,tol",
    [
        # f32 proves the semantics match tightly; bf16 runs the production
        # dtype with tolerance for compounding rounding noise (the fused
        # path takes one-pass stats off the f32 accumulator, the standard
        # path normalizes the cast conv output — verified to converge to
        # <0.8%% in f32).
        (16, 32, 8, jnp.float32, 2e-2),
        (32, 32, 8, jnp.float32, 2e-2),
        (16, 32, 8, jnp.bfloat16, 1e-1),
        (32, 32, 8, jnp.bfloat16, 1e-1),
    ],
)
def test_fused_bottleneck_matches_standard(cin, depth, db, dtype, tol):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 16, cin) ** 2, jnp.float32)  # post-relu-ish
    std = Bottleneck(depth, db, stride=1, dtype=dtype)
    fused = FusedBottleneck(depth, db, dtype=dtype)

    v_std = std.init(jax.random.PRNGKey(0), x, train=True)
    v_fused = fused.init(jax.random.PRNGKey(0), x, train=True)
    assert _tree_paths(v_std) == _tree_paths(v_fused)

    # same params into both
    y_std, mut_std = std.apply(v_std, x, train=True,
                               mutable=["batch_stats"])
    y_fused, mut_fused = fused.apply(v_std, x, train=True,
                                     mutable=["batch_stats"])
    assert _rel(y_fused, y_std) < tol

    # running-stat updates match
    fs = jax.tree_util.tree_flatten_with_path(mut_std["batch_stats"])[0]
    ff = dict(jax.tree_util.tree_flatten_with_path(
        mut_fused["batch_stats"])[0])
    for path, leaf in fs:
        assert _rel(ff[path], leaf) < tol, path

    # gradients match
    def loss(fn, params):
        variables = {"params": params,
                     "batch_stats": v_std["batch_stats"]}
        y, _ = fn.apply(variables, x, train=True, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_std = jax.grad(lambda p: loss(std, p))(v_std["params"])
    g_fused = jax.grad(lambda p: loss(fused, p))(v_std["params"])
    flat_s = jax.tree_util.tree_flatten_with_path(g_std)[0]
    flat_f = dict(jax.tree_util.tree_flatten_with_path(g_fused)[0])
    for path, leaf in flat_s:
        assert _rel(flat_f[path], leaf) < tol, path


def test_fused_bottleneck_eval_mode_uses_running_stats():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 16, 32) ** 2, jnp.float32)
    std = Bottleneck(32, 8, stride=1)
    fused = FusedBottleneck(32, 8)
    v = std.init(jax.random.PRNGKey(0), x, train=True)
    # perturb running stats away from init so the eval path is exercised
    bs = jax.tree_util.tree_map(lambda a: a + 0.25, v["batch_stats"])
    v = {"params": v["params"], "batch_stats": bs}
    y_std = std.apply(v, x, train=False)
    y_fused = fused.apply(v, x, train=False)
    assert _rel(y_fused, y_std) < 3e-2
