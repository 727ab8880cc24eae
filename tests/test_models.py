"""Model zoo: shapes, strides, dtypes, BN state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_ocr_tpu.models import build_model
from tensorflow_ocr_tpu.models.resnet import resnet_v1
from tensorflow_ocr_tpu.models.vgg import VGG16

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


@pytest.fixture(scope="module")
def img64():
    return jnp.zeros((1, 64, 64, 3), jnp.float32)


def test_resnet50_pyramid_strides(img64):
    model = resnet_v1(50)
    vars_ = model.init(jax.random.PRNGKey(0), img64)
    ep = model.apply(vars_, img64)
    assert ep["pool2"].shape == (1, 16, 16, 64)     # stride 4
    assert ep["pool3"].shape == (1, 8, 8, 256)      # stride 8
    assert ep["pool4"].shape == (1, 4, 4, 512)      # stride 16
    assert ep["pool5"].shape == (1, 2, 2, 2048)     # stride 32


def test_vgg16_endpoints(img64):
    model = VGG16()
    vars_ = model.init(jax.random.PRNGKey(0), img64)
    ep = model.apply(vars_, img64)
    assert ep["conv3_3"].shape == (1, 16, 16, 256)  # stride 4
    assert ep["conv4_3"].shape == (1, 8, 8, 512)    # stride 8
    assert ep["conv5_3"].shape == (1, 4, 4, 512)    # stride 16
    assert ep["fc7"].shape == (1, 4, 4, 1024)       # stride 16 (pool5 is s1)


def test_pixellink_resnet50_outputs(img64):
    model = build_model("pixellink_resnet50")
    vars_ = model.init(jax.random.PRNGKey(0), img64)
    out = model.apply(vars_, img64)
    # stride-4 maps: 2-ch pixel + 16-ch link logits (nets/model.py:139-141)
    assert out["pixel_logits"].shape == (1, 16, 16, 2)
    assert out["link_logits"].shape == (1, 16, 16, 16)
    assert out["pixel_logits"].dtype == jnp.float32


def test_pixellink2s_vgg16_outputs(img64):
    model = build_model("pixellink2s_vgg16")
    vars_ = model.init(jax.random.PRNGKey(0), img64)
    out = model.apply(vars_, img64)
    # stride-2 maps (PixelLink 2s, BASELINE config #3)
    assert out["pixel_logits"].shape == (1, 32, 32, 2)
    assert out["link_logits"].shape == (1, 32, 32, 16)


def test_pixellink_vgg16_outputs(img64):
    model = build_model("pixellink_vgg16")
    vars_ = model.init(jax.random.PRNGKey(0), img64)
    out = model.apply(vars_, img64)
    assert out["pixel_logits"].shape == (1, 16, 16, 2)
    assert out["link_logits"].shape == (1, 16, 16, 16)


def test_east_resnet50_outputs(img64):
    model = build_model("east_resnet50", text_scale=512)
    vars_ = model.init(jax.random.PRNGKey(0), img64)
    out = model.apply(vars_, img64)
    assert out["score"].shape == (1, 16, 16, 1)
    assert out["geometry"].shape == (1, 16, 16, 5)
    score = np.asarray(out["score"])
    geo = np.asarray(out["geometry"])
    assert (score >= 0).all() and (score <= 1).all()
    assert (geo[..., :4] >= 0).all() and (geo[..., :4] <= 512).all()
    assert (np.abs(geo[..., 4]) <= np.pi / 4 + 1e-6).all()


def test_link8_outputs(img64):
    model = build_model("link8_resnet50")
    vars_ = model.init(jax.random.PRNGKey(0), img64)
    out = model.apply(vars_, img64)
    assert out["score"].shape == (1, 16, 16, 1)
    assert out["link_probs"].shape == (1, 16, 16, 8)


def test_registry_all_names_construct():
    from tensorflow_ocr_tpu.models import MODEL_REGISTRY

    for name in MODEL_REGISTRY:
        m = build_model(name)  # construction only; no weight init
        assert m is not None


def test_batchnorm_updates_in_train_mode(img64):
    model = build_model("pixellink_vgg16")
    rngs = jax.random.PRNGKey(0)
    vars_ = model.init(rngs, img64)
    assert "batch_stats" in vars_
    x = jax.random.normal(jax.random.PRNGKey(1), img64.shape, jnp.float32) * 50 + 100
    out, updates = model.apply(
        vars_, x, train=True, mutable=["batch_stats"]
    )
    # running stats must move
    old = jax.tree_util.tree_leaves(vars_["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    moved = any(not np.allclose(a, b) for a, b in zip(old, new))
    assert moved


def test_east_vgg16_jit_forward(img64):
    model = build_model("east_vgg16")
    vars_ = model.init(jax.random.PRNGKey(0), img64)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x)

    out = fwd(vars_, img64)
    assert out["score"].shape == (1, 16, 16, 1)


def test_resnet_output_stride_atrous(img64):
    """slim stack_blocks_dense output_stride semantics (reference
    nets/resnet_utils.py:125-206): capping the stride converts later
    block strides into dilation, keeping the spatial size."""
    from tensorflow_ocr_tpu.models.resnet import resnet_v1

    for os_, p4, p5 in ((16, 4, 4), (8, 8, 8), (None, 4, 2)):
        model = resnet_v1(50, output_stride=os_)
        vars_ = model.init(jax.random.PRNGKey(0), img64, train=False)
        ep = model.apply(vars_, img64, train=False)
        assert ep["pool2"].shape[1] == 16
        assert ep["pool3"].shape[1] == 8
        assert ep["pool4"].shape[1] == p4, os_
        assert ep["pool5"].shape[1] == p5, os_

    # same parameter tree as the undilated network (weights transfer)
    v_a = resnet_v1(50, output_stride=8).init(
        jax.random.PRNGKey(0), img64, train=False)
    v_b = resnet_v1(50).init(jax.random.PRNGKey(0), img64, train=False)
    pa = {str(p) for p, _ in jax.tree_util.tree_flatten_with_path(v_a)[0]}
    pb = {str(p) for p, _ in jax.tree_util.tree_flatten_with_path(v_b)[0]}
    assert pa == pb


def test_resnet_output_stride_validation():
    from tensorflow_ocr_tpu.models.resnet import resnet_v1
    import pytest as _pytest
    import jax.numpy as jnp

    with _pytest.raises(ValueError):
        resnet_v1(50, output_stride=6).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)


def test_convbn_frozen_fold_matches_unfolded_math():
    """ConvBN with train=False folds the running-stats BN affine into the
    conv kernel; the result must equal the unfolded conv->BN->relu math."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tensorflow_ocr_tpu.models.layers import ConvBN

    rng = np.random.RandomState(0)
    m = ConvBN(16, (3, 3), dtype=jnp.float32)
    x = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    # non-trivial BN state
    v = jax.tree_util.tree_map(lambda a: a, v)
    bs = {"BatchNorm_0": {
        "mean": jnp.asarray(rng.randn(16) * 0.3, jnp.float32),
        "var": jnp.asarray(rng.rand(16) + 0.5, jnp.float32)}}
    params = dict(v["params"])
    params["BatchNorm_0"] = {
        "scale": jnp.asarray(rng.rand(16) + 0.5, jnp.float32),
        "bias": jnp.asarray(rng.randn(16) * 0.2, jnp.float32)}
    variables = {"params": params, "batch_stats": bs}

    y = m.apply(variables, x, train=False)

    k = params["Conv_0"]["kernel"]
    conv = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    g, b2 = params["BatchNorm_0"]["scale"], params["BatchNorm_0"]["bias"]
    mu, var = bs["BatchNorm_0"]["mean"], bs["BatchNorm_0"]["var"]
    ref = jax.nn.relu((conv - mu) / jnp.sqrt(var + 1e-5) * g + b2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # gradients still reach conv kernel AND BN params through the fold
    def loss(p):
        return jnp.sum(m.apply({"params": p, "batch_stats": bs}, x,
                               train=False) ** 2)
    g = jax.grad(loss)(params)
    assert float(jnp.max(jnp.abs(g["Conv_0"]["kernel"]))) > 0
    assert float(jnp.max(jnp.abs(g["BatchNorm_0"]["scale"]))) > 0


def test_pool_before_relu_exact(rng, monkeypatch):
    """relu/max-pool commute (relu monotone): the pooled-first stem
    (OCR_POOL_BEFORE_RELU=1, PERF.md §4.7) must match the reference
    order exactly — outputs and gradients (param tree is identical)."""
    from tensorflow_ocr_tpu.models.resnet import ResNetV1

    x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    m = ResNetV1(units=(1, 1, 1, 1), dtype=jnp.float32)
    monkeypatch.setenv("OCR_POOL_BEFORE_RELU", "0")
    v = m.init(jax.random.PRNGKey(0), x, train=False)

    def run_and_grad():
        out = m.apply(v, x, train=False)

        def loss(p):
            o = m.apply({"params": p, **{k: v[k] for k in v
                                         if k != "params"}}, x, train=False)
            return sum(jnp.sum(e.astype(jnp.float32) ** 2)
                       for e in jax.tree_util.tree_leaves(o))
        g = jax.grad(loss)(v["params"])
        return out, g

    ref_out, ref_g = run_and_grad()
    monkeypatch.setenv("OCR_POOL_BEFORE_RELU", "1")
    new_out, new_g = run_and_grad()
    for k in ref_out:
        np.testing.assert_allclose(np.asarray(new_out[k]),
                                   np.asarray(ref_out[k]), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ref_g),
                    jax.tree_util.tree_leaves(new_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
