"""End-to-end converter test: synthetic TF checkpoint -> .npz -> Flax tree.

Builds a real TF tensor-bundle with slim variable names (tf.compat.v1
Saver, the same format the tf-slim model-zoo checkpoints use), runs
scripts/convert_slim_checkpoint.py's convert(), and imports the result
into a Detector's variables — the full REAL_DATA.md warm-start path
without needing the actual ImageNet release files.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from scripts.convert_slim_checkpoint import convert  # noqa: E402
from tensorflow_ocr_tpu.train.pretrained import (  # noqa: E402
    import_backbone,
    load_slim_npz,
)

SLIM_VARS = {
    # root conv + its BN (resnet_v1_50 naming)
    "resnet_v1_50/conv1/weights": (7, 7, 3, 64),
    "resnet_v1_50/conv1/BatchNorm/gamma": (64,),
    "resnet_v1_50/conv1/BatchNorm/beta": (64,),
    "resnet_v1_50/conv1/BatchNorm/moving_mean": (64,),
    "resnet_v1_50/conv1/BatchNorm/moving_variance": (64,),
    # one bottleneck conv
    "resnet_v1_50/block1/unit_1/bottleneck_v1/conv1/weights": (1, 1, 64, 64),
    "resnet_v1_50/block1/unit_1/bottleneck_v1/conv1/BatchNorm/gamma": (64,),
    # things the loader must filter
    "global_step": (),
    "resnet_v1_50/logits/weights": (1, 1, 2048, 1000),
    "resnet_v1_50/conv1/weights/Momentum": (7, 7, 3, 64),
}


@pytest.fixture(scope="module")
def slim_ckpt(tmp_path_factory):
    td = tmp_path_factory.mktemp("slimckpt")
    g = tf.Graph()
    with g.as_default():
        # Saver var_list as a dict {checkpoint_name: variable} writes the
        # bundle under the slim names regardless of graph variable names.
        tvars = {
            name: tf.compat.v1.Variable(
                np.full(shape, 0.5, np.float32), name=name.replace("/", "_"))
            for name, shape in SLIM_VARS.items()
        }
        saver = tf.compat.v1.train.Saver(var_list=tvars)
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            path = saver.save(sess, str(td / "resnet_v1_50.ckpt"))
    return path


def test_convert_writes_mappable_npz(slim_ckpt, tmp_path):
    out = str(tmp_path / "conv.npz")
    n = convert(slim_ckpt, out)
    assert n == 7  # the 7 backbone tensors above
    tree = load_slim_npz(out)
    k = tree["params"]["backbone"]["conv1"]["Conv_0"]["kernel"]
    assert k.shape == (7, 7, 3, 64) and np.allclose(k, 0.5)
    assert np.allclose(
        tree["batch_stats"]["backbone"]["conv1"]["BatchNorm_0"]["mean"], 0.5)
    # filtered names are not in the mapped trees
    assert "logits" not in str(tree)


@pytest.mark.slow  # trains/initializes a full model (pytest.ini)
def test_converted_npz_warm_starts_model(slim_ckpt, tmp_path):
    import jax
    import jax.numpy as jnp

    from tensorflow_ocr_tpu.models import build_model

    out = str(tmp_path / "conv.npz")
    convert(slim_ckpt, out)
    model = build_model("pixellink_resnet50")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    new_vars, n = import_backbone(dict(variables), out)
    assert n == 7
    got = np.asarray(
        new_vars["params"]["backbone"]["conv1"]["Conv_0"]["kernel"])
    assert np.allclose(got, 0.5)


def test_mapped_only_drops_unmappable(slim_ckpt, tmp_path):
    out = str(tmp_path / "conv_mapped.npz")
    convert(slim_ckpt, out, mapped_only=True)
    raw = np.load(out)
    assert len(raw.files) == 7
    assert all("logits" not in f and "Momentum" not in f for f in raw.files)
