"""Real slim-checkpoint schema tests for the ImageNet warm-start importer.

The reference warm-starts from the public TF-slim `resnet_v1_50.ckpt` /
`vgg_16.ckpt` ImageNet checkpoints (/root/reference/multigpu_train.py:149-151,
train.sh:1-3). Those checkpoints' variable name/shape schemas are public and
static, so they are embedded here as fixtures: every backbone tensor a real
checkpoint ships must map onto an existing Flax leaf with a matching shape —
a tensor silently dropped would reproduce the exact failure mode
ignore_missing_vars=True hides.
"""

import numpy as np
import pytest

import jax

from tensorflow_ocr_tpu.models import build_model
from tensorflow_ocr_tpu.train.pretrained import (
    import_backbone,
    load_slim_npz,
    slim_to_flax_key,
)


def resnet_v1_50_schema():
    """The public slim resnet_v1_50 ImageNet checkpoint's variables.

    Structure per nets/resnet_v1.py:237-259 in the reference (units
    [3,4,6,3], bottleneck depths 64/128/256/512, outputs x4) plus the
    classification head the detection model discards.
    """
    v = {"global_step": ()}
    bn = lambda c: {  # noqa: E731
        "BatchNorm/gamma": (c,), "BatchNorm/beta": (c,),
        "BatchNorm/moving_mean": (c,), "BatchNorm/moving_variance": (c,),
    }

    def add(prefix, kshape):
        v[f"{prefix}/weights"] = kshape
        for suffix, shape in bn(kshape[-1]).items():
            v[f"{prefix}/{suffix}"] = shape

    add("resnet_v1_50/conv1", (7, 7, 3, 64))
    units = (3, 4, 6, 3)
    depths = (256, 512, 1024, 2048)
    bottles = (64, 128, 256, 512)
    block_in = 64
    for b, (n, out, db) in enumerate(zip(units, depths, bottles), 1):
        for u in range(1, n + 1):
            cin = block_in if u == 1 else out
            base = f"resnet_v1_50/block{b}/unit_{u}/bottleneck_v1"
            if u == 1:
                add(f"{base}/shortcut", (1, 1, cin, out))
            add(f"{base}/conv1", (1, 1, cin, db))
            add(f"{base}/conv2", (3, 3, db, db))
            add(f"{base}/conv3", (1, 1, db, out))
        block_in = out
    v["resnet_v1_50/logits/weights"] = (1, 1, 2048, 1000)
    v["resnet_v1_50/logits/biases"] = (1000,)
    v["resnet_v1_50/mean_rgb"] = (3,)
    return v


def vgg_16_schema():
    """The public slim vgg_16 ImageNet checkpoint's variables
    (conv1_1..conv5_3 + the 7x7 fc6 / 1x1 fc7/fc8 conv head)."""
    v = {"global_step": ()}
    cfg = [
        ("conv1", 2, 3, 64), ("conv2", 2, 64, 128), ("conv3", 3, 128, 256),
        ("conv4", 3, 256, 512), ("conv5", 3, 512, 512),
    ]
    for group, n, cin, cout in cfg:
        for i in range(1, n + 1):
            c_in = cin if i == 1 else cout
            v[f"vgg_16/{group}/{group}_{i}/weights"] = (3, 3, c_in, cout)
            v[f"vgg_16/{group}/{group}_{i}/biases"] = (cout,)
    v["vgg_16/fc6/weights"] = (7, 7, 512, 4096)
    v["vgg_16/fc6/biases"] = (4096,)
    v["vgg_16/fc7/weights"] = (1, 1, 4096, 4096)
    v["vgg_16/fc7/biases"] = (4096,)
    v["vgg_16/fc8/weights"] = (1, 1, 4096, 1000)
    v["vgg_16/fc8/biases"] = (1000,)
    return v


def _leaf_shapes(variables):
    out = {}
    for coll in ("params", "batch_stats"):
        if coll not in variables:
            continue
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables[coll]
        )[0]:
            key = tuple(
                getattr(p, "key", getattr(p, "name", str(p))) for p in path
            )
            out[(coll, key)] = tuple(leaf.shape)
    return out


@pytest.fixture(scope="module")
def resnet_vars():
    model = build_model("pixellink_resnet50")
    return model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))


@pytest.fixture(scope="module")
def vgg_vars():
    model = build_model("pixellink_vgg16")
    return model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))


EXCLUDED_OK = ("global_step", "logits", "mean_rgb")


def test_resnet50_schema_fully_mapped(resnet_vars):
    """Every backbone tensor in the real resnet_v1_50 checkpoint maps onto
    an existing Flax leaf with an identical shape."""
    leaves = _leaf_shapes(resnet_vars)
    n_mapped = 0
    for name, shape in resnet_v1_50_schema().items():
        mapped = slim_to_flax_key(name)
        if mapped is None:
            assert any(t in name for t in EXCLUDED_OK), (
                f"{name} unmapped but not a known-excluded variable"
            )
            continue
        path, coll = mapped
        assert (coll, path) in leaves, f"{name} -> {path} not in Flax tree"
        assert leaves[(coll, path)] == shape, (
            f"{name}: ckpt {shape} vs flax {leaves[(coll, path)]}"
        )
        n_mapped += 1
    # 53 convs (1 root + 10/13/19/10 per block) + 4 BN tensors each
    assert n_mapped == 53 * 5


def test_vgg16_schema_fully_mapped(vgg_vars):
    """All 13 conv groups of the real vgg_16 checkpoint map with matching
    shapes; the classifier-shaped fc6/fc7 map by name but are shape-skipped
    (the detection basenet uses a 3x3 dilated 1024-ch fc6 per
    reference nets/vgg.py:35 — the reference's ignore_missing_vars load
    skips them identically)."""
    leaves = _leaf_shapes(vgg_vars)
    n_exact = 0
    n_shape_skipped = 0
    for name, shape in vgg_16_schema().items():
        mapped = slim_to_flax_key(name)
        if mapped is None:
            assert any(t in name for t in EXCLUDED_OK), name
            continue
        path, coll = mapped
        if (coll, path) not in leaves:
            assert path[1] == "fc8", f"{name} -> {path} missing from tree"
            continue
        if leaves[(coll, path)] == shape:
            n_exact += 1
        else:
            assert path[1] in ("fc6", "fc7"), (
                f"unexpected shape mismatch for {name}"
            )
            n_shape_skipped += 1
    assert n_exact == 26  # 13 convs x (weights, biases)
    assert n_shape_skipped == 4  # fc6/fc7 weights+biases


def test_import_backbone_counts_real_resnet_schema(tmp_path, resnet_vars):
    """End-to-end: an .npz with the real checkpoint schema loads every
    backbone tensor (265 = 53 convs + 106 BN params + 106 BN stats)."""
    rng = np.random.RandomState(0)
    npz = {
        name: np.asarray(rng.randn(*shape), np.float32)
        for name, shape in resnet_v1_50_schema().items()
    }
    path = str(tmp_path / "resnet_v1_50.npz")
    np.savez(path, **npz)

    new_vars, n = import_backbone(dict(resnet_vars), path)
    assert n == 53 * 5

    # spot-check a tensor landed verbatim
    got = np.asarray(
        new_vars["params"]["backbone"]["block3_unit4"]["conv2"]["Conv_0"]["kernel"]
    )
    want = npz["resnet_v1_50/block3/unit_4/bottleneck_v1/conv2/weights"]
    np.testing.assert_allclose(got, want)
    got_bn = np.asarray(
        new_vars["batch_stats"]["backbone"]["conv1"]["BatchNorm_0"]["mean"]
    )
    np.testing.assert_allclose(
        got_bn, npz["resnet_v1_50/conv1/BatchNorm/moving_mean"]
    )


def test_load_slim_npz_drops_nothing_importable(tmp_path):
    """load_slim_npz keeps exactly the importable set — a regression net
    for mapper edits silently dropping real checkpoint tensors."""
    rng = np.random.RandomState(1)
    schema = resnet_v1_50_schema()
    npz = {k: np.asarray(rng.randn(*v), np.float32) for k, v in schema.items()}
    path = str(tmp_path / "ck.npz")
    np.savez(path, **npz)
    tree = load_slim_npz(path)

    def count(node):
        return sum(
            count(v) if isinstance(v, dict) else 1 for v in node.values()
        )

    assert count(tree["params"]) == 53 + 106  # kernels + gamma/beta
    assert count(tree["batch_stats"]) == 106  # moving mean/var
