"""Slim-name warm start: round-trip a fake slim .npz into the Flax tree."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensorflow_ocr_tpu.models import build_model
from tensorflow_ocr_tpu.train.pretrained import (
    import_backbone,
    slim_to_flax_key,
)

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


def test_name_mapping_resnet():
    assert slim_to_flax_key("resnet_v1_50/conv1/weights") == (
        ("backbone", "conv1", "Conv_0", "kernel"), "params")
    assert slim_to_flax_key(
        "resnet_v1_50/block1/unit_2/bottleneck_v1/conv3/BatchNorm/gamma"
    ) == (("backbone", "block1_unit2", "conv3", "BatchNorm_0", "scale"),
          "params")
    assert slim_to_flax_key(
        "resnet_v1_50/block4/unit_1/bottleneck_v1/shortcut/BatchNorm/moving_mean"
    ) == (("backbone", "block4_unit1", "shortcut", "BatchNorm_0", "mean"),
          "batch_stats")
    assert slim_to_flax_key("resnet_v1_50/logits/weights") is None
    assert slim_to_flax_key("global_step") is None


def test_name_mapping_vgg():
    assert slim_to_flax_key("vgg_16/conv1/conv1_1/weights") == (
        ("backbone", "conv1_1", "kernel"), "params")
    assert slim_to_flax_key("vgg_16/fc6/biases") == (
        ("backbone", "fc6", "bias"), "params")


def _fake_slim_npz_from_model(tmp_path, variables):
    """Build a slim-named npz whose tensors are constant-filled so imports
    are detectable."""
    entries = {}

    def inv_path(path):
        # backbone/conv1/Conv_0/kernel -> resnet_v1_50/conv1/weights, etc.
        p = list(path)
        assert p[0] == "backbone"
        p = p[1:]
        if p[-2:] == ["Conv_0", "kernel"]:
            core = "/".join(p[:-2])
            core = core.replace("block", "block_TMP")  # placeholder
            core = core.replace("block_TMP", "block")
            import re
            core = re.sub(r"block(\d+)_unit(\d+)", r"block\1/unit_\2/bottleneck_v1", core)
            return f"resnet_v1_50/{core}/weights"
        if p[-2] == "BatchNorm_0":
            leaf = {"scale": "gamma", "bias": "beta",
                    "mean": "moving_mean", "var": "moving_variance"}[p[-1]]
            import re
            core = "/".join(p[:-2])
            core = re.sub(r"block(\d+)_unit(\d+)", r"block\1/unit_\2/bottleneck_v1", core)
            return f"resnet_v1_50/{core}/BatchNorm/{leaf}"
        return None

    def walk(tree, path, coll):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,), coll)
            else:
                if path and path[0] == "backbone":
                    name = inv_path(path + (k,))
                    if name:
                        entries[name] = np.full(v.shape, 0.123, np.float32)

    walk(variables["params"], (), "params")
    walk(variables["batch_stats"], (), "batch_stats")
    path = tmp_path / "slim.npz"
    np.savez(path, **entries)
    return str(path), len(entries)


def test_import_backbone_roundtrip(tmp_path):
    model = build_model("pixellink_resnet50")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    variables = jax.tree_util.tree_map(np.asarray, dict(variables))
    npz_path, n_entries = _fake_slim_npz_from_model(tmp_path, variables)
    assert n_entries > 100  # resnet50 backbone has ~160 conv/BN params

    new_vars, n_loaded = import_backbone(variables, npz_path)
    # every BN stat entry maps into batch_stats; conv kernels into params
    assert n_loaded > 100
    # the imported tensors carry the sentinel value
    k = new_vars["params"]["backbone"]["conv1"]["Conv_0"]["kernel"]
    assert float(np.asarray(k).ravel()[0]) == pytest.approx(0.123)
    # head params untouched
    head_leaves = jax.tree_util.tree_leaves(
        {k: v for k, v in new_vars["params"].items() if k != "backbone"}
    )
    old_leaves = jax.tree_util.tree_leaves(
        {k: v for k, v in variables["params"].items() if k != "backbone"}
    )
    for a, b in zip(head_leaves, old_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
