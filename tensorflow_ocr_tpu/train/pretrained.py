"""ImageNet warm-start: slim checkpoint names -> Flax parameter tree.

The reference warm-starts its backbones from TF-slim ImageNet checkpoints
via slim.assign_from_checkpoint_fn(ignore_missing_vars=True)
(/root/reference/multigpu_train.py:149-151). This module provides the
equivalent: a name mapping from slim variables to this repo's Flax modules
and a merge that loads every matching tensor and leaves the rest
initialized (the ignore_missing_vars semantics).

TF checkpoints are a TF-proprietary tensor-bundle format; convert them to
.npz once in any TF environment:

    import numpy as np, tensorflow as tf
    reader = tf.train.load_checkpoint("resnet_v1_50.ckpt")
    np.savez("resnet_v1_50.npz",
             **{k: reader.get_tensor(k)
                for k in reader.get_variable_to_shape_map()})

then pass the .npz path here. Slim conv kernels are already HWIO —
identical to Flax — so tensors transfer without transposition.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def slim_to_flax_key(name: str) -> Tuple[Tuple[str, ...], str] | None:
    """Map one slim variable name to (flax_path, collection).

    collection is 'params' or 'batch_stats'. Returns None for variables we
    do not import (logits, global_step, optimizer slots).
    """
    name = name.split(":")[0]
    if any(s in name for s in ("logits", "global_step", "Momentum", "Adam",
                               "ExponentialMovingAverage", "biased",
                               "local_step")):
        return None

    bn_map = {
        "gamma": ("scale", "params"),
        "beta": ("bias", "params"),
        "moving_mean": ("mean", "batch_stats"),
        "moving_variance": ("var", "batch_stats"),
    }

    # ResNet: resnet_v1_50/conv1/weights, resnet_v1_50/block1/unit_2/
    #         bottleneck_v1/conv3/BatchNorm/gamma, .../shortcut/weights
    m = re.match(r"resnet_v1_\d+/(.+)", name)
    if m:
        rest = m.group(1)
        rest = rest.replace("bottleneck_v1/", "")
        rest = re.sub(r"block(\d+)/unit_(\d+)/", r"block\1_unit\2/", rest)
        parts = rest.split("/")
        if parts[-1] == "weights":
            return ("backbone", *parts[:-1], "Conv_0", "kernel"), "params"
        if len(parts) >= 2 and parts[-2] == "BatchNorm" and parts[-1] in bn_map:
            leaf, coll = bn_map[parts[-1]]
            return ("backbone", *parts[:-2], "BatchNorm_0", leaf), coll
        return None

    # VGG: vgg_16/conv1/conv1_1/weights, vgg_16/fc6/weights
    m = re.match(r"vgg_16/(.+)", name)
    if m:
        parts = m.group(1).split("/")
        if parts[-1] not in ("weights", "biases"):
            return None
        layer = parts[-2]  # conv1_1 / fc6 / fc7
        leaf = "kernel" if parts[-1] == "weights" else "bias"
        return ("backbone", layer, leaf), "params"
    return None


def load_slim_npz(npz_path: str) -> Dict[str, Dict]:
    """Read a converted slim .npz into {'params': tree, 'batch_stats': tree}."""
    raw = np.load(npz_path)
    out: Dict[str, Dict] = {"params": {}, "batch_stats": {}}
    for name in raw.files:
        mapped = slim_to_flax_key(name)
        if mapped is None:
            continue
        path, coll = mapped
        node = out[coll]
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(raw[name])
    return out


def import_backbone(variables, npz_path: str):
    """Merge matching backbone tensors into a Detector variables pytree.

    Returns (new_variables, n_loaded). Shape-mismatched or missing tensors
    are skipped (ignore_missing_vars).
    """
    import jax

    pre = load_slim_npz(npz_path)

    def merge(coll_name, tree):
        pre_tree = pre.get(coll_name, {})
        flat = jax.tree_util.tree_flatten_with_path(tree)
        pre_flat = {}

        def walk(node, path):
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v, path + (k,))
                else:
                    pre_flat[path + (k,)] = v

        walk(pre_tree, ())
        out = []
        n = 0
        for path, leaf in flat[0]:
            key = tuple(
                getattr(p, "key", getattr(p, "name", str(p))) for p in path
            )
            cand = pre_flat.get(key)
            if cand is not None and cand.shape == leaf.shape:
                out.append(np.asarray(cand, leaf.dtype))
                n += 1
            else:
                out.append(leaf)
        return jax.tree_util.tree_unflatten(flat[1], out), n

    total = 0
    new_vars = dict(variables)
    for coll in ("params", "batch_stats"):
        if coll in variables:
            new_vars[coll], n = merge(coll, variables[coll])
            total += n
    return new_vars, total
