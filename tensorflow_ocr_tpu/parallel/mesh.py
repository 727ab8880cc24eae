"""Mesh + sharding helpers.

TPU-native replacement for the reference's in-graph multi-tower data
parallelism (/root/reference/multigpu_train.py:111-133: tf.split across
/gpu:i towers + average_gradients on one device). Here the global batch is
sharded over a 1-D ``data`` mesh axis via NamedSharding; gradients are
pmean'ed over ICI inside a shard_map'd train step (parallel/../train/trainer.py);
multi-host slices extend the same mesh over DCN via jax.distributed
(SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[list] = None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if num_devices is not None:
        if len(devs) < num_devices:
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devs)} devices are visible; refusing to silently "
                f"run at reduced scale (set num_devices=None for all)"
            )
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place host numpy arrays on the mesh, batch dim sharded.

    Non-array entries (e.g. filename lists) are dropped — they never go
    to the device.
    """
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)):
            out[k] = jax.device_put(v, sh)
    return out
