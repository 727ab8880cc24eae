"""Multi-host data parallelism (DCN) helpers.

The reference has no multi-node support of any kind (SURVEY.md §2.8); this
module extends the same 1-D ``data`` mesh across hosts the TPU-native way:
``jax.distributed`` over DCN, global arrays assembled from per-process
local batches. The shard_map train step (train/trainer.py) is unchanged —
the mesh just spans more devices.

Usage on each host of a slice/pod:

    from tensorflow_ocr_tpu.parallel import multihost
    multihost.initialize()                  # env-driven (TPU VMs) or explicit
    mesh = make_mesh()                      # now covers all hosts' devices
    global_batch = multihost.global_batch_from_local(mesh, local_batch)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensorflow_ocr_tpu.parallel.mesh import DATA_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with TPU-VM auto-detection.

    On Cloud TPU VMs all arguments are discovered from the metadata
    environment; pass them explicitly elsewhere. Idempotent.
    """
    # Check the distributed runtime WITHOUT touching jax.process_count():
    # that would initialize the XLA backend first, after which
    # jax.distributed.initialize refuses to run and this helper would
    # silently degrade to single-process.
    try:
        from jax._src.distributed import global_state

        if global_state.client is not None:
            return  # already initialized
    except Exception:
        pass
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        if kwargs:
            raise  # explicit cluster args: a failure is real
        # env auto-detection found no cluster: single-process run — fine


def local_batch_size(global_batch_size: int) -> int:
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} not divisible by {n} hosts"
    )
    return global_batch_size // n


def global_batch_from_local(mesh: Mesh, local_batch: Dict[str, Any]
                            ) -> Dict[str, Any]:
    """Assemble a global, batch-sharded array dict from per-host batches.

    Each process contributes its local shard; jax stitches them into one
    global array sharded over the data axis without any host gathering.
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    out = {}
    for k, v in local_batch.items():
        if isinstance(v, (np.ndarray, jax.Array)):
            out[k] = jax.make_array_from_process_local_data(sharding, np.asarray(v))
    return out
