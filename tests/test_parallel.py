"""Mesh/sharding helpers + multihost utilities (single-process semantics)."""

import numpy as np
import jax
import pytest
from jax.sharding import PartitionSpec as P

from tensorflow_ocr_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from tensorflow_ocr_tpu.parallel import multihost

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


def test_make_mesh_sizes(cpu_devices):
    assert make_mesh().devices.size == 8
    assert make_mesh(4).devices.size == 4


def test_shard_batch_places_arrays(cpu_devices):
    mesh = make_mesh(8)
    batch = {
        "images": np.zeros((8, 4, 4, 3), np.uint8),
        "fns": ["a"] * 8,  # non-array dropped
    }
    out = shard_batch(mesh, batch)
    assert "fns" not in out
    sh = out["images"].sharding
    assert sh.spec == P("data")


def test_replicated_sharding(cpu_devices):
    mesh = make_mesh(8)
    x = jax.device_put(np.ones((4,)), replicated_sharding(mesh))
    assert x.sharding.spec == P()


def test_multihost_single_process(cpu_devices):
    # initialize() is a no-op single-process
    multihost.initialize()
    assert multihost.local_batch_size(16) == 16
    mesh = make_mesh(8)
    g = multihost.global_batch_from_local(
        mesh, {"images": np.zeros((8, 2, 2, 3), np.uint8)}
    )
    assert g["images"].shape == (8, 2, 2, 3)
    assert g["images"].sharding.spec == P("data")


def test_local_batch_size_divisibility():
    with pytest.raises(AssertionError):
        # single process: any size divides; simulate failure via monkey
        import jax as j

        orig = j.process_count
        j.process_count = lambda: 3
        try:
            multihost.local_batch_size(16)
        finally:
            j.process_count = orig
