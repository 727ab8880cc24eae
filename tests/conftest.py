"""Test env: force an 8-device CPU mesh before any JAX backend initializes.

The container's sitecustomize registers the TPU tunnel backend in every
interpreter and forces its selection regardless of JAX_PLATFORMS, so the
only reliable override is ``jax.config.update('jax_platforms', 'cpu')``
before first backend use. Multi-chip sharding logic (shard_map DP over ICI)
is validated on 8 fake CPU devices per SURVEY.md §4 — no cluster required.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite is dominated by XLA CPU compiles of
# the train/model programs; caching makes re-runs ~10x faster. Scoped by a
# host-CPU fingerprint — entries AOT-compiled on a different machine stall
# or kill device threads when loaded (see utils/xla_cache.py).
from tensorflow_ocr_tpu.utils.xla_cache import machine_scoped_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  machine_scoped_cache_dir("/tmp/ocr_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8 and devs[0].platform == "cpu"
    return devs
