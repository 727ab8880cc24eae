"""Device mesh construction and shard_map data-parallel train steps."""

from tensorflow_ocr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
