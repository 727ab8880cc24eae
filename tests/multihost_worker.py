"""Worker process for the 2-process jax.distributed CPU test.

Launched by tests/test_multihost_2proc.py as
``python tests/multihost_worker.py <process_id> <port>`` with
XLA_FLAGS forcing 2 host-platform devices per process (4 global).
Exercises parallel/multihost.py beyond its single-process degenerate
case: real coordinator handshake, global batch assembly from per-host
shards, and a cross-process collective (SURVEY.md §2.8b).
"""

import os
import sys


def main():
    proc_id = int(sys.argv[1])
    port = sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tensorflow_ocr_tpu.parallel import multihost

    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=2, process_id=proc_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from tensorflow_ocr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    assert mesh.devices.size == 4

    assert multihost.local_batch_size(8) == 4

    # each process contributes rows filled with its process id
    local = {"images": np.full((2, 4), float(proc_id), np.float32)}
    g = multihost.global_batch_from_local(mesh, local)
    assert g["images"].shape == (4, 4), g["images"].shape

    # cross-process psum over the data axis: every shard must see the
    # global per-column sum over all 4 rows = 2 rows of 0 + 2 rows of 1
    def f(x):
        return jax.lax.psum(jnp.sum(x, axis=0, keepdims=True), "data")

    out = jax.jit(shard_map(f, mesh=mesh, in_specs=P("data"),
                            out_specs=P("data")))(g["images"])
    # fetch only this process's addressable shards
    vals = [np.asarray(s.data) for s in out.addressable_shards]
    for v in vals:
        np.testing.assert_allclose(v, 2.0)
    print(f"proc {proc_id}: multihost ok")


if __name__ == "__main__":
    main()
