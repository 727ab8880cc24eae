"""Two-process jax.distributed validation of parallel/multihost.py.

Round-3 verdict (weak #8): the multihost path was only tested in its
single-process degenerate case. This spawns TWO local CPU processes with
2 fake devices each (4 global), joined through a real coordinator
handshake, and asserts global batch assembly + a cross-process psum —
the same mechanics a TPU pod slice runs over DCN.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PALLAS_AXON_POOL_IPS"] = ""  # keep the tunneled TPU out of it
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=root)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-process run timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: multihost ok" in out
