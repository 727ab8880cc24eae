"""Machine-scoped XLA cache paths (utils/xla_cache.py).

Cross-machine persistent-cache entries crashed the round-4 multichip
gate (AOT machine-feature mismatch -> rendezvous abort); the cache dir
must be fingerprinted per host and stable within one.
"""

import os

from tensorflow_ocr_tpu.utils.xla_cache import (
    machine_scoped_cache_dir,
    machine_tag,
)


def test_tag_stable_and_short():
    a, b = machine_tag(), machine_tag()
    assert a == b
    assert len(a) == 12 and all(c in "0123456789abcdef" for c in a)


def test_scoped_dir_created_under_base(tmp_path):
    base = str(tmp_path / "cache")
    d = machine_scoped_cache_dir(base)
    assert d == os.path.join(base, machine_tag())
    assert os.path.isdir(d)


def test_tag_depends_on_cpu_model():
    """XLA:CPU bakes model-tuned LLVM features (prefer-no-scatter/gather)
    into AOT entries, so the fingerprint must separate hosts whose
    cpuinfo FLAGS match but whose model differs."""
    import hashlib
    import platform

    feats = model = ""
    with open("/proc/cpuinfo") as f:
        for line in f:
            if not feats and line.startswith(("flags", "Features")):
                feats = " ".join(sorted(line.split(":", 1)[1].split()))
            elif not model and line.startswith(("model name", "Model",
                                                "Hardware")):
                model = line.split(":", 1)[1].strip()
    same = hashlib.sha256(
        f"{platform.machine()}:{model}:{feats}".encode()
    ).hexdigest()[:12]
    other = hashlib.sha256(
        f"{platform.machine()}:not-this-cpu:{feats}".encode()
    ).hexdigest()[:12]
    assert machine_tag() == same
    assert machine_tag() != other
