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
