"""Machine-scoped persistent XLA compilation cache paths.

The JAX/XLA:CPU persistent cache serializes AOT-compiled executables whose
machine-feature set is baked in at compile time. Loading an entry written on
a host with different CPU features emits ``cpu_aot_loader`` machine-mismatch
errors and can stall or SIGILL the executing device threads — observed as an
8-participant all-reduce rendezvous abort when 7 device threads never arrive
(the MULTICHIP_r04 failure mode: the driver box and this box differ in
``prefer-no-gather``/AMX features). The cache key JAX computes does not
include the host feature set, so we scope the cache *directory* by a
fingerprint of the host CPU instead: a different machine gets a fresh, empty
cache rather than poisonous cross-compiled entries.
"""

import hashlib
import os
import platform

__all__ = ["machine_tag", "machine_scoped_cache_dir"]


def machine_tag() -> str:
    """Short stable fingerprint of this host's ISA feature set.

    Includes the CPU *model name*, not just the feature flags: XLA:CPU
    additionally bakes model-tuned LLVM target features into AOT entries
    (``prefer-no-scatter``/``prefer-no-gather`` are chosen per CPU model),
    so two hosts with identical cpuinfo flags but different models must
    NOT share a cache directory (observed: cpu_aot_loader machine-feature
    mismatch errors when they did).
    """
    feats = ""
    model = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not feats and line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                elif not model and line.startswith(("model name", "Model",
                                                    "Hardware")):
                    model = line.split(":", 1)[1].strip()
                if feats and model:
                    break
    except OSError:
        pass
    key = f"{platform.machine()}:{model}:{feats}"
    return hashlib.sha256(key.encode()).hexdigest()[:12]


def machine_scoped_cache_dir(base: str) -> str:
    """``base`` extended with the host fingerprint; created if possible."""
    path = os.path.join(base, machine_tag())
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        pass
    return path
