"""Profiling + throughput metering.

Fills the reference's §5.1 gap (it had only wall-clock prints,
multigpu_train.py:179-184): a StepTimer with p50/p90 stats, a trace
context manager around jax.profiler, and named annotations for the
hot phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


class StepTimer:
    """Throughput meter: seconds/step + examples/sec with percentiles."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times: List[float] = []
        self._last: Optional[float] = None

    def tick(self):
        now = time.time()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def stats(self, batch_size: int = 1) -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "sec_per_step_p50": float(np.percentile(arr, 50)),
            "sec_per_step_p90": float(np.percentile(arr, 90)),
            "examples_per_sec": float(batch_size / arr.mean()),
        }


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; no-ops if the backend can't trace."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """Named trace annotation (jax.profiler.TraceAnnotation) context."""
    import jax

    try:
        return jax.profiler.TraceAnnotation(name)
    except Exception:
        return contextlib.nullcontext()
