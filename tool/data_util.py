"""Adapter for /root/reference/tool/data_util.py: GeneratorEnqueuer.

The reference (data_util.py:15-129, a Keras fork) forks one OS process per
worker, each with its OWN copy of the generator and a reseeded numpy RNG
(random_seed + worker_index, data_util.py:69-77) — workers produce batches
independently and in parallel.

This rebuild keeps the public API (start / is_running / stop / queue / get)
with thread workers (cv2 and numpy release the GIL; the heavy label math
runs on device in this framework, so threads saturate the host side):

- Pass a zero-arg GENERATOR FACTORY to get the reference's parallel
  semantics: each worker builds its own generator, with numpy reseeded to
  random_seed + worker_index first, exactly like the fork-per-worker
  behavior of the reference's multiprocessing path.
- Passing an already-constructed generator still works but serializes
  workers behind a lock (generators are not thread-safe); prefer a factory.
"""

from __future__ import annotations

import queue as _queue
import threading
import time
import warnings

import numpy as np


class EnqueuerStopped(RuntimeError):
    """Raised by get_one() when the enqueuer was stopped before an item
    became available (distinct from iterator exhaustion; a bare
    StopIteration would turn into RuntimeError under PEP 479 when raised
    inside a generator)."""


class GeneratorEnqueuer:
    def __init__(self, generator, use_multiprocessing=False, wait_time=0.05,
                 random_seed=None):
        # A callable is treated as a factory (one generator per worker).
        self._factory = generator if callable(generator) else None
        self._generator = None if self._factory else generator
        self._lock = threading.Lock()
        self.wait_time = wait_time
        self.random_seed = random_seed
        self.queue = None
        self._stop_event = None
        self._threads = []

    def start(self, workers=1, max_queue_size=10):
        self.queue = _queue.Queue(maxsize=max_queue_size)
        self._stop_event = threading.Event()

        def task(worker_index: int):
            if self._factory is not None:
                # Per-worker stream (reference data_util.py:69-77 forks a
                # process and reseeds the fork's global RNG). Workers here
                # are threads sharing one process-global numpy RNG, so
                # reseeding it would race across workers and clobber the
                # main thread's stream; instead hand each worker a private
                # RandomState when the factory accepts one.
                if self.random_seed is not None:
                    rng = np.random.RandomState(
                        self.random_seed + worker_index)
                    try:
                        gen = self._factory(rng)
                    except TypeError:
                        gen = self._factory()
                else:
                    gen = self._factory()
                lock = None
            else:
                if worker_index == 0 and workers > 1:
                    warnings.warn(
                        "GeneratorEnqueuer was given an already-constructed "
                        "generator; workers are serialized behind a lock. "
                        "Pass a zero-arg generator FACTORY for parallel "
                        "workers (see module docstring).",
                        RuntimeWarning, stacklevel=2)
                gen = self._generator
                lock = self._lock
            while not self._stop_event.is_set():
                try:
                    if lock is None:
                        item = next(gen)
                    else:
                        with lock:
                            item = next(gen)
                    self.queue.put(item)
                except StopIteration:
                    return
                except Exception:
                    self._stop_event.set()
                    raise

        for i in range(workers):
            t = threading.Thread(target=task, args=(i,), daemon=True)
            t.start()
            self._threads.append(t)

    def is_running(self):
        return self._stop_event is not None and not self._stop_event.is_set()

    def stop(self, timeout=None):
        if self.is_running():
            self._stop_event.set()
        for t in self._threads:
            if t.is_alive():
                t.join(timeout or self.wait_time)
        self._threads = []
        self._stop_event = None
        self.queue = None

    def get(self):
        """Generator draining the queue, skipping None (reference
        data_util.py:115-129)."""
        while self.is_running():
            try:
                item = self.queue.get(timeout=self.wait_time)
            except _queue.Empty:
                continue
            if item is not None:
                yield item

    def get_one(self):
        """Block until one item is available (round-1 API, kept).

        Raises :class:`EnqueuerStopped` if the enqueuer is stopped."""
        while self.is_running():
            try:
                return self.queue.get(timeout=self.wait_time)
            except _queue.Empty:
                continue
        raise EnqueuerStopped("GeneratorEnqueuer is stopped")
