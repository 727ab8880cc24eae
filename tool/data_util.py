"""Adapter for /root/reference/tool/data_util.py: GeneratorEnqueuer.

The reference forks one OS process per worker around a shared generator
(data_util.py:15-129). This rebuild keeps the public API (start /
is_running / stop / queue) with thread workers — cv2 and numpy release the
GIL, and the heavy label math no longer runs on the host at all.
"""

from __future__ import annotations

import queue as _queue
import threading
import time


class GeneratorEnqueuer:
    def __init__(self, generator, use_multiprocessing=False, wait_time=0.05,
                 random_seed=None):
        self._generator = generator
        self.wait_time = wait_time
        self.queue = None
        self._stop_event = None
        self._threads = []

    def start(self, workers=1, max_queue_size=10):
        self.queue = _queue.Queue(maxsize=max_queue_size)
        self._stop_event = threading.Event()
        lock = threading.Lock()

        def task():
            while not self._stop_event.is_set():
                try:
                    with lock:  # generators are not thread-safe
                        item = next(self._generator)
                    self.queue.put(item)
                except StopIteration:
                    return
                except Exception:
                    self._stop_event.set()
                    raise

        for _ in range(workers):
            t = threading.Thread(target=task, daemon=True)
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
        """Convenience: block until one item is available."""
        while self.is_running():
            try:
                return self.queue.get(timeout=self.wait_time)
            except _queue.Empty:
                continue
        raise StopIteration
