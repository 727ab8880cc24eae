"""Grain-backed input pipeline (multiprocess, sharded, deterministic).

Production alternative to the thread PrefetchLoader: Grain gives
per-process worker isolation (like the reference's fork-based
GeneratorEnqueuer, tool/data_util.py:15-129, but with deterministic
sharding and checkpointable iterators) — the right choice on real TPU VM
hosts with many cores. Per-host sharding for multi-host DP comes free via
shard_options.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tensorflow_ocr_tpu.config import DataConfig
from tensorflow_ocr_tpu.data import icdar



class _IcdarSource:
    """Random-access source over image files (grain RandomAccessDataSource)."""

    def __init__(self, cfg: DataConfig):
        self.cfg = cfg
        self.files = icdar.get_images(cfg.training_data_path)
        if not self.files:
            raise FileNotFoundError(cfg.training_data_path)

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int):
        return self.files[int(idx)]

    def __repr__(self):
        # stable across instances: grain validates repr(data_source) when
        # restoring iterator state
        return (f"_IcdarSource(path={self.cfg.training_data_path!r}, "
                f"n={len(self.files)})")


def _prepare(cfg: DataConfig, want_east: bool, fn: str,
             rng: np.random.RandomState) -> icdar.Sample:
    s = icdar.prepare_sample(fn, cfg, rng, want_east=want_east)
    if s is None:
        # grain has no filter-in-map; emit an empty dummy matching shapes
        size = cfg.input_size
        k = cfg.max_polys
        s = icdar.Sample(
            image=np.zeros((size, size, 3), np.uint8),
            polys=np.zeros((k, 4, 2), np.float32),
            tags=np.zeros((k,), bool),
            valid=np.zeros((k,), bool),
            shrunk=np.zeros((k, 4, 2), np.float32),
            rects=np.zeros((k, 4, 2), np.float32),
            angles=np.zeros((k,), np.float32),
            fn=fn,
        )
    return s


class CheckpointableLoader:
    """Iterator over collated batch dicts with grain's exact-resume state.

    ``get_state()``/``set_state()`` expose the underlying
    DataLoaderIterator's byte state, so the trainer can persist the data
    position with the model checkpoint and replay the exact remaining
    sample sequence on restore — beyond the reference's ``--restore``,
    which resumed the step counter but re-shuffled the data
    (/root/reference/multigpu_train.py:152-158).
    """

    def __init__(self, loader):
        self._it = iter(loader)

    def __iter__(self):
        return self

    def __next__(self):
        batch = dict(next(self._it))
        batch["fns"] = []  # paths stay host-side; grain drops strings
        return batch

    def get_state(self) -> bytes:
        return self._it.get_state()

    def set_state(self, state: bytes) -> None:
        self._it.set_state(state)


def grain_loader(cfg: DataConfig, want_east: bool = False, seed: int = 0,
                 num_epochs: Optional[int] = None) -> CheckpointableLoader:
    """Returns a checkpointable iterator of collated batch dicts."""
    import grain.python as grain

    class PrepareSample(grain.RandomMapTransform):
        def random_map(self, element, rng):
            # grain seeds `rng` from (seed, epoch, record) — augmentation
            # and background-crop decisions are fresh draws every epoch
            # yet replay exactly on checkpoint resume (a hash(fn) seed
            # would pin each image's fate forever, and differently per
            # interpreter launch)
            rs = np.random.RandomState(int(rng.integers(0, 2**31)))
            s = _prepare(cfg, want_east, element, rs)
            out = {
                "images": s.image,
                "polys": s.polys,
                "tags": s.tags,
                "valid": s.valid,
            }
            if want_east:
                out.update(shrunk=s.shrunk, rects=s.rects, angles=s.angles)
            return out

    source = _IcdarSource(cfg)
    sampler = grain.IndexSampler(
        num_records=len(source),
        shuffle=True,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=grain.ShardByJaxProcess(),
    )
    loader = grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[
            PrepareSample(),
            grain.Batch(cfg.batch_size, drop_remainder=True),
        ],
        worker_count=max(0, cfg.num_workers - 1),
    )
    return CheckpointableLoader(loader)
