"""Exact mid-epoch resume via grain's checkpointable iterator state.

The reference's --restore (multigpu_train.py:152-158) resumed the step
counter but re-shuffled the data; the rebuild persists the data position
with the checkpoint and replays the exact remaining sample sequence.
"""

import os

import numpy as np
import pytest

from tensorflow_ocr_tpu.config import Config
from tensorflow_ocr_tpu.data import icdar
from tensorflow_ocr_tpu.data.grain_pipeline import grain_loader
from tensorflow_ocr_tpu.train.trainer import (
    DATA_ITER_STATE_FILE,
    restore_data_iter,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("grain_ds"))
    icdar.make_synthetic_dataset(d, num_images=12, size=(96, 96))
    return d


def _cfg(data_dir):
    cfg = Config()
    cfg.data.training_data_path = data_dir
    cfg.data.input_size = 64
    cfg.data.batch_size = 2
    cfg.data.max_polys = 4
    cfg.data.num_workers = 1
    return cfg


def _sig(batch):
    return float(np.sum(batch["images"], dtype=np.float64))


def test_grain_iterator_state_replays_exact_sequence(data_dir):
    cfg = _cfg(data_dir)
    it = grain_loader(cfg.data, seed=3, num_epochs=2)
    for _ in range(3):
        next(it)
    state = it.get_state()
    want = [_sig(next(it)) for _ in range(4)]

    it2 = grain_loader(cfg.data, seed=3, num_epochs=2)
    it2.set_state(state)
    got = [_sig(next(it2)) for _ in range(4)]
    assert got == want


def test_restore_data_iter_roundtrip(tmp_path, data_dir):
    """save_checkpoint-style file persistence + restore_data_iter."""
    cfg = _cfg(data_dir)
    it = grain_loader(cfg.data, seed=5, num_epochs=2)
    next(it), next(it)
    ckpt_dir = str(tmp_path / "ckpt_2")
    os.makedirs(ckpt_dir)
    with open(os.path.join(ckpt_dir, DATA_ITER_STATE_FILE), "wb") as f:
        f.write(it.get_state())
    want = [_sig(next(it)) for _ in range(3)]

    it2 = grain_loader(cfg.data, seed=5, num_epochs=2)
    assert restore_data_iter(ckpt_dir, it2)
    got = [_sig(next(it2)) for _ in range(3)]
    assert got == want

    # missing state file or stateless iterator -> False, no crash
    assert not restore_data_iter(str(tmp_path / "nope"), it2)
    assert not restore_data_iter(ckpt_dir, iter([1, 2]))
