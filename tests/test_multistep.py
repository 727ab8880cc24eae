"""In-device multi-step training: scan loop, 8-device DP, device cache."""

import numpy as np
import jax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tensorflow_ocr_tpu.config import Config
from tensorflow_ocr_tpu.data import icdar
from tensorflow_ocr_tpu.data.device_cache import DeviceDataset
from tensorflow_ocr_tpu.parallel.mesh import make_mesh
from tensorflow_ocr_tpu.train import trainer as T

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("icdar_ms"))
    icdar.make_synthetic_dataset(path, num_images=6, size=(128, 128), seed=5)
    return path


def _cfg(path, batch=2):
    cfg = Config()
    cfg.data.training_data_path = path
    cfg.data.input_size = 64
    cfg.data.batch_size = batch
    cfg.data.max_polys = 8
    cfg.model.name = "pixellink_vgg16"
    cfg.loss.name = "ohem"
    cfg.train.scan_steps = 3
    return cfg


def test_device_dataset_stages_and_precomputes(dataset):
    cfg = _cfg(dataset)
    ds = DeviceDataset(cfg.data, precompute_labels=True)
    assert ds.images.dtype == np.uint8
    assert ds.images.shape[1:] == (64, 64, 3)
    assert set(ds.labels) == {"score", "link", "mask"}
    assert ds.labels["score"].shape == (ds.n, 16, 16, 1)
    idx = ds.index_batches(2, 5, np.random.RandomState(0))
    assert idx.shape == (5, 2) and idx.max() < ds.n


def test_multi_step_trains_and_counts_steps(dataset):
    cfg = _cfg(dataset)
    mesh = make_mesh(1)
    ds = DeviceDataset(cfg.data, precompute_labels=True)
    rep = NamedSharding(mesh, P())
    ds_dev = {k: jax.device_put(v, rep) for k, v in ds.arrays().items()}
    idx_sh = NamedSharding(mesh, P(None, "data"))
    tr = T.Trainer(cfg, mesh)
    tr.setup({k: ds.arrays()[k][:1] for k in ("images", "polys", "tags", "valid")})
    multi = T.make_multi_train_step(
        tr.model, tr.tx, cfg, mesh, extra_keys=tuple(ds.labels.keys())
    )
    rng = np.random.RandomState(0)
    idx = ds.index_batches(2, 3, rng)
    state, m = multi(tr.state, ds_dev, jax.device_put(idx, idx_sh))
    assert int(state.step) == 3
    l0 = float(m["total_loss"])
    for _ in range(4):
        idx = ds.index_batches(2, 3, rng)
        state, m = multi(state, ds_dev, jax.device_put(idx, idx_sh))
    assert int(state.step) == 15
    assert float(m["total_loss"]) < l0  # training signal


def test_multi_step_8device_dp(dataset):
    cfg = _cfg(dataset, batch=8)
    mesh = make_mesh(8)
    ds = DeviceDataset(cfg.data, precompute_labels=True)
    rep = NamedSharding(mesh, P())
    ds_dev = {k: jax.device_put(v, rep) for k, v in ds.arrays().items()}
    idx_sh = NamedSharding(mesh, P(None, "data"))
    tr = T.Trainer(cfg, mesh)
    tr.setup({k: ds.arrays()[k][:1] for k in ("images", "polys", "tags", "valid")})
    multi = T.make_multi_train_step(
        tr.model, tr.tx, cfg, mesh, extra_keys=tuple(ds.labels.keys())
    )
    idx = ds.index_batches(8, 2, np.random.RandomState(0))
    state, m = multi(tr.state, ds_dev, jax.device_put(idx, idx_sh))
    assert int(state.step) == 2
    assert np.isfinite(float(m["total_loss"]))


def test_run_device_cached_loop(dataset, tmp_path):
    cfg = _cfg(dataset)
    cfg.train.checkpoint_path = str(tmp_path / "ckpt")
    cfg.train.max_steps = 6
    cfg.train.save_checkpoint_steps = 0
    mesh = make_mesh(1)
    tr = T.Trainer(cfg, mesh)
    metrics = tr.run_device_cached()
    assert np.isfinite(metrics["total_loss"])
    assert int(tr.state.step) == 6
    # steady-state throughput (compile-excluded): 2 dispatches ran, the
    # first is excluded as the compile dispatch, so the key must exist
    assert metrics["images_per_sec_steady"] > 0


def test_run_device_cached_rejects_augmentation(dataset):
    cfg = _cfg(dataset)
    cfg.data.use_crop = True
    tr = T.Trainer(cfg, make_mesh(1))
    with pytest.raises(AssertionError):
        tr.run_device_cached()


def test_run_device_cached_with_device_augment(dataset):
    """Augmentation flags on + device cache -> on-device augment inside
    the scan body (no host pipeline), loss finite and steps counted."""
    cfg = _cfg(dataset)
    cfg.data.use_crop = True
    cfg.data.use_rotate = True
    cfg.data.use_random_scale = True
    cfg.data.random_scale = (0.75, 1.0, 1.5)
    cfg.train.max_steps = 6
    cfg.train.save_checkpoint_steps = 0
    mesh = make_mesh(1)
    tr = T.Trainer(cfg, mesh)
    m = tr.run_device_cached()
    assert int(tr.state.step) == 6
    assert np.isfinite(m["total_loss"])


def test_run_device_cached_augment_east(dataset):
    cfg = _cfg(dataset)
    cfg.model.name = "east_vgg16"
    cfg.loss.name = "east"
    cfg.data.use_rotate = True
    cfg.train.max_steps = 3
    cfg.train.save_checkpoint_steps = 0
    mesh = make_mesh(1)
    tr = T.Trainer(cfg, mesh)
    m = tr.run_device_cached()
    assert int(tr.state.step) == 3
    assert np.isfinite(m["total_loss"])


def test_device_augment_8device_mesh(dataset):
    """Augmented scan step compiles and runs under 8-device shard_map
    (per-shard RNG decorrelation via axis_index fold-in)."""
    cfg = _cfg(dataset, batch=8)
    cfg.data.use_rotate = True
    cfg.data.use_random_scale = True
    cfg.train.max_steps = 3
    cfg.train.scan_steps = 3
    cfg.train.save_checkpoint_steps = 0
    mesh = make_mesh(8)
    tr = T.Trainer(cfg, mesh)
    m = tr.run_device_cached()
    assert int(tr.state.step) == 3
    assert np.isfinite(m["total_loss"])
