"""Every BASELINE.json config preset builds and takes a train step.

Config #5 (v5e-16 DP) runs on the 8-device CPU mesh (the shape of the
sharding is what's validated; chip count scales transparently).
"""

import numpy as np
import pytest

from tensorflow_ocr_tpu.configs import baseline_config
from tensorflow_ocr_tpu.data import icdar
from tensorflow_ocr_tpu.data.pipeline import batch_generator
from tensorflow_ocr_tpu.parallel.mesh import make_mesh
from tensorflow_ocr_tpu.train import trainer as T

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("icdar_cfg"))
    icdar.make_synthetic_dataset(path, num_images=4, size=(128, 128), seed=21)
    return path


@pytest.mark.parametrize("n,n_dev", [(1, 1), (2, 1), (3, 1), (4, 1), (5, 8)])
def test_baseline_config_one_step(dataset, n, n_dev):
    cfg = baseline_config(n)
    cfg.data.training_data_path = dataset
    cfg.data.input_size = 64
    cfg.data.batch_size = max(n_dev, 2) if n != 5 else 8
    cfg.data.max_polys = 8
    mesh = make_mesh(n_dev)
    want_east = cfg.model.name.startswith("east")
    batch = next(batch_generator(cfg.data, want_east=want_east, seed=0))
    tr = T.Trainer(cfg, mesh)
    tr.setup(batch)
    db = T.device_batch(batch, mesh, want_east)
    state, metrics = tr._step_fn(tr.state, db)
    assert np.isfinite(float(metrics["total_loss"])), f"config {n}"
    assert int(state.step) == 1
