"""Eval-during-training hook produces P/R/F from live train state."""

import numpy as np
import pytest

from tensorflow_ocr_tpu.config import Config
from tensorflow_ocr_tpu.data import icdar
from tensorflow_ocr_tpu.data.pipeline import batch_generator
from tensorflow_ocr_tpu.parallel.mesh import make_mesh
from tensorflow_ocr_tpu.train import trainer as T
from tensorflow_ocr_tpu.train.eval_hook import EvalDuringTraining

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("icdar_hook"))
    icdar.make_synthetic_dataset(path, num_images=3, size=(128, 128), seed=31)
    return path


def test_eval_hook_runs_on_train_state(dataset):
    cfg = Config()
    cfg.data.training_data_path = dataset
    cfg.data.input_size = 64
    cfg.data.batch_size = 2
    cfg.data.max_polys = 8
    cfg.model.name = "pixellink_vgg16"
    cfg.infer.pixel_conf_threshold = 0.3
    cfg.infer.link_conf_threshold = 0.01
    cfg.infer.min_component_size = 1
    cfg.infer.max_components = 16

    mesh = make_mesh(1)
    batch = next(batch_generator(cfg.data, seed=0))
    tr = T.Trainer(cfg, mesh)
    tr.setup(batch)
    db = T.device_batch(batch, mesh, False)
    state, _ = tr._step_fn(tr.state, db)

    hook = EvalDuringTraining(cfg, dataset, max_images=3)
    r = hook(tr.model, state)
    assert set(r) >= {"precision", "recall", "fmean"}
    assert r["n_gt"] > 0
    assert np.isfinite(r["fmean"])


def test_eval_hook_east_threshold_overrides(dataset):
    """EAST path: score_thresh is a traced arg (one compile serves the
    sweep) and nms_thresh overrides the config at call time."""
    cfg = Config()
    cfg.data.training_data_path = dataset
    cfg.data.input_size = 64
    cfg.data.batch_size = 2
    cfg.data.max_polys = 8
    cfg.model.name = "east_resnet50"
    cfg.loss.name = "east"

    mesh = make_mesh(1)
    batch = next(batch_generator(cfg.data, seed=0, want_east=True))
    tr = T.Trainer(cfg, mesh)
    tr.setup(batch)
    db = T.device_batch(batch, mesh, True)
    state, _ = tr._step_fn(tr.state, db)

    hook = EvalDuringTraining(cfg, dataset, max_images=3)
    r_default = hook(tr.model, state)
    assert set(r_default) >= {"precision", "recall", "fmean"}
    # a permissive operating point must not detect fewer boxes than an
    # impossibly strict one (score > 1 kills every candidate)
    r_loose = hook(tr.model, state, score_thresh=0.0, nms_thresh=0.3)
    r_strict = hook(tr.model, state, score_thresh=1.1, nms_thresh=0.3)
    assert r_strict["tp"] + r_strict["fp"] == 0
    assert r_loose["tp"] + r_loose["fp"] >= 0
    for r in (r_default, r_loose, r_strict):
        assert np.isfinite(r["fmean"])
