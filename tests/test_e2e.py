"""End-to-end slice (BASELINE config #1 shape): synthetic ICDAR subset ->
train steps -> checkpoint -> inference -> res_*.txt -> P/R/F evaluation.

Exercises L1..L6 of SURVEY.md §1 with no pretrained weights on CPU.
"""

import os

import numpy as np
import pytest

from tensorflow_ocr_tpu.config import Config
from tensorflow_ocr_tpu.data import icdar
from tensorflow_ocr_tpu.data.pipeline import batch_generator
from tensorflow_ocr_tpu.eval.metrics import evaluate_icdar_directory
from tensorflow_ocr_tpu.parallel.mesh import make_mesh
from tensorflow_ocr_tpu.train import trainer as T

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("icdar_e2e"))
    icdar.make_synthetic_dataset(path, num_images=3, size=(256, 256), seed=11)
    return path


def test_train_checkpoint_infer_eval(dataset, tmp_path):
    cfg = Config()
    cfg.data.training_data_path = dataset
    cfg.data.input_size = 128
    cfg.data.batch_size = 2
    cfg.data.max_polys = 8
    cfg.model.name = "pixellink_vgg16"
    cfg.loss.name = "dice"
    cfg.train.checkpoint_path = str(tmp_path / "ckpt")
    cfg.infer.checkpoint_path = cfg.train.checkpoint_path
    cfg.infer.test_data_path = dataset
    cfg.infer.output_dir = str(tmp_path / "res")
    cfg.infer.pixel_conf_threshold = 0.3
    cfg.infer.link_conf_threshold = 0.1
    cfg.infer.min_component_size = 1
    cfg.infer.max_side_len = 256

    mesh = make_mesh(1)
    gen = batch_generator(cfg.data, seed=0)
    batch = next(gen)
    tr = T.Trainer(cfg, mesh)
    tr.setup(batch)
    db = T.device_batch(batch, mesh, False)
    state = tr.state
    for _ in range(3):
        state, metrics = tr._step_fn(state, db)
    assert np.isfinite(float(metrics["total_loss"]))
    T.save_checkpoint(cfg.train.checkpoint_path, state)
    assert T.latest_checkpoint(cfg.train.checkpoint_path)

    # inference through the real Predictor (restores the checkpoint's EMA)
    from tensorflow_ocr_tpu.infer import Predictor
    from tensorflow_ocr_tpu.utils.image import write_result_txt
    import cv2

    predictor = Predictor(cfg)
    n_boxes = 0
    for im_fn in icdar.get_images(dataset):
        im = cv2.imread(im_fn)[:, :, ::-1]
        boxes, net_ms = predictor.detect(im)
        n_boxes += len(boxes)
        write_result_txt(cfg.infer.output_dir, im_fn, boxes)
    # an undertrained net may or may not fire; the pipeline must not crash
    assert os.path.isdir(cfg.infer.output_dir)
    res_files = [f for f in os.listdir(cfg.infer.output_dir)
                 if f.startswith("res_")]
    assert len(res_files) == 3

    r = evaluate_icdar_directory(cfg.infer.output_dir, dataset)
    assert set(r) >= {"precision", "recall", "fmean"}


def test_overfit_learns_detection(tmp_path):
    """CI gate on LEARNED quality, not just mechanics: overfit a tiny
    backbone on two easy scenes and require F > 0 on them. The other e2e
    slices pass even if the loss/label/decode chain silently breaks
    semantics while still compiling (VERDICT r3 weak #5); this one goes
    red in that case."""
    data = str(tmp_path / "overfit_ds")
    icdar.make_synthetic_dataset(data, num_images=2, size=(128, 128),
                                 seed=5)
    cfg = Config()
    cfg.model.name = "pixellink_tiny"
    cfg.loss.name = "ohem"
    cfg.data.training_data_path = data
    cfg.data.input_size = 128
    cfg.data.batch_size = 2
    cfg.data.max_polys = 8
    cfg.data.min_text_size = 2
    cfg.train.max_steps = 600
    cfg.train.scan_steps = 50
    cfg.train.learning_rate = 1e-3
    cfg.train.save_checkpoint_steps = 0
    cfg.train.checkpoint_path = str(tmp_path / "ckpt_overfit")
    cfg.infer.checkpoint_path = cfg.train.checkpoint_path
    cfg.infer.test_data_path = data
    cfg.infer.output_dir = str(tmp_path / "res_overfit")
    cfg.infer.pixel_conf_threshold = 0.6
    cfg.infer.link_conf_threshold = 0.5
    cfg.infer.min_component_size = 1
    cfg.infer.max_side_len = 128

    mesh = make_mesh(1)
    tr = T.Trainer(cfg, mesh)
    metrics = tr.run_device_cached()
    assert np.isfinite(metrics["total_loss"])
    T.save_checkpoint(cfg.train.checkpoint_path, tr.state)

    from tensorflow_ocr_tpu.infer import Predictor
    from tensorflow_ocr_tpu.utils.image import write_result_txt
    import cv2

    predictor = Predictor(cfg)
    for im_fn in icdar.get_images(data):
        im = cv2.imread(im_fn)[:, :, ::-1]
        boxes, _ = predictor.detect(im)
        write_result_txt(cfg.infer.output_dir, im_fn, boxes)
    r = evaluate_icdar_directory(cfg.infer.output_dir, data)
    assert r["fmean"] > 0.0, (
        f"overfit slice learned nothing: {r} — the loss/label/decode "
        f"chain is semantically broken even though it compiles")


def test_east_train_infer_eval(dataset, tmp_path):
    """Same L1..L6 slice for the EAST family: IoU+angle loss -> EMA
    checkpoint -> Predictor east path (device top-K RBOX restore + host
    locality-aware NMS with the candidate cap) -> res_*.txt -> eval."""
    cfg = Config()
    cfg.data.training_data_path = dataset
    cfg.data.input_size = 128
    cfg.data.batch_size = 2
    cfg.data.max_polys = 8
    cfg.model.name = "east_vgg16"
    cfg.loss.name = "east"
    cfg.train.checkpoint_path = str(tmp_path / "ckpt_east")
    cfg.infer.checkpoint_path = cfg.train.checkpoint_path
    cfg.infer.test_data_path = dataset
    cfg.infer.output_dir = str(tmp_path / "res_east")
    cfg.infer.score_map_thresh = 0.2
    cfg.infer.box_thresh = 0.0
    cfg.infer.max_side_len = 256
    cfg.infer.nms_max_candidates = 64  # exercise the cap path

    mesh = make_mesh(1)
    gen = batch_generator(cfg.data, seed=0, want_east=True)
    batch = next(gen)
    tr = T.Trainer(cfg, mesh)
    tr.setup(batch)
    db = T.device_batch(batch, mesh, True)
    state = tr.state
    for _ in range(3):
        state, metrics = tr._step_fn(state, db)
    assert np.isfinite(float(metrics["total_loss"]))
    T.save_checkpoint(cfg.train.checkpoint_path, state)

    from tensorflow_ocr_tpu.infer import Predictor
    from tensorflow_ocr_tpu.utils.image import write_result_txt
    import cv2
    import warnings

    predictor = Predictor(cfg)
    for im_fn in icdar.get_images(dataset):
        im = cv2.imread(im_fn)[:, :, ::-1]
        with warnings.catch_warnings():
            # undertrained score maps legitimately trip the NMS cap
            warnings.simplefilter("ignore", RuntimeWarning)
            boxes, net_ms = predictor.detect(im)
        write_result_txt(cfg.infer.output_dir, im_fn, boxes)
    res_files = [f for f in os.listdir(cfg.infer.output_dir)
                 if f.startswith("res_")]
    assert len(res_files) == 3
    r = evaluate_icdar_directory(cfg.infer.output_dir, dataset)
    assert set(r) >= {"precision", "recall", "fmean"}
