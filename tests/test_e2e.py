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
