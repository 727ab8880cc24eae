"""Predictor + utils: score conversion, resize rule, writers, summaries."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from tensorflow_ocr_tpu.infer import (
    link_scores_from_logits,
    pixel_scores_from_logits,
)
from tensorflow_ocr_tpu.utils.image import (
    draw_boxes,
    resize_image,
    write_result_txt,
)
from tensorflow_ocr_tpu.utils.profiling import StepTimer
from tensorflow_ocr_tpu.utils.summary import SummaryWriter

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


def test_pixel_scores_softmax_channel1():
    logits = np.zeros((4, 4, 2), np.float32)
    logits[..., 1] = 10.0
    s = np.asarray(pixel_scores_from_logits(jnp.array(logits)))
    assert s.shape == (4, 4)
    assert (s > 0.99).all()


def test_link_scores_pairwise():
    logits = np.zeros((4, 4, 16), np.float32)
    logits[..., 1::2] = 5.0  # every pair's positive logit high
    s = np.asarray(link_scores_from_logits(jnp.array(logits)))
    assert s.shape == (4, 4, 8)
    assert (s > 0.99).all()


def test_resize_image_32_multiple_rule():
    im = np.zeros((500, 700, 3), np.uint8)
    out, (rh, rw) = resize_image(im)
    # reference rounding: (500//32-1)*32 = 448; (700//32-1)*32 = 640
    assert out.shape[:2] == (448, 640)
    assert rh == pytest.approx(448 / 500)
    im2 = np.zeros((512, 640, 3), np.uint8)
    out2, _ = resize_image(im2)
    assert out2.shape[:2] == (512, 640)  # already multiples of 32


def test_resize_image_caps_long_side():
    im = np.zeros((1000, 8000, 3), np.uint8)
    out, _ = resize_image(im, max_side_len=3000)
    assert max(out.shape[:2]) <= 3000


def test_write_result_txt_crlf(tmp_path):
    boxes = [np.array([[1, 2], [3, 4], [5, 6], [7, 8]])]
    f = write_result_txt(str(tmp_path), "/x/img_1.jpg", boxes)
    raw = open(f, "rb").read()
    assert raw == b"1,2,3,4,5,6,7,8\r\n"
    assert os.path.basename(f) == "res_img_1.txt"


def test_draw_boxes_shape():
    im = np.zeros((50, 50, 3), np.uint8)
    out = draw_boxes(im, [np.array([[5, 5], [40, 5], [40, 40], [5, 40]])])
    assert out.shape == im.shape and out.sum() > 0


def test_step_timer_stats():
    t = StepTimer()
    import time as _t

    for _ in range(4):
        t.tick()
        _t.sleep(0.01)
    s = t.stats(batch_size=8)
    assert s["sec_per_step_p50"] >= 0.009
    assert s["examples_per_sec"] > 0


def test_summary_writer_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss", 1.0, 0)
    w.add_scalars({"a": 1.0, "b": 2.0}, 1)
    w.add_image_hwc("img", np.random.rand(8, 8, 3).astype(np.float32), 0)
    w.add_detection_summaries(
        0,
        images=np.random.rand(1, 8, 8, 3).astype(np.float32) * 255,
        pred_score=np.random.rand(1, 4, 4, 1).astype(np.float32),
    )
    w.flush()
    w.close()
    files = os.listdir(tmp_path)
    assert any("tfevents" in f for f in files)


def test_predictor_detect_self_heals_decode_budget_overflow():
    """A dense map (foreground ~= the whole label map, far beyond the
    default h*w//4 budget) through Predictor.detect must trigger exactly
    one full-budget re-dispatch and return correct boxes instead of the
    silent zero-box outcome (VERDICT r4 item 5 'done' criterion)."""
    from tensorflow_ocr_tpu.config import Config
    from tensorflow_ocr_tpu.infer import Predictor

    cfg = Config()
    cfg.model.name = "pixellink_vgg16"
    cfg.infer.checkpoint_path = "/nonexistent"
    # thresholds at 0: every pixel of the random-init model is foreground
    cfg.infer.pixel_conf_threshold = 0.0
    cfg.infer.link_conf_threshold = 0.0
    p = Predictor(cfg)
    # 512x512 -> 128x128 label map (16384 px) > default budget (4096)
    im = (np.random.RandomState(0).rand(512, 512, 3) * 255).astype(np.uint8)
    boxes, _ = p.detect(im)
    assert p.overflow_retries == 1
    assert len(boxes) >= 1
    # the dominant all-foreground component spans ~the whole image
    spans = [b.max(0) - b.min(0) for b in boxes]
    assert max(s[0] for s in spans) > 400 and max(s[1] for s in spans) > 400
    for b in boxes:
        assert np.all(np.isfinite(b))


def test_predictor_adopts_calibrated_operating_point(tmp_path):
    """A checkpoint dir carrying operating_point.json (written by
    train/calibrate.py at checkpoint time) overrides the static config
    thresholds; use_calibrated_thresholds=False opts out."""
    from tensorflow_ocr_tpu.config import Config
    from tensorflow_ocr_tpu.infer import Predictor
    from tensorflow_ocr_tpu.train.calibrate import save_operating_point

    save_operating_point(str(tmp_path), {"pixel": 0.55, "link": 0.65})
    cfg = Config()
    cfg.model.name = "pixellink_vgg16"
    cfg.infer.checkpoint_path = str(tmp_path)
    p = Predictor(cfg)
    assert p.calibrated
    assert p.pixel_thresh == 0.55 and p.link_thresh == 0.65
    # EAST keys absent -> static defaults retained for them
    assert p.score_thresh == cfg.infer.score_map_thresh

    cfg2 = Config()
    cfg2.model.name = "pixellink_vgg16"
    cfg2.infer.checkpoint_path = str(tmp_path)
    cfg2.infer.use_calibrated_thresholds = False
    p2 = Predictor(cfg2)
    assert not p2.calibrated
    assert p2.pixel_thresh == cfg2.infer.pixel_conf_threshold


def test_min_component_size_scales_with_stride():
    """min_component_size is specified on the stride-4 grid and scales
    with grid area for other strides (the reference's own convention:
    >10 at stride-4 decode vs >200 at full res, test_pixellink.py:174)."""
    from tensorflow_ocr_tpu.config import Config
    from tensorflow_ocr_tpu.infer import Predictor
    from tensorflow_ocr_tpu.train.eval_hook import EvalDuringTraining

    cfg = Config()
    cfg.model.name = "pixellink_vgg16"
    cfg.infer.checkpoint_path = "/nonexistent"
    assert Predictor(cfg).min_size == cfg.infer.min_component_size

    cfg2 = Config()
    cfg2.model.name = "pixellink2s_vgg16"
    cfg2.infer.checkpoint_path = "/nonexistent"
    assert Predictor(cfg2).min_size == cfg2.infer.min_component_size * 4

    hook = EvalDuringTraining(cfg2, "/nonexistent_dir")
    assert hook.min_size == cfg2.infer.min_component_size * 4
