"""The five BASELINE.json benchmark configurations as runnable presets.

BASELINE.json "configs" (verbatim intent):
 1. EAST VGG-16 @ 512 on a 10-image ICDAR subset (single-step CPU train +
    single-image infer)
 2. EAST ResNet-50 RBOX @ 512, full ICDAR-2015 train, dice + geometry
 3. PixelLink VGG-16 (2s head) with link decode + CC box extraction
    (test_pixellink_fast path)
 4. Focal-loss EAST @ 768 with heavy augmentation fused into the pipeline
 5. Data-parallel EAST ResNet-50 on v5e-16 via shard_map

Use: ``from tensorflow_ocr_tpu.configs import baseline_config;
cfg = baseline_config(2)`` or the CLI entries with
``--preset=N``-style wiring.
"""

from __future__ import annotations

from tensorflow_ocr_tpu.config import Config


def baseline_config(n: int) -> Config:
    cfg = Config()
    if n == 1:
        cfg.model.name = "east_vgg16"
        cfg.loss.name = "east"
        cfg.data.input_size = 512
        cfg.data.batch_size = 2
        cfg.train.num_devices = 1
        cfg.train.max_steps = 1
    elif n == 2:
        cfg.model.name = "east_resnet50"
        cfg.loss.name = "east"  # dice score + IoU geometry + angle
        cfg.data.input_size = 512
        cfg.data.batch_size = 14
        cfg.data.geometry = "RBOX"
    elif n == 3:
        cfg.model.name = "pixellink2s_vgg16"
        cfg.loss.name = "ohem"
        cfg.data.input_size = 512
        cfg.data.batch_size = 14
        cfg.infer.link_conf_threshold = 0.9
        cfg.infer.min_component_size = 10
    elif n == 4:
        cfg.model.name = "east_resnet50"
        cfg.loss.name = "focal"
        cfg.data.input_size = 768
        cfg.data.batch_size = 8
        cfg.data.use_random_scale = True
        cfg.data.use_crop = True
        cfg.data.use_rotate = True
    elif n == 5:
        cfg.model.name = "east_resnet50"
        cfg.loss.name = "east"
        cfg.data.input_size = 512
        cfg.data.batch_size = 14 * 16  # global batch over a v5e-16 mesh
        cfg.train.num_devices = 16
    else:
        raise ValueError(f"baseline config {n} not in 1..5")
    return cfg
