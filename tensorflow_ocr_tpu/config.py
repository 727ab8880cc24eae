"""Typed configuration tree.

Replaces the reference's ``tf.app.flags`` global singleton scattered across
modules (flags defined at import time in ``datasets/icdar.py:17-30``,
``nets/model.py:6``, ``multigpu_train.py:6-17``, ``test.py:3-7`` of the
reference). One dataclass tree + CLI override parsing; entry-point scripts
keep the reference's public flag names.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence


@dataclass
class DataConfig:
    """Reference: /root/reference/datasets/icdar.py:17-30."""

    training_data_path: str = "/data/ocr/icdar2015/"
    max_image_large_side: int = 1280
    max_text_size: int = 800
    # Polys with min side below this are masked out of training
    # (reference icdar.py:512).
    min_text_size: int = 10
    min_crop_side_ratio: float = 0.1
    geometry: str = "RBOX"  # RBOX | QUAD
    input_size: int = 512
    batch_size: int = 14
    num_workers: int = 8
    max_queue_size: int = 24
    # Static padding bound for per-image polygon count (jit-friendly label
    # generation needs fixed shapes; reference used dynamic Python lists).
    max_polys: int = 64
    # Augmentation (reference has random_scale + crop_area wired but mostly
    # disabled at icdar.py:576-600; the heavy-aug config re-enables them).
    random_scale: Sequence[float] = (0.5, 1.0, 2.0, 3.0)
    use_random_scale: bool = False
    use_crop: bool = False
    # Probability of drawing a text-free background crop instead of a text
    # sample (needs use_crop). The reference defines the 3/8 flag but hard
    # disables the branch (datasets/icdar.py:582 `if (0):`), so the wired
    # default stays 0; set >0 to enable the intended behavior.
    background_ratio: float = 0.0
    use_rotate: bool = False
    max_rotate_deg: float = 10.0
    # Cache decoded JPEG frames (pre-augmentation) across epochs.
    cache_decoded_images: bool = True


@dataclass
class ModelConfig:
    # pixellink_resnet50 | pixellink_vgg16 | east_resnet50 | east_resnet101
    # | east_vgg16 | link8_resnet50
    name: str = "pixellink_resnet50"
    # EAST geometry scale (reference nets/model.py:6,78).
    text_scale: int = 512
    weight_decay: float = 1e-5
    bn_momentum: float = 0.997  # reference BN decay (nets/model.py:95)
    bn_epsilon: float = 1e-5
    # bf16 activations/weights on the matmul path; f32 params + BN stats.
    compute_dtype: str = "bfloat16"
    # Freeze BN statistics during training (use running stats; no batch
    # reductions). Standard for detection fine-tuning from pretrained
    # backbones, and a large throughput win: BN stat/grad reductions are
    # the profiled majority of the train step (DESIGN.md).
    freeze_bn: bool = False
    # ResNet bottleneck implementation: "xla" (default; fastest measured),
    # "fused" (per-op Pallas custom-VJP path, ops/pallas_fused.py), or
    # "ghost" (unit-fused ghost-BN kernels, ops/pallas_unit.py). The
    # experimental paths are numerically validated but currently slower
    # end-to-end than XLA's lowering (DESIGN.md round-2 investigation);
    # env vars OCR_FUSED_BOTTLENECKS / OCR_GHOST_UNITS override.
    bottleneck_impl: str = "xla"


@dataclass
class LossConfig:
    # ohem | dice | focal | east  (reference: nets/model.py:204-261 OHEM,
    # nets/model_vgg_16.py:196-225 dice, README.md mentions focal).
    name: str = "ohem"
    max_neg_pos_ratio: int = 3  # OHNM (reference nets/model.py:171)
    # Hardest negatives selected on images with NO positive pixels. The
    # reference selects none (model.py:169), so data.background_ratio
    # crops contribute nothing under OHEM unless this is > 0.
    bg_neg_budget: int = 0
    pixel_loss_weight: float = 2.0  # reference nets/model.py:261
    # CE-term compute dtype for the OHEM loss: "float32" | "bfloat16".
    # bf16 keeps OHNM selection + final reductions in f32 and is a
    # measured +1.5% frozen-BN throughput lever (PERF.md §4.5); the
    # OCR_LOSS_BF16 env var overrides this for A/B runs.
    compute_dtype: str = "float32"
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    # EAST geometry loss weighting (classic EAST: L = Ls + λ·Lg).
    east_geo_weight: float = 1.0
    east_angle_weight: float = 10.0


@dataclass
class TrainConfig:
    learning_rate: float = 1e-4
    # Exponential decay: reference multigpu_train.py:104.
    lr_decay_rate: float = 0.94
    lr_decay_steps: int = 5000
    lr_staircase: bool = True
    # Piecewise-constant staircase (reference train_pixellink.py:221-243
    # tf.case table); when lr_breakpoints is non-empty it replaces the
    # exponential schedule. lr_decays has len(lr_breakpoints)+1 factors.
    lr_breakpoints: Sequence[int] = ()
    lr_decays: Sequence[float] = ()
    optimizer: str = "adam"  # adam | momentum
    momentum: float = 0.9
    # Gradient cross-replica reduction: 'mean' (multigpu_train.py:70-85) or
    # 'sum' (train_pixellink.py sum_gradients :179-194).
    grad_reduce: str = "mean"
    max_steps: int = 100_000
    moving_average_decay: float = 0.997  # reference multigpu_train.py:11
    checkpoint_path: str = "/tmp/east_resnet_v1_50_rbox/"
    restore: bool = False
    save_checkpoint_steps: int = 1000
    # Time-based checkpoint cadence (reference train_pixellink.py:370
    # saves every 300 s via slim.learning.train save_interval_secs);
    # 0 disables — steps-only cadence. Both cadences may be active;
    # whichever fires first triggers a save.
    save_interval_secs: float = 0.0
    # Retention cap on ckpt_* directories in checkpoint_path (reference
    # train_pixellink.py:380 Saver max_to_keep=500); 0 = keep all.
    max_checkpoints_to_keep: int = 0
    save_summary_steps: int = 20
    # Calibrate decode thresholds on a small TRAIN-split slice whenever a
    # checkpoint is saved, storing the operating point with the checkpoint
    # (train/calibrate.py; infer.Predictor adopts it by default). Static
    # reference-style thresholds drift with the training recipe
    # (QUALITY_r04: default F 0.70 vs swept 0.87 under augmentation).
    calibrate_at_checkpoint: bool = True
    # Images drawn from the train split for calibration (never val).
    # 8 matches the validated plateau-centered recipe (QUALITY_r05:
    # argmax on a 4-image slice was noisy; 8 + plateau pick closed the
    # default-vs-swept gap to 0.007).
    calibrate_max_images: int = 8
    pretrained_model_path: Optional[str] = None
    log_every_steps: int = 10
    # warn (never kill) when no train step completes for this many
    # seconds — a hung device RPC (e.g. a dropped TPU-tunnel connection)
    # or a dead input-pipeline worker blocks the loop with no traceback;
    # the reference's sess.run loop had the same silent failure mode.
    # 0 disables.
    stall_warn_secs: float = 300.0
    seed: int = 0
    # Data parallel axis size; None = all visible devices.
    num_devices: Optional[int] = None
    donate_state: bool = True
    # In-device training loop: stage the dataset in HBM (DeviceDataset) and
    # run scan_steps train steps per dispatch. Requires augmentation off
    # (the reference's default) and the dataset to fit in HBM.
    use_device_cache: bool = False
    scan_steps: int = 16
    # run the validation eval hook every N steps (0 = off); needs
    # eval.gt_path set to a directory of images + gt_*.txt
    eval_every_steps: int = 0
    # Per-jit XLA backend options for the train step (merged with the
    # OCR_XLA_OPTS env, comma-separated k=v). The tunneled TPU client
    # rejects TPU flags in XLA_FLAGS, so flag tuning flows through
    # jit(compiler_options=...) instead.
    xla_options: Optional[Dict[str, str]] = None


@dataclass
class InferConfig:
    test_data_path: str = "./exhibition"
    checkpoint_path: str = "/tmp/east_icdar2015_resnet_v1_50_rbox/"
    output_dir: str = "/tmp/res/"
    max_side_len: int = 3000  # reference test.py:92
    pixel_conf_threshold: float = 0.8  # reference test.py:45
    link_conf_threshold: float = 0.8  # test.py:45 (0.9 in test_pixellink.py)
    # Minimum component size in stride-4 pixels
    # (reference test_pixellink_fast.py:174 keeps groups > 10 px).
    min_component_size: int = 10
    # Static bound on components per image for jit decode.
    max_components: int = 128
    # Compat with the reference's single-pixel link-filter bug at test.py:72
    # (the corrected loop lives at tool/pixellink_fn.py:144-150; we default
    # to the corrected semantics).
    compat_reference_bugs: bool = False
    # EAST decode
    score_map_thresh: float = 0.8
    box_thresh: float = 0.1
    nms_thresh: float = 0.2
    # host LANMS input cap (top-K by score, raster order preserved);
    # bounds the O(K^2) suppression loop on dense score maps. 0 = no cap.
    nms_max_candidates: int = 1024
    # Adopt the checkpoint's calibrated operating point
    # (train/calibrate.py writes operating_point.json next to the
    # checkpoints) in place of the static threshold defaults above.
    use_calibrated_thresholds: bool = True


@dataclass
class EvalConfig:
    matching_iou_threshold: float = 0.5  # tool/bboxes.py matching
    gt_path: str = ""


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    infer: InferConfig = field(default_factory=InferConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    def validate(self) -> "Config":
        """Reject config values that would otherwise be silently ignored.

        The reference accepts ``--geometry`` RBOX|QUAD
        (datasets/icdar.py:29-30) but only ever generates its link-map
        "RBOX" labels; here both geometries are implemented for the EAST
        family and anything else is an error instead of dead config.
        """
        if self.data.geometry not in ("RBOX", "QUAD"):
            raise ValueError(
                f"data.geometry must be 'RBOX' or 'QUAD', got "
                f"{self.data.geometry!r}")
        if self.train.save_interval_secs < 0:
            raise ValueError("train.save_interval_secs must be >= 0")
        if self.train.max_checkpoints_to_keep < 0:
            raise ValueError("train.max_checkpoints_to_keep must be >= 0")
        return self


def _set_by_path(cfg: Config, dotted: str, raw: str) -> None:
    """Set ``cfg.section.field`` from a string value with type coercion."""
    parts = dotted.split(".")
    obj: Any = cfg
    for p in parts[:-1]:
        obj = getattr(obj, p)
    name = parts[-1]
    current = getattr(obj, name)
    value: Any
    if isinstance(current, bool):
        value = raw.lower() in ("1", "true", "yes", "y")
    elif isinstance(current, int):
        value = int(raw)
    elif isinstance(current, float):
        value = float(raw)
    elif isinstance(current, (tuple, list)):
        value = tuple(float(x) for x in raw.split(","))
    elif current is None:
        # Optional fields: best-effort numeric coercion
        if raw.lower() in ("none", "null"):
            value = None
        else:
            try:
                value = int(raw)
            except ValueError:
                try:
                    value = float(raw)
                except ValueError:
                    value = raw
    else:
        value = raw
    setattr(obj, name, value)


# Reference public flag name -> config path, so entry scripts accept the
# same CLI surface as the reference's shell launchers (train.sh, test.sh).
FLAG_ALIASES = {
    "training_data_path": "data.training_data_path",
    "max_image_large_side": "data.max_image_large_side",
    "max_text_size": "data.max_text_size",
    "min_text_size": "data.min_text_size",
    "min_crop_side_ratio": "data.min_crop_side_ratio",
    "geometry": "data.geometry",
    "input_size": "data.input_size",
    "batch_size_per_gpu": "data.batch_size",
    "num_readers": "data.num_workers",
    "text_scale": "model.text_scale",
    "learning_rate": "train.learning_rate",
    "max_steps": "train.max_steps",
    "moving_average_decay": "train.moving_average_decay",
    "checkpoint_path": "train.checkpoint_path",
    "restore": "train.restore",
    "save_checkpoint_steps": "train.save_checkpoint_steps",
    "save_summary_steps": "train.save_summary_steps",
    "pretrained_model_path": "train.pretrained_model_path",
    "test_data_path": "infer.test_data_path",
    "output_dir": "infer.output_dir",
    "pixel_conf_threshold": "infer.pixel_conf_threshold",
    "link_conf_threshold": "infer.link_conf_threshold",
    # gpu_list is accepted and ignored: device selection is JAX-native.
    "gpu_list": None,
    "gpu_memory_fraction": None,
    "image_width": None,
    "image_height": None,
}


def parse_flags(
    argv: Sequence[str],
    cfg: Optional[Config] = None,
    aliases: Optional[dict] = None,
) -> Config:
    """Parse ``--flag=value`` / ``--flag value`` CLI args into a Config.

    Accepts both reference-style flag names (via FLAG_ALIASES, overridable
    per entry point — e.g. ``test.py`` maps ``checkpoint_path`` to
    ``infer.checkpoint_path``) and dotted config paths
    (``--train.learning_rate=3e-4``).
    """
    cfg = cfg or Config()
    if aliases is None:
        aliases = FLAG_ALIASES
    args = list(argv)
    i = 0
    special: dict[str, str] = {}
    while i < len(args):
        a = args[i]
        if not a.startswith("--"):
            i += 1
            continue
        body = a[2:]
        if "=" in body:
            key, val = body.split("=", 1)
        else:
            key = body
            if i + 1 < len(args) and not args[i + 1].startswith("--"):
                val = args[i + 1]
                i += 1
            else:
                val = "true"
        if key in aliases:
            path = aliases[key]
            if path is None:
                special[key] = val
            else:
                _set_by_path(cfg, path, val)
        elif "." in key:
            _set_by_path(cfg, key, val)
        else:
            raise ValueError(f"unknown flag --{key}")
        i += 1
    return cfg.validate()
