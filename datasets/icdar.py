"""Adapter for /root/reference/datasets/icdar.py public API.

Geometry helpers come from tensorflow_ocr_tpu.ops.geometry; IO and
augmentation from tensorflow_ocr_tpu.data.icdar; generate_rbox runs the
device label kernels and returns host numpy like the reference.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from tensorflow_ocr_tpu.config import DataConfig
from tensorflow_ocr_tpu.data.icdar import (  # noqa: F401
    get_images as _get_images,
    load_annotation,
    load_annoataion,
    crop_area as _crop_area,
)
from tensorflow_ocr_tpu.data import pipeline as _pipeline
from tensorflow_ocr_tpu.ops.geometry import (  # noqa: F401
    check_and_validate_polys,
    point_dist_to_line,
    polygon_area,
    rectangle_from_parallelogram,
    restore_rectangle,
    restore_rectangle_rbox,
    shrink_poly,
    sort_rectangle,
)

# module-level default config, standing in for the reference's FLAGS
# (reference datasets/icdar.py:17-33)
FLAGS = DataConfig()


def get_images(training_data_path: Optional[str] = None):
    return _get_images(training_data_path or FLAGS.training_data_path)


def valid_link(point, score_map, w, h, direction):
    """Reference icdar.py:83-105 — kept verbatim in semantics INCLUDING its
    transposed indexing, for fidelity tests only. The production link maps
    use the corrected instance-aware rule (tensorflow_ocr_tpu.ops.labels)."""
    offsets = {
        "up": (-1, 0), "down": (1, 0), "left": (0, -1), "right": (0, 1),
        "left_up": (-1, -1), "left_down": (1, -1),
        "right_up": (-1, 1), "right_down": (1, 1),
    }
    if point[0] == h - 1 or point[1] == w - 1:
        return 1
    dy, dx = offsets[direction]
    point_dir = np.array([point[0] + dy, point[1] + dx])
    if (score_map[point[1], point[0]] == 1
            and score_map[point_dir[1], point_dir[0]] == 1):
        return 1
    return 0


def generate_rbox(im_size, polys, tags, min_text_size: Optional[int] = None):
    """Reference icdar.py:486-539: (score_map, 8-ch link map, training_mask)
    at full resolution, computed with the device kernels."""
    import jax.numpy as jnp

    from tensorflow_ocr_tpu.ops.labels import pixellink_labels

    h, w = im_size
    k = max(len(polys), 1)
    padded = np.zeros((k, 4, 2), np.float32)
    ptags = np.zeros((k,), bool)
    valid = np.zeros((k,), bool)
    if len(polys):
        padded[: len(polys)] = np.asarray(polys, np.float32)
        ptags[: len(tags)] = np.asarray(tags, bool)
        valid[: len(polys)] = True
    score, link, mask = pixellink_labels(
        jnp.asarray(padded), jnp.asarray(ptags), jnp.asarray(valid),
        int(h), int(w),
        min_text_size=min_text_size or FLAGS.min_text_size,
    )
    return (
        np.asarray(score, np.uint8),
        np.asarray(link, np.float32),
        np.asarray(mask, np.uint8),
    )


def crop_area(im, polys, tags, crop_background=False, max_tries=50):
    return _crop_area(
        im, polys, tags, crop_background, max_tries,
        min_crop_side_ratio=FLAGS.min_crop_side_ratio,
    )


def generator(input_size=512, batch_size=32, **_ignored):
    """Reference icdar.py:542-649-shaped batch generator."""
    cfg = DataConfig(**{**FLAGS.__dict__})
    cfg.input_size = input_size
    cfg.batch_size = batch_size
    for batch in _pipeline.batch_generator(cfg):
        yield (
            [im for im in batch["images"]],
            batch["fns"],
            None,  # label maps are generated on device in the train step
            batch["polys"],
            batch["valid"],
        )


def get_batch(num_workers, **kwargs):
    """Reference icdar.py:652-668 signature."""
    cfg = DataConfig(**{**FLAGS.__dict__})
    return _pipeline.get_batch(num_workers, cfg=cfg, **kwargs)
