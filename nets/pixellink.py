"""Adapter for /root/reference/nets/pixellink.py (PixelLinkNet).

The reference class is broken there (missing `config` module,
SURVEY.md §2.3); this working equivalent exposes the same attributes:
pixel_cls / link_cls logits and pixel_scores, plus build_loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nets.model import _apply
from tensorflow_ocr_tpu.ops import losses as _losses


class PixelLinkNet:
    def __init__(self, inputs, is_training=False, data_format="NHWC",
                 variables=None):
        assert data_format == "NHWC", "TPU rebuild is NHWC-only"
        out, self.variables = _apply(
            "pixellink_vgg16", inputs, is_training, variables
        )
        self.pixel_cls = out["pixel_logits"]
        self.link_cls = out["link_logits"]
        self.pixel_scores = jax.nn.softmax(self.pixel_cls, axis=-1)[..., 1:2]

    def build_loss(self, pixel_labels, link_labels, training_mask=None,
                   max_neg_pos_ratio=3):
        total, aux = _losses.ohem_pixel_link_loss(
            pixel_labels, self.pixel_cls, link_labels, self.link_cls,
            training_mask, max_neg_pos_ratio=max_neg_pos_ratio,
        )
        return total
