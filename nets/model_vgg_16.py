"""Adapter for /root/reference/nets/model_vgg_16.py public API.

- model_vgg(images)  -> VGG-16 PixelLink heads (reference :138-177)
- model(images)      -> ResNet-50 EAST-merge, sigmoid score + 8 link probs
                        (reference :85-136)
- model_resnet_v1_101 -> EAST head on ResNet-101 (reference :34-83)
- loss               -> dice score + 8 link dices (reference :196-225)
- cal_link_loss / ohem_loss (reference :227-282)
- dice_coefficient   (reference :179-193)
"""

from __future__ import annotations

import jax.numpy as jnp

from nets.model import _apply, mean_image_subtraction, unpool  # noqa: F401
from tensorflow_ocr_tpu.ops import losses as _losses

dice_coefficient = _losses.dice_loss


def model_vgg(images, weight_decay=1e-5, is_training=True, variables=None):
    out, _ = _apply("pixellink_vgg16", images, is_training, variables)
    return out["pixel_logits"], out["link_logits"]


def model(images, weight_decay=1e-5, is_training=True, variables=None):
    out, _ = _apply("link8_resnet50", images, is_training, variables)
    return out["score"], out["link_probs"]


def model_resnet_v1_101(images, weight_decay=1e-5, is_training=True,
                        variables=None, text_scale=512):
    out, _ = _apply("east_resnet101", images, is_training, variables, text_scale)
    return out["score"], out["geometry"]


def loss(y_true_pixel, y_pred_pixel, y_true_link, y_pred_link, training_mask):
    """Dice pixel + 8 link dices (reference :196-225)."""
    total, _ = _losses.dice_pixel_link_loss(
        y_true_pixel, y_pred_pixel, y_true_link, y_pred_link, training_mask
    )
    return total


def cal_link_loss(link_gt, link_pred, W_pixel):
    """Reference :227-241: one direction's pos/neg-balanced CE."""
    link_gt = link_gt.reshape(-1).astype(jnp.int32)
    link_pred = link_pred.reshape(-1, 2)
    ce = _losses.softmax_ce_with_logits(link_pred, link_gt)
    w_pos = (link_gt == 1).astype(jnp.float32) * W_pixel
    w_neg = (link_gt == 0).astype(jnp.float32) * W_pixel
    return (
        _losses._safe_div(jnp.sum(ce * w_pos), jnp.sum(w_pos))
        + _losses._safe_div(jnp.sum(ce * w_neg), jnp.sum(w_neg))
    )


def ohem_loss(y_true_pixel, y_pred_pixel, y_true_link, y_pred_link,
              training_mask=None):
    """Reference :243-282 (positive-masked pixel CE x2 + link CE)."""
    total, _ = _losses.positive_pixel_link_loss(
        y_true_pixel, y_pred_pixel, y_true_link, y_pred_link
    )
    return total
