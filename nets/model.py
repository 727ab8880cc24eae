"""Adapter for /root/reference/nets/model.py public API.

- model(images, ...)            -> ResNet-50 PixelLink heads
                                   (reference nets/model.py:84-143)
- model_resnet_v1_101(images,..)-> EAST head on ResNet-101
                                   (reference nets/model.py:33-82)
- loss(...)                     -> OHEM pixel+link loss
                                   (reference nets/model.py:204-261)
- dice_coefficient / OHNM_single_image / OHNM_batch /
  get_pos_and_neg_masks / mean_image_subtraction / unpool

JAX adaptation: each builder accepts an optional ``variables`` pytree and
``return_variables`` flag; with variables=None, weights are initialized
from seed 0 (useful for shape/smoke tests and fidelity comparisons).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tensorflow_ocr_tpu.models import build_model
from tensorflow_ocr_tpu.models.layers import mean_image_subtraction, unpool  # noqa: F401
from tensorflow_ocr_tpu.ops import losses as _losses

dice_coefficient = _losses.dice_loss

_MODEL_CACHE = {}


def _apply(name: str, images, is_training: bool, variables, text_scale=512):
    m = build_model(name, text_scale=text_scale)
    if variables is None:
        key = (name, 64)
        if key not in _MODEL_CACHE:
            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            _MODEL_CACHE[key] = m.init(jax.random.PRNGKey(0), dummy)
        variables = _MODEL_CACHE[key]
    if is_training:
        out, _ = m.apply(variables, images, train=True, mutable=["batch_stats"])
    else:
        out = m.apply(variables, images)
    return out, variables


def model(images, weight_decay=1e-5, is_training=True, variables=None):
    """(pixel_logits, link_logits) at stride 4 — reference model.py:84-143."""
    out, _ = _apply("pixellink_resnet50", images, is_training, variables)
    return out["pixel_logits"], out["link_logits"]


def model_resnet_v1_101(images, weight_decay=1e-5, is_training=True,
                        variables=None, text_scale=512):
    """(F_score, F_geometry) — reference model.py:33-82."""
    out, _ = _apply("east_resnet101", images, is_training, variables, text_scale)
    return out["score"], out["geometry"]


def get_pos_and_neg_masks(labels):
    return labels == 1, labels == 0


def OHNM_single_image(scores, n_pos, neg_mask, max_neg_pos_ratio=3):
    """Reference model.py:161-184 semantics (see ops.losses.ohnm_mask).

    ohnm_mask derives n_pos from a positive mask; synthesize one with
    exactly n_pos set bits (positions are irrelevant — only the count is
    used)."""
    idx = jnp.arange(neg_mask.shape[0])
    pos_dummy = idx < n_pos
    return _losses.ohnm_mask(scores, pos_dummy, neg_mask, max_neg_pos_ratio)


def OHNM_batch(batch_size, neg_conf, pos_mask, neg_mask):
    """Reference model.py:186-197 — batch_size arg kept for signature
    parity but unused (we vmap instead of a hardcoded-14 Python loop)."""
    sel = jax.vmap(_losses.ohnm_mask)(neg_conf, pos_mask, neg_mask)
    return pos_mask.astype(jnp.float32) + sel


def loss(y_true_pixel, y_pred_pixel, y_true_link, y_pred_link,
         training_mask):
    """Reference model.py:204-261 (returns the scalar total)."""
    total, _ = _losses.ohem_pixel_link_loss(
        y_true_pixel, y_pred_pixel, y_true_link, y_pred_link, training_mask,
        apply_training_mask=False,  # the reference ignores the mask here
    )
    return total
