"""Adapter for /root/reference/tool/tf_utils.py (orphan helpers).

The reference vendored these tutorial-style helpers (manual conv2d /
linear / flatten / one-hot, tf_utils.py:20-129) but nothing imports them
(SURVEY.md §2.7). JAX equivalents are provided for API-surface parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv2d(x, w, b=None, stride=1, padding="SAME"):
    """NHWC conv with HWIO kernel (the helper's manual tf.nn.conv2d)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b
    return out


def linear(x, w, b=None):
    out = x @ w
    if b is not None:
        out = out + b
    return out


def flatten(x):
    return x.reshape(x.shape[0], -1)


def one_hot(labels, num_classes):
    return jax.nn.one_hot(labels, num_classes)


def max_pool_2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
    )
