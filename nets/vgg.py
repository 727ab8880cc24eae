"""Adapter for /root/reference/nets/vgg.py: basenet(inputs) -> (net, end_points)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tensorflow_ocr_tpu.models.vgg import VGG16

_CACHE = {}


def basenet(inputs, scope="vgg16", variables=None):
    m = VGG16()
    if variables is None:
        key = tuple(inputs.shape[1:])
        if key not in _CACHE:
            _CACHE[key] = m.init(jax.random.PRNGKey(0), jnp.zeros_like(inputs))
        variables = _CACHE[key]
    ep = m.apply(variables, inputs)
    return ep["fc7"], ep
