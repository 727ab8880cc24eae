"""Adapter for /root/reference/nets/resnet_v1.py.

resnet_v1_50/101/152/200(inputs, ...) -> (net, end_points) with the FCN
pyramid exported under the reference's keys pool2..pool5
(reference resnet_v1.py:196,210-216).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tensorflow_ocr_tpu.models.resnet import RESNET_UNITS, ResNetV1

_CACHE = {}


def _run(depth, inputs, is_training, variables):
    m = ResNetV1(units=RESNET_UNITS[depth])
    if variables is None:
        key = (depth, tuple(inputs.shape[1:]))
        if key not in _CACHE:
            _CACHE[key] = m.init(jax.random.PRNGKey(0), jnp.zeros_like(inputs))
        variables = _CACHE[key]
    if is_training:
        ep, _ = m.apply(variables, inputs, train=True, mutable=["batch_stats"])
    else:
        ep = m.apply(variables, inputs)
    return ep["pool5"], ep


def resnet_v1_50(inputs, num_classes=None, is_training=True, scope=None,
                 variables=None, **_ignored):
    return _run(50, inputs, is_training, variables)


def resnet_v1_101(inputs, num_classes=None, is_training=True, scope=None,
                  variables=None, **_ignored):
    return _run(101, inputs, is_training, variables)


def resnet_v1_152(inputs, num_classes=None, is_training=True, scope=None,
                  variables=None, **_ignored):
    return _run(152, inputs, is_training, variables)


def resnet_v1_200(inputs, num_classes=None, is_training=True, scope=None,
                  variables=None, **_ignored):
    return _run(200, inputs, is_training, variables)
