"""Tiny convolutional backbone for CI-scale learned-quality tests.

No reference counterpart: the reference validates learning only on GPU
sessions with full backbones; this backbone exists so the test suite can
CI-gate that the loss -> label -> decode chain actually LEARNS (overfit
two images, assert F > 0 held on the train set) in under a minute on one
CPU core. Emits the same ``pool2..pool5`` endpoint pyramid as
models/resnet.py:358 so every head (PixelLink / EAST / link8) composes
unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from tensorflow_ocr_tpu.models.layers import ConvBN


class TinyConvNet(nn.Module):
    """4-stage strided convnet: stride-4 stem then x2 per stage.

    Endpoint strides match ResNetV1 (pool2=4 ... pool5=32).
    """

    widths: Sequence[int] = (16, 24, 32, 48)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        ep: Dict[str, jnp.ndarray] = {}
        w2, w3, w4, w5 = self.widths
        x = ConvBN(w2, (3, 3), (2, 2), dtype=self.dtype, name="stem1")(
            x, train)
        x = ConvBN(w2, (3, 3), (2, 2), dtype=self.dtype, name="stem2")(
            x, train)
        ep["pool2"] = x
        for i, w in enumerate((w3, w4, w5)):
            x = ConvBN(w, (3, 3), (2, 2), dtype=self.dtype,
                       name=f"down{i + 3}")(x, train)
            x = ConvBN(w, (3, 3), dtype=self.dtype,
                       name=f"conv{i + 3}")(x, train)
            ep[f"pool{i + 3}"] = x
        return ep
