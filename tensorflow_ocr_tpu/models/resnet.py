"""ResNet-v1 backbones (50/101/152/200) exporting the FCN feature pyramid.

Flax rebuild of the reference's slim fork (/root/reference/nets/resnet_v1.py,
nets/resnet_utils.py): classification head removed, ``pool2..pool5``
(stride 4/8/16/32) exported for the detection heads
(resnet_v1.py:196,210-216). Structure notes preserved from the reference:

- root block: 7x7/2 conv with conv2d_same explicit padding
  (resnet_utils.py:77-123) + 3x3/2 SAME max-pool; its output is ``pool2``.
- bottleneck units are slim-v1 style (resnet_v1.py:67-111): 1x1 -> 3x3
  (stride here) -> 1x1, projection shortcut on depth change, ReLU after add.
- strides sit on the LAST unit of each block (resnet_v1.py:246-255),
  so block1/2/3 end at stride 8/16/32 and block4 keeps stride 32.
- BN decay 0.997, eps 1e-5, scale=True (resnet_utils.py:209-254).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from tensorflow_ocr_tpu.models.layers import ConvBN

# (num_units,) per block for each variant (reference resnet_v1.py:237-344).
RESNET_UNITS = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
    200: (3, 24, 36, 3),
}


class Bottleneck(nn.Module):
    """slim resnet_v1 bottleneck (reference nets/resnet_v1.py:67-111)."""

    depth: int            # output channels
    depth_bottleneck: int
    stride: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        depth_in = x.shape[-1]
        if depth_in == self.depth:
            # subsample identity (resnet_utils.py:59-74)
            shortcut = x[:, :: self.stride, :: self.stride, :] if self.stride > 1 else x
        else:
            shortcut = ConvBN(
                self.depth, (1, 1), (self.stride, self.stride),
                activation=None, dtype=self.dtype, name="shortcut",
            )(x, train)
        y = ConvBN(self.depth_bottleneck, (1, 1), dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN(
            self.depth_bottleneck, (3, 3), (self.stride, self.stride),
            explicit_pad=True, dtype=self.dtype, name="conv2",
        )(y, train)
        y = ConvBN(self.depth, (1, 1), activation=None, dtype=self.dtype, name="conv3")(y, train)
        return nn.relu(shortcut + y)


class ResNetV1(nn.Module):
    """Backbone returning the pool2..pool5 pyramid dict."""

    units: Sequence[int] = RESNET_UNITS[50]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        ep: Dict[str, jnp.ndarray] = {}
        # root (resnet_v1.py:188-196)
        x = ConvBN(64, (7, 7), (2, 2), explicit_pad=True, dtype=self.dtype,
                   name="conv1")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        ep["pool2"] = x

        base_depths = (256, 512, 1024, 2048)
        bottlenecks = (64, 128, 256, 512)
        for b, (n_units, depth, depth_b) in enumerate(
            zip(self.units, base_depths, bottlenecks)
        ):
            for u in range(n_units):
                # stride 2 on the last unit of blocks 1-3 (resnet_v1.py:246-255)
                stride = 2 if (u == n_units - 1 and b < 3) else 1
                x = Bottleneck(
                    depth, depth_b, stride, dtype=self.dtype,
                    name=f"block{b + 1}_unit{u + 1}",
                )(x, train)
            if b == 0:
                ep["pool3"] = x
            elif b == 1:
                ep["pool4"] = x
        ep["pool5"] = x
        return ep


def resnet_v1(depth: int, dtype: Any = jnp.bfloat16) -> ResNetV1:
    return ResNetV1(units=RESNET_UNITS[depth], dtype=dtype)
