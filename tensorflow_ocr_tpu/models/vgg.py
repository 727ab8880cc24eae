"""VGG-16 basenet (FCN variant with dilated fc6/fc7).

Flax rebuild of /root/reference/nets/vgg.py:6-42: conv1_2..conv5_3 with SAME
pools, a 3x3 stride-1 pool5, fc6 as a 3x3 rate-6 dilated conv(1024) and fc7
as a 1x1 conv(1024). The reference's convs are plain conv+bias+ReLU (its
arg_scope sets only padding); exported end points mirror the reference keys.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn


class VGG16(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        ep: Dict[str, jnp.ndarray] = {}

        def conv(x, feats, name, kernel=(3, 3), dilation=(1, 1)):
            return nn.relu(
                nn.Conv(
                    feats, kernel, padding="SAME", kernel_dilation=dilation,
                    dtype=self.dtype, param_dtype=jnp.float32, name=name,
                )(x)
            )

        def pool(x, window=(2, 2), stride=(2, 2)):
            return nn.max_pool(x, window, strides=stride, padding="SAME")

        x = conv(x, 64, "conv1_1")
        x = conv(x, 64, "conv1_2")
        ep["conv1_2"] = x
        x = pool(x)
        x = conv(x, 128, "conv2_1")
        x = conv(x, 128, "conv2_2")
        ep["conv2_2"] = x
        x = pool(x)
        x = conv(x, 256, "conv3_1")
        x = conv(x, 256, "conv3_2")
        x = conv(x, 256, "conv3_3")
        ep["conv3_3"] = x
        x = pool(x)
        x = conv(x, 512, "conv4_1")
        x = conv(x, 512, "conv4_2")
        x = conv(x, 512, "conv4_3")
        ep["conv4_3"] = x
        x = pool(x)
        x = conv(x, 512, "conv5_1")
        x = conv(x, 512, "conv5_2")
        x = conv(x, 512, "conv5_3")
        ep["conv5_3"] = x
        # pool5: 3x3 stride 1 (reference vgg.py:32)
        x = pool(x, (3, 3), (1, 1))
        # fc6: 3x3 dilated rate 6 (vgg.py:35)
        x = conv(x, 1024, "fc6", dilation=(6, 6))
        ep["fc6"] = x
        x = conv(x, 1024, "fc7", kernel=(1, 1))
        ep["fc7"] = x
        return ep
