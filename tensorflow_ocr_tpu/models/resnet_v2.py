"""ResNet-v2 (pre-activation) backbones.

The reference vendors slim's resnet_v2 (/root/reference/nets/resnet_v2.py,
imported by nets/model.py:9 though never called — SURVEY.md §2.2). Rebuilt
for inventory completeness: pre-activation bottlenecks (BN+ReLU before
convs, He et al. 2016), root conv WITHOUT normalization (resnet_v2.py
applies BN only inside units plus a final postnorm), same
stride-on-last-unit block layout as our v1, exporting the same
pool2..pool5 pyramid keys.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from tensorflow_ocr_tpu.models.layers import ConvBN, stem_max_pool
from tensorflow_ocr_tpu.models.resnet import RESNET_UNITS


class PreactBottleneck(nn.Module):
    """slim resnet_v2 bottleneck: preact BN+ReLU, then 1x1/3x3/1x1 convs."""

    depth: int
    depth_bottleneck: int
    stride: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        preact = nn.BatchNorm(
            use_running_average=not train, momentum=0.997, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name="preact",
        )(x)
        preact = nn.relu(preact.astype(self.dtype))

        depth_in = x.shape[-1]
        if depth_in == self.depth:
            shortcut = x[:, :: self.stride, :: self.stride, :] if self.stride > 1 else x
        else:
            # v2 projects from the PREACTIVATED input
            shortcut = nn.Conv(
                self.depth, (1, 1), strides=(self.stride, self.stride),
                dtype=self.dtype, param_dtype=jnp.float32, name="shortcut",
            )(preact)

        y = ConvBN(self.depth_bottleneck, (1, 1), dtype=self.dtype,
                   name="conv1")(preact, train)
        y = ConvBN(self.depth_bottleneck, (3, 3),
                   (self.stride, self.stride), explicit_pad=True,
                   dtype=self.dtype, name="conv2")(y, train)
        y = nn.Conv(self.depth, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3")(y)
        return shortcut + y


class ResNetV2(nn.Module):
    units: Sequence[int] = RESNET_UNITS[50]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        ep: Dict[str, jnp.ndarray] = {}
        # v2 root: conv WITHOUT BN/relu (resnet_v2.py root convention)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2),
            padding=((3, 3), (3, 3)), dtype=self.dtype,
            param_dtype=jnp.float32, name="conv1",
        )(x)
        x = stem_max_pool(x)
        ep["pool2"] = x

        base_depths = (256, 512, 1024, 2048)
        bottlenecks = (64, 128, 256, 512)
        for b, (n_units, depth, depth_b) in enumerate(
            zip(self.units, base_depths, bottlenecks)
        ):
            for u in range(n_units):
                stride = 2 if (u == n_units - 1 and b < 3) else 1
                x = PreactBottleneck(
                    depth, depth_b, stride, dtype=self.dtype,
                    name=f"block{b + 1}_unit{u + 1}",
                )(x, train)
            if b == 0:
                ep["pool3"] = x
            elif b == 1:
                ep["pool4"] = x
        # v2 postnorm (resnet_v2.py applies a final BN+ReLU)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.997, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name="postnorm",
        )(x)
        x = nn.relu(x.astype(self.dtype))
        ep["pool5"] = x
        return ep


def resnet_v2(depth: int, dtype: Any = jnp.bfloat16) -> ResNetV2:
    return ResNetV2(units=RESNET_UNITS[depth], dtype=dtype)
