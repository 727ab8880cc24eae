"""Shared layers: slim-style conv+BN+relu, explicit-pad strided conv, unpool.

TPU notes: convs run in bfloat16 (MXU) with float32 params and float32
BatchNorm statistics; ``unpool`` is the reference's 2x bilinear resize
(/root/reference/nets/model.py:14-15).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# ImageNet channel means, reference nets/model.py:18 (RGB order).
IMAGENET_MEANS = (123.68, 116.78, 103.94)


def mean_image_subtraction(images: jnp.ndarray,
                           means: Sequence[float] = IMAGENET_MEANS) -> jnp.ndarray:
    """Reference nets/model.py:18-31."""
    m = jnp.asarray(means, images.dtype).reshape(1, 1, 1, len(means))
    return images - m


def unpool(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample (reference nets/model.py:14-15).

    Uses half-pixel-center bilinear (jax.image default). TF1.4's
    resize_bilinear used legacy corner-aligned scaling; the half-pixel
    variant is the modern, XLA-fusable choice and changes activations by
    <1px of spatial phase — documented deviation.
    """
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class ConvBN(nn.Module):
    """slim.conv2d with BN+ReLU defaults (reference nets/model.py:100-104).

    BN decay 0.997 / eps 1e-5 / scale=True matches
    reference nets/model.py:94-99 & resnet_utils.py:209-254.
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    use_bn: bool = True
    activation: Optional[Any] = nn.relu
    explicit_pad: bool = False  # conv2d_same semantics for stride>1
    dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.997
    bn_epsilon: float = 1e-5
    # BN compute dtype. bf16 keeps the conv->BN->relu chain fusable and
    # halves activation HBM traffic; running stats stay f32 via param_dtype.
    bn_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kh, kw = self.kernel
        padding: Any = "SAME"
        if self.explicit_pad and (self.strides[0] > 1 or self.strides[1] > 1):
            # resnet_utils.conv2d_same (reference nets/resnet_utils.py:77-123):
            # fixed (k-1)//2 / k//2 padding + VALID, stride-independent.
            pad_beg = ((kh - 1) // 2, (kw - 1) // 2)
            pad_end = (kh // 2, kw // 2)
            padding = ((pad_beg[0], pad_end[0]), (pad_beg[1], pad_end[1]))
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=padding,
            kernel_dilation=self.dilation,
            use_bias=not self.use_bn,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                use_scale=True,
                use_bias=True,
                dtype=self.bn_dtype,
                param_dtype=jnp.float32,
            )(x)
            x = x.astype(self.dtype)
        if self.activation is not None:
            x = self.activation(x)
        return x
