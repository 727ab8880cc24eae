"""Top-level detector models and the model registry.

Covers the reference's model builders:
- ``pixellink_resnet50``  -> nets/model.py:84-143 (the primary trained model)
- ``pixellink_vgg16``     -> nets/model_vgg_16.py:138-177 (model_vgg) and
                             nets/pixellink.py:8-86 (PixelLinkNet)
- ``east_resnet50``       -> nets/model_vgg_16.py:85-136 geometry variant uses
                             the same merge; classic EAST head per
                             nets/model.py:33-82 on resnet_v1_50
- ``east_resnet101``      -> nets/model.py:33-82 (model_resnet_v1_101)
- ``east_vgg16``          -> EAST head on the VGG basenet (capability parity
                             for BASELINE config #1)
- ``link8_resnet50``      -> nets/model_vgg_16.py:85-136 (model): sigmoid
                             score + 8 sigmoid link probabilities
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from tensorflow_ocr_tpu.models.layers import mean_image_subtraction
from tensorflow_ocr_tpu.models.resnet import ResNetV1, RESNET_UNITS
from tensorflow_ocr_tpu.models.vgg import VGG16
from tensorflow_ocr_tpu.models.heads import (
    EASTHead,
    EASTMerge,
    Link8Head,
    PixelLinkHead,
)

VGG_PIXELLINK_KEYS = ("fc7", "conv5_3", "conv4_3", "conv3_3")
# PixelLink "2s" variant: fuse one level finer (conv2_2, stride 2) for the
# higher-resolution head named by BASELINE config #3 (PixelLink paper's 2s).
VGG_PIXELLINK_2S_KEYS = ("fc7", "conv5_3", "conv4_3", "conv3_3", "conv2_2")
RESNET_KEYS = ("pool5", "pool4", "pool3", "pool2")


class Detector(nn.Module):
    """Backbone + head wrapper. Input NHWC float32 RGB in [0, 255]."""

    backbone_name: str = "resnet50"
    head_name: str = "pixellink"
    text_scale: int = 512
    geometry: str = "RBOX"  # EAST head only: RBOX | QUAD
    output_stride: int = 4
    dtype: Any = jnp.bfloat16

    def setup(self):
        if self.backbone_name.startswith("resnetv2_"):
            from tensorflow_ocr_tpu.models.resnet_v2 import ResNetV2

            depth = int(self.backbone_name[len("resnetv2_"):])
            self.backbone = ResNetV2(units=RESNET_UNITS[depth], dtype=self.dtype)
            keys = RESNET_KEYS
            upsample_first = True
        elif self.backbone_name.startswith("resnet"):
            depth = int(self.backbone_name[len("resnet"):])
            self.backbone = ResNetV1(units=RESNET_UNITS[depth], dtype=self.dtype)
            keys = RESNET_KEYS
            upsample_first = True
        elif self.backbone_name == "tiny":
            from tensorflow_ocr_tpu.models.tiny import TinyConvNet

            self.backbone = TinyConvNet(dtype=self.dtype)
            keys = RESNET_KEYS
            upsample_first = True
        elif self.backbone_name == "vgg16":
            self.backbone = VGG16(dtype=self.dtype)
            keys = (
                VGG_PIXELLINK_2S_KEYS if self.output_stride == 2
                else VGG_PIXELLINK_KEYS
            )
            # fc7 and conv5_3 share stride 16 in VGG: first fuse has no
            # upsample (reference nets/model_vgg_16.py:163)
            upsample_first = False
        else:
            raise ValueError(f"unknown backbone {self.backbone_name}")

        if self.head_name == "pixellink":
            self.head = PixelLinkHead(
                feature_keys=keys, upsample_first=upsample_first, dtype=self.dtype
            )
            self.merge = None
        elif self.head_name in ("east", "link8"):
            self.merge = EASTMerge(
                feature_keys=keys, upsample_first=upsample_first, dtype=self.dtype
            )
            self.head = (
                EASTHead(text_scale=self.text_scale,
                         geometry=self.geometry, dtype=self.dtype)
                if self.head_name == "east"
                else Link8Head(dtype=self.dtype)
            )
        else:
            raise ValueError(f"unknown head {self.head_name}")

    def __call__(self, images: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = mean_image_subtraction(images.astype(jnp.float32))
        x = x.astype(self.dtype)
        ep = self.backbone(x, train)
        if self.merge is not None:
            g = self.merge(ep, train)
            return self.head(g, train)
        return self.head(ep, train)


MODEL_REGISTRY = {
    "pixellink_resnet50": dict(backbone_name="resnet50", head_name="pixellink"),
    "pixellink_resnet101": dict(backbone_name="resnet101", head_name="pixellink"),
    "pixellink_vgg16": dict(backbone_name="vgg16", head_name="pixellink"),
    "pixellink2s_vgg16": dict(backbone_name="vgg16", head_name="pixellink",
                              output_stride=2),
    "east_resnet50": dict(backbone_name="resnet50", head_name="east"),
    "east_resnet101": dict(backbone_name="resnet101", head_name="east"),
    "east_vgg16": dict(backbone_name="vgg16", head_name="east"),
    "link8_resnet50": dict(backbone_name="resnet50", head_name="link8"),
    "pixellink_resnetv2_50": dict(backbone_name="resnetv2_50",
                                  head_name="pixellink"),
    "east_resnetv2_50": dict(backbone_name="resnetv2_50", head_name="east"),
    # deeper ResNet-v1 variants (reference resnet_v1.py:293-344)
    "pixellink_resnet152": dict(backbone_name="resnet152", head_name="pixellink"),
    "east_resnet152": dict(backbone_name="resnet152", head_name="east"),
    "pixellink_resnet200": dict(backbone_name="resnet200", head_name="pixellink"),
    "east_resnet200": dict(backbone_name="resnet200", head_name="east"),
    # CI-scale backbone (models/tiny.py): overfit tests that gate learned
    # quality on CPU; not a reference family.
    "pixellink_tiny": dict(backbone_name="tiny", head_name="pixellink"),
    "east_tiny": dict(backbone_name="tiny", head_name="east"),
}


def model_output_stride(name: str) -> int:
    """Output-map stride of a registry model (2 for the 2s variant)."""
    return MODEL_REGISTRY[name].get("output_stride", 4)


def build_model(name: str, text_scale: int = 512,
                dtype: Any = jnp.bfloat16,
                geometry: str = "RBOX") -> Detector:
    if name not in MODEL_REGISTRY:
        raise ValueError(f"unknown model {name}; have {sorted(MODEL_REGISTRY)}")
    kw = dict(MODEL_REGISTRY[name])
    return Detector(text_scale=text_scale, dtype=dtype, geometry=geometry,
                    **kw)
