"""Flax model zoo: backbones (VGG-16, ResNet-v1) + detection heads."""

from tensorflow_ocr_tpu.models.detector import build_model, MODEL_REGISTRY  # noqa: F401
