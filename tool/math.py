"""Adapter for /root/reference/tool/math.py: safe_divide."""

from tensorflow_ocr_tpu.eval.metrics import safe_divide  # noqa: F401
