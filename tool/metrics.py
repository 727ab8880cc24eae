"""Adapter for /root/reference/tool/metrics.py public API.

streaming_tp_fp_arrays became the StreamingPRF accumulator object
(tensorflow_ocr_tpu.eval.metrics); precision_recall / fmean keep their
names and semantics (reference metrics.py:68-85).
"""

from __future__ import annotations

import numpy as np

from tensorflow_ocr_tpu.eval.metrics import (  # noqa: F401
    StreamingPRF,
    fmean,
    safe_divide,
)


def streaming_tp_fp_arrays(num_gbboxes=None, tp=None, fp=None, scores=None,
                           matching_threshold: float = 0.5):
    """Returns a StreamingPRF accumulator (TF local-variable machinery of
    reference metrics.py:31-65 recast as an object)."""
    return StreamingPRF(matching_threshold)


def precision_recall(num_gbboxes, tp, fp, scores=None):
    """Reference metrics.py:68-80: cumulative P/R from raw TP/FP arrays."""
    tp = np.asarray(tp, np.float64)
    fp = np.asarray(fp, np.float64)
    if scores is not None:
        order = np.argsort(-np.asarray(scores))
        tp, fp = tp[order], fp[order]
    tp_c = np.cumsum(tp)
    fp_c = np.cumsum(fp)
    recall = tp_c / num_gbboxes if num_gbboxes else np.zeros_like(tp_c)
    precision = np.where(tp_c + fp_c > 0, tp_c / np.maximum(tp_c + fp_c, 1e-12), 0.0)
    return precision, recall
