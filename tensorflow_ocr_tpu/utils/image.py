"""Inference-time image utilities + result writers.

Parity:
- resize_image    -> /root/reference/test.py:92-122 (longest side cap,
  /32 rounding with the reference's (h//32-1)*32 convention)
- write_result    -> test.py:207-218 / test_pixellink_fast.py:209-217
  (ICDAR submission format, CRLF lines)
- draw_boxes      -> test.py:196 overlay drawing
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import cv2
import numpy as np


def resize_image(im: np.ndarray, max_side_len: int = 3000
                 ) -> Tuple[np.ndarray, Tuple[float, float]]:
    h, w = im.shape[:2]
    if max(h, w) > max_side_len:
        ratio = float(max_side_len) / h if h > w else float(max_side_len) / w
    else:
        ratio = 1.0
    resize_h = int(h * ratio)
    resize_w = int(w * ratio)
    resize_h = resize_h if resize_h % 32 == 0 else (resize_h // 32 - 1) * 32
    resize_w = resize_w if resize_w % 32 == 0 else (resize_w // 32 - 1) * 32
    resize_h = max(resize_h, 32)
    resize_w = max(resize_w, 32)
    im = cv2.resize(im, (resize_w, resize_h))
    return im, (resize_h / float(h), resize_w / float(w))


def get_test_images(test_data_path: str) -> List[str]:
    """Recursive walk matching reference test.py:76-90."""
    files = []
    exts = ("jpg", "png", "jpeg", "JPG")
    for parent, _, filenames in os.walk(test_data_path):
        for filename in filenames:
            if filename.endswith(exts):
                files.append(os.path.join(parent, filename))
    return sorted(files)


def write_result_txt(output_dir: str, im_fn: str,
                     boxes: Sequence[np.ndarray]) -> str:
    """ICDAR res_*.txt: 8 ints per line, CRLF (test.py:207-218)."""
    os.makedirs(output_dir, exist_ok=True)
    stem = os.path.basename(im_fn).split(".")[0]
    res_file = os.path.join(output_dir, f"res_{stem}.txt")
    with open(res_file, "w", newline="") as f:
        for box in boxes:
            b = np.asarray(box).reshape(4, 2).astype(np.int64)
            f.write(
                "{},{},{},{},{},{},{},{}\r\n".format(
                    b[0, 0], b[0, 1], b[1, 0], b[1, 1],
                    b[2, 0], b[2, 1], b[3, 0], b[3, 1],
                )
            )
    return res_file


def draw_boxes(im: np.ndarray, boxes: Sequence[np.ndarray],
               color=(0, 255, 0), thickness: int = 2) -> np.ndarray:
    out = im.copy()
    for box in boxes:
        b = np.asarray(box).reshape(4, 2).astype(np.int32)
        cv2.drawContours(out, [b], -1, color, thickness)
    return out


def write_overlay(output_dir: str, im_fn: str, im: np.ndarray,
                  boxes: Sequence[np.ndarray]) -> str:
    os.makedirs(output_dir, exist_ok=True)
    img_path = os.path.join(output_dir, os.path.basename(im_fn))
    cv2.imwrite(img_path, draw_boxes(im, boxes))
    return img_path
