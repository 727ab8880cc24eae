#!/usr/bin/env python
"""Inference entry point (ICDAR submission format).

CLI-compatible rebuild of /root/reference/test.py: restores the EMA
weights, runs detection per image, writes res_*.txt (CRLF, 8 ints) and an
overlay JPEG to --output_dir. The decode (threshold + link filter +
connected components + min-area rects) runs on device instead of
NumPy/OpenCV host loops.

    python test.py --test_data_path=./exhibition \
        --checkpoint_path=/tmp/east_icdar2015_resnet_v1_50_rbox/ \
        --output_dir=/tmp/res/
"""

import sys


def main(argv):
    import cv2
    import numpy as np

    from tensorflow_ocr_tpu.config import Config, parse_flags, FLAG_ALIASES
    from tensorflow_ocr_tpu.infer import Predictor
    from tensorflow_ocr_tpu.ops.geometry import order_points
    from tensorflow_ocr_tpu.utils.image import (
        get_test_images,
        write_overlay,
        write_result_txt,
    )

    aliases = dict(FLAG_ALIASES)
    aliases["checkpoint_path"] = "infer.checkpoint_path"
    aliases["input_size"] = "data.input_size"
    cfg = parse_flags(argv, Config(), aliases)

    predictor = Predictor(cfg)
    for im_fn in get_test_images(cfg.infer.test_data_path):
        im_bgr = cv2.imread(im_fn)
        if im_bgr is None:
            continue
        im_rgb = im_bgr[:, :, ::-1]
        boxes, net_ms = predictor.detect(im_rgb)
        print(f"{im_fn}: {len(boxes)} boxes, net time {net_ms:.1f} ms")
        ordered = [order_points(np.asarray(b)) for b in boxes]
        write_result_txt(cfg.infer.output_dir, im_fn, ordered)
        write_overlay(cfg.infer.output_dir, im_fn, im_bgr, ordered)


if __name__ == "__main__":
    main(sys.argv[1:])
