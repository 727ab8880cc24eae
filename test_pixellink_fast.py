#!/usr/bin/env python
"""PixelLink fast inference entry (stride-4 link-graph decode).

Working rebuild of /root/reference/test_pixellink_fast.py (broken there —
missing config/ssd_vgg_preprocessing modules): fixed 1280x768 input, decode
on the 320x192 stride-4 grid, groups > min_component_size kept, boxes
scaled back to image coordinates (reference :193-200). The per-pixel Python
graph build + DFS (reference :114-178) runs as one jitted
connected-components program on device.

    python test_pixellink_fast.py --test_data_path=./icdar_test/ \
        --checkpoint_path=./ohem_logs/ --output_dir=./tmp/
"""

import sys


def main(argv):
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tensorflow_ocr_tpu.config import Config, parse_flags, FLAG_ALIASES
    from tensorflow_ocr_tpu.infer import (
        Predictor,
        link_scores_from_logits,
        pixel_scores_from_logits,
    )
    from tensorflow_ocr_tpu.ops import decode as D
    from tensorflow_ocr_tpu.utils.image import (
        get_test_images,
        write_overlay,
        write_result_txt,
    )

    aliases = dict(FLAG_ALIASES)
    aliases["checkpoint_path"] = "infer.checkpoint_path"
    cfg = Config()
    cfg.model.name = "pixellink_vgg16"
    cfg.infer.link_conf_threshold = 0.9  # reference :13
    cfg = parse_flags(argv, cfg, aliases)
    width, height = 1280, 768  # reference :17-18

    predictor = Predictor(cfg)
    icfg = cfg.infer

    @jax.jit
    def run(variables, image):
        out = predictor.model.apply(variables, image)
        ps = pixel_scores_from_logits(out["pixel_logits"][0])
        ls = link_scores_from_logits(out["link_logits"][0])
        return D.pixellink_decode(
            ps, ls,
            pixel_thresh=icfg.pixel_conf_threshold,
            link_thresh=icfg.link_conf_threshold,
            min_size=icfg.min_component_size,
            max_components=icfg.max_components,
        )

    def submitted():
        """Read + resize + submit each image; dispatch is async, so image
        k+1's host->device uint8 transfer (4x fewer bytes than float32 at
        1280x768, where the copy dominates) overlaps image k's compute."""
        for im_fn in get_test_images(icfg.test_data_path):
            im_bgr = cv2.imread(im_fn)
            if im_bgr is None:
                continue
            im = cv2.resize(im_bgr, (width, height))[:, :, ::-1]
            x = jnp.asarray(np.ascontiguousarray(im)[None])
            yield im_fn, im_bgr, run(predictor.variables, x)

    from collections import deque

    pending = deque()
    DEPTH = 2

    def finalize(im_fn, im_bgr, out):
        raw_boxes, sizes, valid = map(np.asarray, out)
        h0, w0 = im_bgr.shape[:2]
        # stride-4 grid -> original image coords (reference :193-200)
        boxes = []
        for b in raw_boxes[valid]:
            b = b.copy()
            b[:, 0] *= w0 / (width / 4)
            b[:, 1] *= h0 / (height / 4)
            boxes.append(b)
        print(f"{im_fn}: {len(boxes)} boxes")
        write_result_txt(icfg.output_dir, im_fn, boxes)
        write_overlay(icfg.output_dir, im_fn, im_bgr, boxes)

    for item in submitted():
        pending.append(item)
        while len(pending) > DEPTH:
            finalize(*pending.popleft())
    while pending:
        finalize(*pending.popleft())


if __name__ == "__main__":
    main(sys.argv[1:])
