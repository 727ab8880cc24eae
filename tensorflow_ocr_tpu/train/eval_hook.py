"""Eval-during-training: periodic detection P/R/F on a validation set.

The reference shipped eval machinery but never wired it to training
(SURVEY.md §6). This hook stages a small validation set once, then scores
the CURRENT EMA weights with the same on-device forward+decode used at
inference, logging P/R/F to the summary writer.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tensorflow_ocr_tpu.config import Config
from tensorflow_ocr_tpu.data import icdar
from tensorflow_ocr_tpu.eval.metrics import StreamingPRF
from tensorflow_ocr_tpu.infer import pixel_link_scores
from tensorflow_ocr_tpu.ops import decode as D
from tensorflow_ocr_tpu.utils import nms as N


class EvalDuringTraining:
    def __init__(self, cfg: Config, val_dir: str, max_images: int = 16):
        from tensorflow_ocr_tpu.models.detector import model_output_stride

        self.cfg = cfg
        self.is_east = cfg.model.name.startswith("east")
        self.stride = model_output_stride(cfg.model.name)
        # size thresholds are defined on the stride-4 grid; scale with
        # grid area for other strides (see infer.Predictor.min_size)
        self.min_size = int(round(
            cfg.infer.min_component_size * (4.0 / self.stride) ** 2))
        size = cfg.data.input_size
        self.images = []
        self.gts = []
        for fn in icdar.get_images(val_dir)[:max_images]:
            import cv2

            im = cv2.imread(fn)
            if im is None:
                continue
            h, w = im.shape[:2]
            gt, ignored = icdar.load_annotation(icdar.gt_path_for_image(fn))
            if gt.shape[0] == 0:
                continue
            scale = np.array([size / w, size / h], np.float32)
            self.images.append(
                cv2.resize(im, (size, size))[:, :, ::-1].copy()
            )
            self.gts.append((gt * scale, ignored))
        self.images = np.stack(self.images) if self.images else None
        self._run = None
        self._run_full = None  # full-budget decode for overflow retries
        # count of full-budget re-dispatches (decode.overflow_retry_needed)
        self.overflow_retries = 0

    def _build(self, model, max_pixels: int | None = None):
        icfg = self.cfg.infer

        if self.is_east:
            # score_thresh is a TRACED arg: one compile serves any value
            # (used by the post-training EAST threshold sweep)
            @jax.jit
            def run(variables, images, score_thresh):
                out = model.apply(variables, images)

                def one(score, geo):
                    return D.east_detect(score[:, :, 0], geo,
                                         score_thresh=score_thresh)
                return jax.vmap(one)(out["score"], out["geometry"])
        else:
            # thresholds are TRACED args: one compile serves any values
            # (used by the post-training threshold sweep)
            @jax.jit
            def run(variables, images, pixel_thresh, link_thresh):
                out = model.apply(variables, images)
                # handles both the logits schema and link8's sigmoid probs
                ps_all, ls_all = pixel_link_scores(out)

                def one(ps, ls):
                    return D.pixellink_decode(
                        ps, ls,
                        pixel_thresh=pixel_thresh,
                        link_thresh=link_thresh,
                        min_size=self.min_size,
                        max_components=icfg.max_components,
                        max_pixels=max_pixels,
                    )
                return jax.vmap(one)(ps_all, ls_all)
        return run

    def __call__(self, model, state, use_ema: bool = True,
                 pixel_thresh: float | None = None,
                 link_thresh: float | None = None,
                 score_thresh: float | None = None,
                 nms_thresh: float | None = None) -> Dict[str, float]:
        if self.images is None:
            return {}
        if self._run is None:
            self._run = self._build(model)
        params = state.ema_params if use_ema else state.params
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        x = jnp.asarray(self.images)
        prf = StreamingPRF(self.cfg.eval.matching_iou_threshold)
        if self.is_east:
            st = (self.cfg.infer.score_map_thresh if score_thresh is None
                  else score_thresh)
            nt = (self.cfg.infer.nms_thresh if nms_thresh is None
                  else nms_thresh)
            quads, scores, valid = map(
                np.asarray, self._run(variables, x, jnp.float32(st)))
            for b, (gt, ignored) in enumerate(self.gts):
                polys = np.concatenate(
                    [quads[b].reshape(-1, 8), scores[b][:, None]], 1
                )[valid[b]]
                kept = N.locality_aware_nms(
                    polys, nt, self.cfg.infer.nms_max_candidates)
                boxes = np.array(
                    [k[:8].reshape(4, 2) for k in kept]
                ).reshape(-1, 4, 2)
                prf.update(boxes, np.ones(len(boxes)), gt, ignored)
        else:
            icfg = self.cfg.infer
            pt = (icfg.pixel_conf_threshold if pixel_thresh is None
                  else pixel_thresh)
            lt = (icfg.link_conf_threshold if link_thresh is None
                  else link_thresh)
            raw, sizes, valid = map(
                np.asarray,
                self._run(variables, x, jnp.float32(pt), jnp.float32(lt)))
            if D.overflow_retry_needed(sizes, valid, self.min_size):
                # dense map blew the decode's foreground budget (common
                # early in training / at low thresholds): one exact
                # full-budget re-dispatch instead of a silent F=0
                self.overflow_retries += 1
                if self._run_full is None:
                    self._run_full = self._build(model, max_pixels=1 << 30)
                raw, sizes, valid = map(
                    np.asarray,
                    self._run_full(variables, x,
                                   jnp.float32(pt), jnp.float32(lt)))
            stride = float(self.stride)
            for b, (gt, ignored) in enumerate(self.gts):
                boxes = raw[b][valid[b]] * stride
                prf.update(boxes, np.ones(len(boxes)), gt, ignored)
        return prf.result()
