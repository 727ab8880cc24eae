"""Inference: checkpoint restore (EMA), jitted forward, on-device decode.

Rebuild of the reference inference drivers:
- /root/reference/test.py:125-218 (graph rebuild + EMA restore + per-image
  forward + NumPy/OpenCV decode)
- /root/reference/test_pixellink_fast.py:44-217 (stride-4 link-graph decode)

The forward + decode here run as one jitted program per input shape; only
box scaling and file IO stay on the host.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_ocr_tpu.config import Config
from tensorflow_ocr_tpu.models import build_model
from tensorflow_ocr_tpu.ops import decode as D
from tensorflow_ocr_tpu.train import trainer as T
from tensorflow_ocr_tpu.utils import nms as N
from tensorflow_ocr_tpu.utils.image import resize_image


def pixel_scores_from_logits(pixel_logits: jnp.ndarray) -> jnp.ndarray:
    """(h,w,2) logits -> (h,w) P(text) (reference test.py:142)."""
    return jax.nn.softmax(pixel_logits, axis=-1)[..., 1]


def link_scores_from_logits(link_logits: jnp.ndarray) -> jnp.ndarray:
    """(h,w,16) logits -> (h,w,8) P(link) (reference test.py:144-147)."""
    h, w, _ = link_logits.shape
    return jax.nn.softmax(link_logits.reshape(h, w, 8, 2), axis=-1)[..., 1]


def pixel_link_scores(out):
    """Batched (pixel_scores, link_scores) for either PixelLink output
    schema: logits (pixel_logits 2ch + link_logits 16ch) or the link8
    family's sigmoid probabilities (score 1ch + link_probs 8ch,
    reference nets/model_vgg_16.py:129-136)."""
    if "pixel_logits" in out:
        pl, ll = out["pixel_logits"], out["link_logits"]
        ps = jax.nn.softmax(pl, axis=-1)[..., 1]
        ls = jax.nn.softmax(
            ll.reshape(ll.shape[:-1] + (8, 2)), axis=-1)[..., 1]
        return ps, ls
    return out["score"][..., 0], out["link_probs"]


class Predictor:
    """Restores EMA weights (test.py:149-150 semantics) and runs detect."""

    def __init__(self, cfg: Config, state: Optional[T.TrainState] = None,
                 use_ema: bool = True):
        self.cfg = cfg
        self.model = build_model(cfg.model.name,
                                 text_scale=cfg.model.text_scale,
                                 geometry=cfg.data.geometry)
        if state is None:
            rng = jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            model, state, _ = T.create_train_state(cfg, rng, dummy)
            ck = T.latest_checkpoint(cfg.infer.checkpoint_path)
            if ck:
                state = T.restore_checkpoint_for_inference(ck, state)
        params = state.ema_params if use_ema else state.params
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        # Pin weights on device once: Orbax restores host-resident arrays,
        # and passing them per call would re-transfer ~100 MB of params on
        # every detect() (measured as 2-4 s/image through the tunnel).
        self.variables = jax.device_put(variables)
        self.is_east = cfg.model.name.startswith("east")
        # pixellink boxes come out at the model's map stride (4, or 2 for
        # the 2s variant)
        self.stride = float(getattr(self.model, "output_stride", 4))
        # min_component_size is specified at the reference's stride-4 grid
        # (groups > 10 px, test_pixellink_fast.py:174); the reference's own
        # full-res path scales it with grid area (> 200 px at 1280x720,
        # test_pixellink.py:174). Apply the same area scaling for non-4
        # strides (the 2s head: x4 pixels per instance at stride 2).
        self.min_size = int(round(
            cfg.infer.min_component_size * (4.0 / self.stride) ** 2))
        # Decode operating point: the static config defaults, unless the
        # checkpoint carries a calibrated one (train/calibrate.py sweeps
        # thresholds on a train-split slice at checkpoint time — the
        # reference's fixed 0.8/0.9 drift with the training recipe).
        icfg = cfg.infer
        self.pixel_thresh = icfg.pixel_conf_threshold
        self.link_thresh = icfg.link_conf_threshold
        self.score_thresh = icfg.score_map_thresh
        self.nms_thresh = icfg.nms_thresh
        self.calibrated = False
        if getattr(icfg, "use_calibrated_thresholds", True):
            from tensorflow_ocr_tpu.train.calibrate import (
                load_operating_point,
            )

            op = load_operating_point(icfg.checkpoint_path)
            if op:
                self.pixel_thresh = float(op.get("pixel", self.pixel_thresh))
                self.link_thresh = float(op.get("link", self.link_thresh))
                self.score_thresh = float(op.get("score", self.score_thresh))
                self.nms_thresh = float(op.get("nms", self.nms_thresh))
                self.calibrated = True
        self._fwd_cache: Dict[Tuple[int, int], callable] = {}
        # Budget-overflow retries (decode.overflow_retry_needed): count of
        # full-budget re-dispatches — observable, never silent zero boxes.
        self.overflow_retries = 0

    # extract_components clamps max_pixels to h*w, so "full budget" needs
    # no per-shape arithmetic — any value >= the label-map area is exact.
    _FULL_BUDGET = 1 << 30

    def _fwd(self, shape: Tuple[int, int], full_budget: bool = False):
        key = (shape, full_budget)
        if key not in self._fwd_cache:
            icfg = self.cfg.infer
            mp = self._FULL_BUDGET if full_budget else None

            if self.is_east:
                @jax.jit
                def run(variables, image):
                    out = self.model.apply(variables, image)
                    quads, scores, valid = D.east_detect(
                        out["score"][0, :, :, 0], out["geometry"][0],
                        score_thresh=self.score_thresh,
                    )
                    return quads, scores, valid
            else:
                @partial(jax.jit)
                def run(variables, image):
                    out = self.model.apply(variables, image)
                    ps, ls = pixel_link_scores(out)
                    return D.pixellink_decode(
                        ps[0], ls[0],
                        pixel_thresh=self.pixel_thresh,
                        link_thresh=self.link_thresh,
                        min_size=self.min_size,
                        max_components=icfg.max_components,
                        max_pixels=mp,
                    )
            self._fwd_cache[key] = run
        return self._fwd_cache[key]

    def _batch_fwd(self, shape: Tuple[int, int, int],
                   full_budget: bool = False):
        key = ("batch",) + shape + (full_budget,)
        if key not in self._fwd_cache:
            icfg = self.cfg.infer
            mp = self._FULL_BUDGET if full_budget else None

            if self.is_east:
                @jax.jit
                def run(variables, images):
                    out = self.model.apply(variables, images)

                    def one(score, geo):
                        return D.east_detect(
                            score[:, :, 0], geo,
                            score_thresh=self.score_thresh,
                        )
                    return jax.vmap(one)(out["score"], out["geometry"])
            else:
                @jax.jit
                def run(variables, images):
                    out = self.model.apply(variables, images)
                    ps_all, ls_all = pixel_link_scores(out)

                    def one(ps, ls):
                        return D.pixellink_decode(
                            ps, ls,
                            pixel_thresh=self.pixel_thresh,
                            link_thresh=self.link_thresh,
                            min_size=self.min_size,
                            max_components=icfg.max_components,
                            max_pixels=mp,
                        )
                    return jax.vmap(one)(ps_all, ls_all)
            self._fwd_cache[key] = run
        return self._fwd_cache[key]

    def _finalize_batch(self, out, x, n: int) -> List[List[np.ndarray]]:
        """Fetch one batch's device outputs and build per-image box lists.

        The np.asarray fetches block until THIS batch's program finished;
        later batches already submitted keep transferring/computing."""
        icfg = self.cfg.infer
        if self.is_east:
            quads, scores, valid = map(np.asarray, out)
            results = []
            for b in range(n):
                polys = np.concatenate(
                    [quads[b].reshape(-1, 8), scores[b][:, None]], axis=1
                )[valid[b]]
                kept = N.locality_aware_nms(polys, self.nms_thresh,
                                            icfg.nms_max_candidates)
                results.append(
                    [k[:8].reshape(4, 2) for k in kept
                     if k[8] > icfg.box_thresh]
                )
            return results
        raw_boxes, sizes, valid = map(np.asarray, out)
        if D.overflow_retry_needed(sizes, valid, self.min_size):
            # dense map blew the foreground budget: one exact re-dispatch
            self.overflow_retries += 1
            run = self._batch_fwd(tuple(np.asarray(x).shape[1:]),
                                  full_budget=True)
            raw_boxes, sizes, valid = map(
                np.asarray, run(self.variables, x))
        return [
            [b * self.stride for b in raw_boxes[i][valid[i]]]
            for i in range(n)
        ]

    def _submit_batch(self, images_rgb: np.ndarray):
        """Enqueue transfer + forward + decode for one batch (async)."""
        # keep uint8 on the wire; the model casts on device (4x less
        # host->device traffic, which dominates batch latency)
        x = jnp.asarray(images_rgb)
        run = self._batch_fwd(tuple(images_rgb.shape[1:]))
        # keep x: the overflow retry re-dispatches on the device-resident
        # images without a second host->device transfer
        return run(self.variables, x), x, len(images_rgb)

    def detect_batch(self, images_rgb: np.ndarray
                     ) -> List[List[np.ndarray]]:
        """Batched detection on same-sized images (serving path).

        images_rgb: (B, H, W, 3) with H, W multiples of 32. One fused
        forward + vmapped decode per batch amortizes the dispatch
        round-trip that dominates single-image latency on remote runtimes.
        Returns per-image box lists in input coordinates.
        For a stream of batches, prefer :meth:`detect_batches` — it
        overlaps the host->device image transfer with device compute.
        """
        out, x, n = self._submit_batch(images_rgb)
        return self._finalize_batch(out, x, n)

    def detect_batches(self, batches, depth: int = 2):
        """Pipelined serving path over a stream of same-shaped batches.

        Yields per-batch results (same schema as :meth:`detect_batch`)
        while keeping up to ``depth`` batches in flight: JAX dispatch is
        asynchronous, so batch k+1's host->device uint8 transfer and
        forward overlap the wait for batch k's results — the
        DevicePrefetcher pattern (data/pipeline.py) applied to serving.
        The reference's loop ran one synchronous sess.run per IMAGE
        (/root/reference/test.py:160-218).
        """
        from collections import deque

        q: deque = deque()
        for imgs in batches:
            q.append(self._submit_batch(imgs))
            while len(q) > depth:
                yield self._finalize_batch(*q.popleft())
        while q:
            yield self._finalize_batch(*q.popleft())

    def detect(self, im_rgb: np.ndarray) -> Tuple[List[np.ndarray], float]:
        """Detect text boxes in one RGB image. Returns (boxes, net_ms).

        Boxes are (4,2) float arrays in ORIGINAL image coordinates.
        """
        icfg = self.cfg.infer
        t0 = time.time()
        im_resized, (ratio_h, ratio_w) = resize_image(
            im_rgb, icfg.max_side_len
        )
        x = jnp.asarray(im_resized[None])  # uint8 on the wire
        run = self._fwd(im_resized.shape[:2])
        if self.is_east:
            quads, scores, valid = run(self.variables, x)
            quads, scores, valid = map(np.asarray, (quads, scores, valid))
            polys = np.concatenate(
                [quads.reshape(-1, 8), scores[:, None]], axis=1
            )[valid]
            kept = N.locality_aware_nms(polys, self.nms_thresh,
                                        icfg.nms_max_candidates)
            boxes = [k[:8].reshape(4, 2) for k in kept if k[8] > icfg.box_thresh]
        else:
            raw_boxes, sizes, valid = run(self.variables, x)
            raw_boxes = np.asarray(raw_boxes)
            sizes, valid = np.asarray(sizes), np.asarray(valid)
            if D.overflow_retry_needed(sizes, valid, self.min_size):
                # dense map blew the foreground budget: one exact re-run
                self.overflow_retries += 1
                run = self._fwd(im_resized.shape[:2], full_budget=True)
                raw_boxes, sizes, valid = map(
                    np.asarray, run(self.variables, x))
            boxes = [b * self.stride for b in raw_boxes[valid]]
        net_ms = (time.time() - t0) * 1000
        out = []
        for b in boxes:
            b = b.copy()
            b[:, 0] /= ratio_w
            b[:, 1] /= ratio_h
            out.append(b)
        return out, net_ms
