"""Serving export: serialize the detector as a portable StableHLO program.

The reference has no deployment story beyond "run test.py with a
checkpoint" (/root/reference/test.py:125-218). TPU-native serving wants a
self-describing artifact that a serving binary can load without the
training framework: ``jax.export`` serializes the jitted
forward(+decode) program to versioned StableHLO, portable across
processes, JAX versions (within the compatibility window), and platforms
(lowered for both TPU and CPU by default).

Bundle layout (``save_serving_bundle``)::

    <dir>/program.bin   versioned StableHLO (jax.export serialization)
    <dir>/meta.json     model name, input shape, stride, decode operating
                        point (calibrated thresholds if the checkpoint
                        carries them), weights contract

Two weight contracts:
- ``bake_weights=False`` (default): the program takes ``(variables,
  images)``; weights ship separately (the Orbax checkpoint). Small
  artifact, weights hot-swappable.
- ``bake_weights=True``: weights are captured as program constants; the
  artifact is fully self-contained (one file to deploy).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import export as jx

PROGRAM_FILE = "program.bin"
META_FILE = "meta.json"


def _serving_fn(predictor, with_decode: bool):
    """(variables, images[B,H,W,3] float32 RGB) -> detector outputs.

    with_decode=True returns the decoded boxes (quads, scores/sizes,
    valid) exactly as Predictor's batched path; False returns the raw
    probability maps (pixel/link scores or EAST score/geometry) for
    servers that post-process themselves.
    """
    from tensorflow_ocr_tpu import infer as I
    from tensorflow_ocr_tpu.ops import decode as D

    model = predictor.model
    icfg = predictor.cfg.infer

    if predictor.is_east:
        def fn(variables, images):
            out = model.apply(variables, images)
            if not with_decode:
                return {"score": out["score"], "geometry": out["geometry"]}

            def one(score, geo):
                return D.east_detect(score[:, :, 0], geo,
                                     score_thresh=predictor.score_thresh)
            q, s, v = jax.vmap(one)(out["score"], out["geometry"])
            return {"quads": q, "scores": s, "valid": v}
    else:
        def fn(variables, images):
            out = model.apply(variables, images)
            ps, ls = I.pixel_link_scores(out)
            if not with_decode:
                return {"pixel_scores": ps, "link_scores": ls}

            def one(p, l):
                return D.pixellink_decode(
                    p, l,
                    pixel_thresh=predictor.pixel_thresh,
                    link_thresh=predictor.link_thresh,
                    min_size=predictor.min_size,
                    max_components=icfg.max_components,
                )
            boxes, sizes, valid = jax.vmap(one)(ps, ls)
            return {"boxes": boxes, "sizes": sizes, "valid": valid}
    return fn


def export_predictor(predictor, batch: int, height: int, width: int,
                     with_decode: bool = True,
                     bake_weights: bool = False,
                     platforms: Optional[Tuple[str, ...]] = None) -> bytes:
    """Serialize the predictor's serving program to StableHLO bytes."""
    fn = _serving_fn(predictor, with_decode)
    images_spec = jax.ShapeDtypeStruct((batch, height, width, 3),
                                       jnp.float32)
    if platforms is None:
        platforms = ("cpu", "tpu")
    if bake_weights:
        variables = predictor.variables

        def baked(images):
            return fn(variables, images)

        exp = jx.export(jax.jit(baked), platforms=platforms)(images_spec)
    else:
        var_specs = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            predictor.variables)
        exp = jx.export(jax.jit(fn), platforms=platforms)(
            var_specs, images_spec)
    return exp.serialize()


def save_serving_bundle(path: str, predictor, batch: int, height: int,
                        width: int, with_decode: bool = True,
                        bake_weights: bool = False,
                        platforms: Optional[Tuple[str, ...]] = None) -> str:
    """Write program.bin + meta.json; returns the bundle dir."""
    os.makedirs(path, exist_ok=True)
    blob = export_predictor(predictor, batch, height, width,
                            with_decode=with_decode,
                            bake_weights=bake_weights, platforms=platforms)
    with open(os.path.join(path, PROGRAM_FILE), "wb") as f:
        f.write(blob)
    cfg = predictor.cfg
    meta: Dict[str, Any] = {
        "model": cfg.model.name,
        "input": {"batch": batch, "height": height, "width": width,
                  "layout": "NHWC float32 RGB, 0..255"},
        "with_decode": with_decode,
        "weights": "baked" if bake_weights else
                   f"external (Orbax checkpoint: {cfg.infer.checkpoint_path})",
        "platforms": list(platforms or ("cpu", "tpu")),
        "output_stride": predictor.stride,
        "operating_point": (
            {"score": predictor.score_thresh, "nms": predictor.nms_thresh}
            if predictor.is_east else
            {"pixel": predictor.pixel_thresh,
             "link": predictor.link_thresh,
             "min_component_size": predictor.min_size}),
        "calibrated": predictor.calibrated,
        "jax_version": jax.__version__,
        "note": ("EAST bundles return per-pixel RBOX candidates; run "
                 "utils/nms.locality_aware_nms host-side with the "
                 "operating_point nms threshold" if predictor.is_east
                 else "boxes are min-area rects at map resolution x "
                      "output_stride"),
    }
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump(meta, f, indent=1)
        f.write("\n")
    return path


def load_serving_bundle(path: str):
    """Load (callable, meta). The callable takes (variables, images) for
    the external-weights contract or (images,) for baked bundles."""
    with open(os.path.join(path, PROGRAM_FILE), "rb") as f:
        exp = jx.deserialize(f.read())
    with open(os.path.join(path, META_FILE)) as f:
        meta = json.load(f)
    return exp.call, meta
