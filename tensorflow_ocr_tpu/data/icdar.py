"""ICDAR-2015 dataset: loading, augmentation, host-side sample prep.

Rebuild of /root/reference/datasets/icdar.py's IO and augmentation layers.
The crucial architectural difference: the host prepares only images +
padded polygon arrays; the dense label rasterization runs on the TPU
(ops/labels.py), eliminating the per-pixel Python loops that capped the
reference's ingest throughput (SURVEY.md §3.2 'HOT' path).

Parity map:
- get_images        -> icdar.py:36-41 (same extension glob)
- load_annotation   -> icdar.py:43-66 (CSV quads, BOM strip, ###/* tags;
                       the reference misspells it 'load_annoataion' — an
                       alias keeps the public name)
- crop_area         -> icdar.py:138-199
- random_scale      -> icdar.py:576-578 (wired but commented out there;
                       re-enabled under DataConfig.use_random_scale)
- sample prep       -> icdar.py:599-634 (resize to input_size, scale polys)
- EAST extras       -> per-poly shrink + rectangle fit feeding
                       ops/labels.east_geo_maps (shrink at icdar.py:202-266,
                       fit at icdar.py:317-407)
"""

from __future__ import annotations

import csv
import glob
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

from tensorflow_ocr_tpu.config import DataConfig
from tensorflow_ocr_tpu.ops import geometry as G


def get_images(data_path: str) -> List[str]:
    files: List[str] = []
    for ext in ["jpg", "png", "jpeg", "JPG"]:
        files.extend(glob.glob(os.path.join(data_path, f"*.{ext}")))
    return sorted(files)


def load_annotation(p: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse a gt_*.txt: 8 coords + label per line; ###/* => ignored."""
    polys, tags = [], []
    if not os.path.exists(p):
        return np.zeros((0, 4, 2), np.float32), np.zeros((0,), bool)
    with open(p, "r", encoding="utf-8-sig", newline="") as f:
        for line in csv.reader(f):
            if not line:
                continue
            label = line[-1].strip()
            vals = [v.strip().lstrip("﻿") for v in line[:8]]
            x1, y1, x2, y2, x3, y3, x4, y4 = map(float, vals)
            polys.append([[x1, y1], [x2, y2], [x3, y3], [x4, y4]])
            tags.append(label in ("*", "###"))
    if not polys:
        return np.zeros((0, 4, 2), np.float32), np.zeros((0,), bool)
    return np.array(polys, np.float32), np.array(tags, bool)


# public alias matching the reference's (misspelled) API name
load_annoataion = load_annotation


def gt_path_for_image(im_fn: str) -> str:
    """Reference icdar.py:564 naming: dir/gt_<stem>.txt."""
    d, base = os.path.split(im_fn)
    stem = base[: base.rfind(".")]
    return os.path.join(d, f"gt_{stem}.txt")


def crop_area(im, polys, tags, crop_background=False, max_tries=50,
              min_crop_side_ratio=0.1, rng: Optional[np.random.RandomState] = None):
    """Random crop avoiding text cuts (reference icdar.py:138-199)."""
    rng = rng or np.random
    h, w, _ = im.shape
    pad_h, pad_w = h // 10, w // 10
    h_array = np.zeros((h + pad_h * 2,), np.int32)
    w_array = np.zeros((w + pad_w * 2,), np.int32)
    for poly in polys:
        p = np.round(poly).astype(np.int32)
        w_array[p[:, 0].min() + pad_w: p[:, 0].max() + pad_w] = 1
        h_array[p[:, 1].min() + pad_h: p[:, 1].max() + pad_h] = 1
    h_axis = np.where(h_array == 0)[0]
    w_axis = np.where(w_array == 0)[0]
    if len(h_axis) == 0 or len(w_axis) == 0:
        return im, polys, tags
    for _ in range(max_tries):
        xx = rng.choice(w_axis, size=2)
        xmin, xmax = np.clip(np.sort(xx) - pad_w, 0, w - 1)
        yy = rng.choice(h_axis, size=2)
        ymin, ymax = np.clip(np.sort(yy) - pad_h, 0, h - 1)
        if (xmax - xmin < min_crop_side_ratio * w
                or ymax - ymin < min_crop_side_ratio * h):
            continue
        if polys.shape[0] != 0:
            in_area = (
                (polys[:, :, 0] >= xmin) & (polys[:, :, 0] <= xmax)
                & (polys[:, :, 1] >= ymin) & (polys[:, :, 1] <= ymax)
            )
            selected = np.where(in_area.sum(axis=1) == 4)[0]
        else:
            selected = np.array([], np.int64)
        if len(selected) == 0:
            if crop_background:
                return (
                    im[ymin:ymax + 1, xmin:xmax + 1],
                    polys[selected],
                    tags[selected],
                )
            continue
        im = im[ymin:ymax + 1, xmin:xmax + 1]
        polys = polys[selected].copy()
        tags = tags[selected]
        polys[:, :, 0] -= xmin
        polys[:, :, 1] -= ymin
        return im, polys, tags
    return im, polys, tags


def rotate_image_and_polys(im, polys, deg, rng=None):
    """Small-angle rotation augmentation (heavy-aug config, BASELINE #4)."""
    h, w = im.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0)
    im = cv2.warpAffine(im, m, (w, h))
    if polys.shape[0]:
        ones = np.ones((*polys.shape[:2], 1), np.float32)
        hom = np.concatenate([polys, ones], axis=2)  # (K,4,3)
        polys = hom @ m.T.astype(np.float32)
    return im, polys


@dataclass
class Sample:
    """One prepared training sample (host side, label gen deferred)."""

    image: np.ndarray      # (H, W, 3) uint8 RGB (cast to f32 on device)
    polys: np.ndarray      # (K, 4, 2) float32, zero-padded
    tags: np.ndarray       # (K,) bool — ignored flag
    valid: np.ndarray      # (K,) bool — padding mask
    # EAST extras (zeros when not requested)
    shrunk: np.ndarray     # (K, 4, 2)
    rects: np.ndarray      # (K, 4, 2)
    angles: np.ndarray     # (K,)
    fn: str = ""


def _pad_polys(polys, tags, max_polys: int):
    k = min(len(polys), max_polys)
    out_p = np.zeros((max_polys, 4, 2), np.float32)
    out_t = np.zeros((max_polys,), bool)
    out_v = np.zeros((max_polys,), bool)
    if k:
        out_p[:k] = polys[:k]
        out_t[:k] = tags[:k]
        out_v[:k] = True
    return out_p, out_t, out_v


def east_poly_geometry(polys: np.ndarray):
    """Per-poly shrink + rectangle fit for EAST labels (host-side scalars).

    Mirrors argman-EAST's generate_rbox per-poly stage the reference kept
    helpers for (shrink icdar.py:202-266, fit icdar.py:317-372, sort
    icdar.py:375-407); the dense per-pixel work happens on device in
    ops/labels.east_geo_maps.
    """
    k = polys.shape[0]
    shrunk = np.zeros_like(polys)
    rects = np.zeros_like(polys)
    angles = np.zeros((k,), np.float32)
    for i in range(k):
        poly = polys[i]
        if not poly.any():
            continue
        r = np.array(
            [
                min(np.linalg.norm(poly[j] - poly[(j + 1) % 4]),
                    np.linalg.norm(poly[j] - poly[(j - 1) % 4]))
                for j in range(4)
            ]
        )
        try:
            shrunk[i] = G.shrink_poly(poly, r)
            fitted = G.rectangle_from_parallelogram(poly)
            rect, angle = G.sort_rectangle(fitted)
            rects[i] = rect
            angles[i] = angle
        except Exception:
            shrunk[i] = poly
            rects[i] = poly
    return shrunk, rects, angles


_DECODE_CACHE: dict = {}
_DECODE_CACHE_MAX = 256


def _read_image(im_fn: str, cache: bool):
    """JPEG decode with an LRU-ish cache.

    The reference re-decodes every image every epoch in every worker
    (icdar.py:560); production input pipelines cache decoded frames when
    the dataset fits — with host decode being the single-core bottleneck
    here, this is the difference between ~45 and >1000 img/s of raw ingest.
    """
    if cache:
        hit = _DECODE_CACHE.get(im_fn)
        if hit is not None:
            return hit
    im = cv2.imread(im_fn)
    if cache and im is not None:
        if len(_DECODE_CACHE) >= _DECODE_CACHE_MAX:
            _DECODE_CACHE.pop(next(iter(_DECODE_CACHE)))
        _DECODE_CACHE[im_fn] = im
    return im


def prepare_sample(im_fn: str, cfg: DataConfig,
                   rng: Optional[np.random.RandomState] = None,
                   want_east: bool = False) -> Optional[Sample]:
    """Load + augment + resize one image; polys in resized coordinates."""
    rng = rng or np.random.RandomState()
    im = _read_image(im_fn, getattr(cfg, "cache_decoded_images", True))
    if im is None:
        return None
    h, w = im.shape[:2]
    txt_fn = gt_path_for_image(im_fn)
    if not os.path.exists(txt_fn):
        return None
    polys, tags = load_annotation(txt_fn)
    polys, tags = G.check_and_validate_polys(polys, tags, (h, w))

    if cfg.use_random_scale and polys.shape[0]:
        sc = float(rng.choice(np.asarray(cfg.random_scale)))
        im = cv2.resize(im, dsize=None, fx=sc, fy=sc)
        polys = polys * sc
    if cfg.use_rotate:
        deg = float(rng.uniform(-cfg.max_rotate_deg, cfg.max_rotate_deg))
        im, polys = rotate_image_and_polys(im, polys, deg, rng)
        polys, tags = G.check_and_validate_polys(polys, tags, im.shape[:2])
    size = cfg.input_size
    if cfg.use_crop and rng.rand() < cfg.background_ratio:
        # Background sample (the intended-but-disabled branch at
        # reference datasets/icdar.py:582-598): crop a text-free region,
        # pad square, train it as pure negatives. Skip the image if no
        # text-free crop can be found (reference `continue`s).
        im, polys, tags = crop_area(
            im, polys, tags, crop_background=True,
            min_crop_side_ratio=cfg.min_crop_side_ratio, rng=rng,
        )
        if polys.shape[0] > 0:
            return None
        new_h, new_w = im.shape[:2]
        side = max(new_h, new_w, size)
        im_padded = np.zeros((side, side, 3), im.dtype)
        im_padded[:new_h, :new_w] = im
        im = cv2.resize(im_padded, dsize=(size, size))
        polys = np.zeros((0, 4, 2), np.float32)
        tags = np.zeros((0,), bool)
    else:
        if cfg.use_crop:
            im, polys, tags = crop_area(
                im, polys, tags, crop_background=False,
                min_crop_side_ratio=cfg.min_crop_side_ratio, rng=rng,
            )
        if polys.shape[0] == 0:
            return None

        new_h, new_w = im.shape[:2]
        im = cv2.resize(im, dsize=(size, size))
        polys = polys.copy()
        polys[:, :, 0] *= size / float(new_w)
        polys[:, :, 1] *= size / float(new_h)

    padded, ptags, pvalid = _pad_polys(polys, tags, cfg.max_polys)
    if want_east:
        shrunk, rects, angles = east_poly_geometry(padded)
    else:
        shrunk = np.zeros_like(padded)
        rects = np.zeros_like(padded)
        angles = np.zeros((cfg.max_polys,), np.float32)
    return Sample(
        image=np.ascontiguousarray(im[:, :, ::-1]),  # BGR->RGB, uint8
        polys=padded, tags=ptags, valid=pvalid,
        shrunk=shrunk, rects=rects, angles=angles, fn=im_fn,
    )


def _chars_along(ctr, ux, uy, n_ch, ch_w, ch_h, pitch):
    """Character quads placed along direction ux with the given pitch."""
    out = []
    for c in range(n_ch):
        off = (c - (n_ch - 1) / 2.0) * pitch
        cc = ctr + ux * off
        out.append(np.stack([
            cc + ux * ch_w / 2 + uy * ch_h / 2,
            cc - ux * ch_w / 2 + uy * ch_h / 2,
            cc - ux * ch_w / 2 - uy * ch_h / 2,
            cc + ux * ch_w / 2 - uy * ch_h / 2,
        ]))
    return out


def _v2_instance(rng, h, w, cx, cy, bh, ang_deg, kind=None):
    """One v2 text instance at (cx, cy): returns (char_polys, gt_quad).

    Phenomena beyond the v1 striped plates (VERDICT round-2 weak #5 —
    the v1 set stopped discriminating): perspective-warped instances,
    curved baselines, and extreme scales (bh spans ~7..h/3 at the call
    site). The GT quad is the min-area rect of the character quads, the
    tightest ICDAR-quad a fair annotator would draw.
    """
    ang = np.deg2rad(ang_deg)
    ux = np.array([np.cos(ang), np.sin(ang)])
    uy = np.array([-ux[1], ux[0]])
    n_ch = rng.randint(3, 9)
    pitch = bh * rng.uniform(0.7, 0.95)
    ch_w, ch_h = pitch * 0.6, bh * rng.uniform(0.6, 0.8)
    ctr = np.array([cx, cy], np.float32)
    if kind is None:
        kind = rng.randint(3)  # 0 straight, 1 curved, 2 perspective
    chars = _chars_along(ctr, ux, uy, n_ch, ch_w, ch_h, pitch)
    if kind == 1:
        # curved baseline: displace each char along uy by a sine bow
        bow = bh * rng.uniform(0.6, 1.6) * rng.choice([-1.0, 1.0])
        for c in range(n_ch):
            t = c / max(n_ch - 1, 1) * 2 - 1        # -1..1
            disp = uy * bow * (1 - t * t)           # parabolic arc
            rot = np.deg2rad(rng.uniform(-12, 12))  # slight char wobble
            cr, sr = np.cos(rot), np.sin(rot)
            m = np.array([[cr, -sr], [sr, cr]])
            cc = chars[c].mean(0)
            chars[c] = (chars[c] - cc) @ m.T + cc + disp
    elif kind == 2:
        # perspective: project through a random homography anchored on
        # the instance's bounding box
        ext = n_ch * pitch / 2 + ch_w
        src = np.array([ctr + ux * ext + uy * bh, ctr - ux * ext + uy * bh,
                        ctr - ux * ext - uy * bh, ctr + ux * ext - uy * bh],
                       np.float32)
        dst = src + rng.uniform(-0.22, 0.22, (4, 2)).astype(np.float32) * \
            np.array([ext, bh], np.float32)
        H = cv2.getPerspectiveTransform(src, dst)
        pts = np.concatenate(chars).astype(np.float32).reshape(-1, 1, 2)
        warped = cv2.perspectiveTransform(pts, H).reshape(-1, 4, 2)
        chars = [warped[c] for c in range(n_ch)]
    allpts = np.concatenate(chars).astype(np.float32)
    rect = cv2.boxPoints(cv2.minAreaRect(allpts))
    c0 = allpts.mean(0)
    rect = rect[np.argsort(np.arctan2(rect[:, 1] - c0[1],
                                      rect[:, 0] - c0[0]))]
    return chars, rect


def _photo_sources(tier: str = "photo") -> dict:
    """Real photographs shipped inside installed packages, split into
    disjoint train/val background sets (no background-image leakage).

    The container has no ICDAR data (REAL_DATA.md); these are the only
    genuine photographs available offline. Compositing rendered text over
    them — cluttered real textures: architecture, foliage, people — is the
    closest available proxy to real scene-text statistics, vs the
    procedural gradients of the v1/v2 tiers.

    ``tier="photo"`` is the original 4+4 set (kept stable so QUALITY_r05
    photo rows stay comparable across rounds). ``tier="photo2"`` adds
    real photographic *textures* from dm_control / gymnasium_robotics
    assets — wood grain, marble, grass, fur, brushed metal, an outdoor
    skybox — roughly doubling both splits. Near-duplicate sources (the
    two marble tiles) sit on the SAME side of the split, so split
    disjointness is by content, not just by file.
    """
    import sysconfig
    site = sysconfig.get_paths()["purelib"]
    cands = {
        "train": [
            os.path.join(site, "sklearn/datasets/images/china.jpg"),
            os.path.join(site, "sklearn/datasets/images/flower.jpg"),
            os.path.join(site, "matplotlib/mpl-data/sample_data/"
                               "grace_hopper.jpg"),
            os.path.join(site, "pygame/docs/generated/_images/"
                               "intro_freedom.jpg"),
        ],
        "val": [
            os.path.join(site, "pygame/docs/generated/_images/"
                               "intro_blade.jpg"),
            os.path.join(site, "pygame/docs/generated/_images/"
                               "camera_rgb.jpg"),
            os.path.join(site, "pygame/docs/generated/_images/"
                               "camera_background.jpg"),
            os.path.join(site, "pygame/examples/data/alien1.jpg"),
        ],
    }
    if tier == "photo2":
        _tex = "gymnasium_robotics/envs/assets/"
        _out = "dm_control/locomotion/arenas/assets/outdoor_natural/"
        cands["train"] += [
            os.path.join(site, _tex, "kitchen_franka/kitchen_assets/"
                                     "textures/wood1.png"),
            os.path.join(site, _tex, "kitchen_franka/kitchen_assets/"
                                     "textures/white_marble_tile.png"),
            os.path.join(site, _tex, "kitchen_franka/kitchen_assets/"
                                     "textures/white_marble_tile2.png"),
            os.path.join(site, _out, "OutdoorGrassFloorD.png"),
            os.path.join(site, "dm_control/suite/dog_assets/"
                               "skin_texture.png"),
        ]
        cands["val"] += [
            os.path.join(site, _tex, "kitchen_franka/kitchen_assets/"
                                     "textures/tile1.png"),
            os.path.join(site, _tex, "adroit_hand/resources/textures/"
                                     "silverRaw.png"),
            os.path.join(site, _tex, "adroit_hand/resources/textures/"
                                     "skin.png"),
            os.path.join(site, _out, "OutdoorSkybox2048.png"),
        ]
    return {k: [p for p in v if os.path.exists(p)] for k, v in cands.items()}


def _photo_background(rng, h, w, split: str,
                      tier: str = "photo") -> np.ndarray:
    """Random crop (matched aspect) of a real package photo, resized to
    (h, w), with random flip + photometric jitter. BGR uint8."""
    paths = _photo_sources(tier)[split]
    if not paths:
        raise FileNotFoundError(
            "no real package photos found for the 'photo' scene tier "
            "(looked in sklearn/matplotlib/pygame data dirs)")
    src = cv2.imread(paths[rng.randint(len(paths))])
    sh, sw = src.shape[:2]
    # crop with the target aspect ratio, as large as fits
    frac = rng.uniform(0.55, 1.0)
    ch = int(sh * frac)
    cw = int(round(ch * w / h))
    if cw > sw:
        cw = sw
        ch = int(round(cw * h / w))
    y0 = rng.randint(0, max(sh - ch, 0) + 1)
    x0 = rng.randint(0, max(sw - cw, 0) + 1)
    crop = src[y0:y0 + ch, x0:x0 + cw]
    if rng.rand() < 0.5:
        crop = crop[:, ::-1]
    im = cv2.resize(crop, (w, h), interpolation=cv2.INTER_LINEAR)
    gain = rng.uniform(0.75, 1.15)
    bias = rng.uniform(-18, 18)
    return np.clip(im.astype(np.float32) * gain + bias, 0, 255) \
        .astype(np.uint8)


def _render_photo_instance(rng, im, chars, rect) -> None:
    """Composite one text instance photo-realistically (in place).

    Unlike the v1/v2 plate rendering, most real scene text sits directly
    on the scene: ink color is picked to contrast the local background,
    edges are antialiased via a blurred alpha mask, and an opaque sign
    plate appears only occasionally.
    """
    h, w = im.shape[:2]
    hull = cv2.convexHull(np.concatenate(chars).astype(np.int32))
    region = np.zeros((h, w), np.uint8)
    cv2.fillPoly(region, [hull], 1)
    local_mean = float(im[region > 0].mean()) if region.any() else 127.0
    if rng.rand() < 0.3:  # sign plate
        plate_lum = 220 if local_mean < 140 else 40
        plate = np.clip(plate_lum + rng.randint(-25, 26, 3), 0, 255)
        pm = cv2.GaussianBlur(region.astype(np.float32), (3, 3), 0.8)
        im[:] = (im * (1 - pm[..., None])
                 + plate[None, None, :] * pm[..., None]).astype(np.uint8)
        local_mean = float(plate.mean())
    ink_lum = rng.randint(170, 256) if local_mean < 128 else \
        rng.randint(0, 86)
    ink = np.clip(ink_lum + rng.randint(-40, 41, 3), 0, 255) \
        .astype(np.float32)
    mask = np.zeros((h, w), np.uint8)
    for cb in chars:
        cv2.fillPoly(mask, [np.round(cb).astype(np.int32)], 1)
    alpha = cv2.GaussianBlur(mask.astype(np.float32), (3, 3), 0.9)
    alpha *= rng.uniform(0.8, 1.0)
    im[:] = (im * (1 - alpha[..., None])
             + ink[None, None, :] * alpha[..., None]).astype(np.uint8)


def _gt_coords(quad: np.ndarray, w: int, h: int) -> str:
    """Serialize a 4-point quad as ICDAR GT coords, clamped to the
    canvas — curved/perspective instances can extend past the frame, and
    GT must claim only regions the renderer could actually ink."""
    pts = np.asarray(quad, np.float64).reshape(-1, 2)
    xs = np.clip(np.round(pts[:, 0]), 0, w - 1).astype(int)
    ys = np.clip(np.round(pts[:, 1]), 0, h - 1).astype(int)
    return ",".join(str(v) for xy in zip(xs, ys) for v in xy)


def make_synthetic_dataset(path: str, num_images: int = 10,
                           size: Tuple[int, int] = (480, 640),
                           seed: int = 0, hard=False,
                           start_index: int = 0) -> List[str]:
    """Write a tiny synthetic ICDAR-format dataset (images + gt_*.txt).

    The container has no ICDAR-2015 data; tests and benchmarks use this to
    exercise the exact file format the reference consumes.

    ``hard=True`` renders scenes a detector can actually get wrong:
    textured backgrounds, striped text-like instances (not solid boxes),
    non-text distractor shapes that must NOT be detected (circles, lines,
    solid blobs), more instances with wider rotations, and ### ignore
    regions — used for the held-out evaluation in BASELINE.md.

    ``hard="v2"`` additionally renders perspective-warped instances,
    curved baselines, dense multi-line crowding, and extreme scales
    (instance heights from ~7 px to h/3) — the re-armed benchmark after
    the v1 set saturated (zero train/val gap at F 0.667).

    ``hard="photo:train"`` / ``"photo:val"`` composites the v2 instance
    geometry over REAL photographs shipped in installed packages
    (disjoint background sets per split — see ``_photo_sources``), with
    plate-free contrast-picked ink, antialiased alpha blending, and
    variable JPEG quality: the closest available proxy to real
    scene-text data in a container without ICDAR-2015.
    ``hard="photo2:train"`` / ``"photo2:val"`` is the same rendering over
    the EXPANDED background sets (photo tier + real photographic textures
    from dm_control/gymnasium assets; see ``_photo_sources("photo2")``).
    """
    os.makedirs(path, exist_ok=True)
    rng = np.random.RandomState(seed)
    h, w = size
    photo = isinstance(hard, str) and hard.startswith("photo")
    photo_split = hard.split(":", 1)[1] if photo and ":" in hard else "train"
    photo_tier = hard.split(":", 1)[0] if photo else "photo"
    v2 = hard == "v2" or photo
    files = []
    for i in range(start_index, start_index + num_images):
        if photo:
            im = _photo_background(rng, h, w, photo_split, photo_tier)
            n_inst = 0  # instances come from the v2 placement loop
            max_ang = 60
        elif hard:
            # textured background: low-freq gradient + noise
            yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
            base = (40 + 30 * np.sin(xx / w * rng.uniform(2, 8))
                    + 30 * np.cos(yy / h * rng.uniform(2, 8)))
            im = np.clip(
                base[..., None] + rng.randn(h, w, 3) * 12, 0, 120
            ).astype(np.uint8)
            # distractors: bright shapes that are not text
            for _ in range(rng.randint(2, 6)):
                kind = rng.randint(3)
                col = tuple(int(c) for c in rng.randint(160, 255, 3))
                if kind == 0:
                    cv2.circle(im, (rng.randint(0, w), rng.randint(0, h)),
                               rng.randint(8, 40), col, -1)
                elif kind == 1:
                    p0 = (rng.randint(0, w), rng.randint(0, h))
                    p1 = (rng.randint(0, w), rng.randint(0, h))
                    cv2.line(im, p0, p1, col, rng.randint(2, 5))
                else:
                    cx0, cy0 = rng.randint(0, w), rng.randint(0, h)
                    s = rng.randint(10, 30)
                    cv2.rectangle(im, (cx0, cy0), (cx0 + s, cy0 + s),
                                  col, -1)
            n_inst = rng.randint(3, 11)
            max_ang = 60
        else:
            im = rng.randint(0, 80, (h, w, 3), np.uint8)
            n_inst = rng.randint(1, 6)
            max_ang = 30
        lines = []
        if v2:
            insts = []
            placed = []  # axis-aligned bboxes of accepted instances

            def overlaps(rect):
                # pure check — callers that accept a candidate must
                # register() it explicitly (a check-only call must not
                # corrupt placement state)
                x0, y0 = rect.min(0)
                x1, y1 = rect.max(0)
                for (a0, b0, a1, b1) in placed:
                    ix = max(0, min(x1, a1) - max(x0, a0))
                    iy = max(0, min(y1, b1) - max(y0, b0))
                    inter = ix * iy
                    if inter > 0.05 * min((x1 - x0) * (y1 - y0),
                                          (a1 - a0) * (b1 - b0)):
                        return True
                return False

            def register(rect):
                x0, y0 = rect.min(0)
                x1, y1 = rect.max(0)
                placed.append((x0, y0, x1, y1))

            for _ in range(rng.randint(3, 7)):
                for _try in range(8):  # retry placement on overlap
                    # extreme scales: log-uniform height 7 .. h/3
                    bh_i = float(np.exp(rng.uniform(np.log(7.0),
                                                    np.log(h / 3.0))))
                    ext = min(4.0 * bh_i, w / 2.0 - 2)
                    cx = rng.uniform(ext, w - ext)
                    cy = rng.uniform(ext / 2, h - ext / 2)
                    ang = rng.uniform(-60, 60)
                    if rng.rand() < 0.4 and bh_i < h / 8:
                        # dense crowding: 3-5 parallel lines, small gaps
                        # — stresses link-based instance separation
                        n_lines = rng.randint(3, 6)
                        gap = bh_i * rng.uniform(1.25, 1.7)
                        a = np.deg2rad(ang)
                        uy = np.array([-np.sin(a), np.cos(a)])
                        block = []
                        for li in range(n_lines):
                            off = (li - (n_lines - 1) / 2.0) * gap
                            block.append(_v2_instance(
                                rng, h, w, cx + uy[0] * off,
                                cy + uy[1] * off, bh_i, ang, kind=0))
                        # reject a block whose hull overlaps prior
                        # instances (crossing text -> ambiguous labels)
                        hull_pts = np.concatenate(
                            [r for _, r in block]).astype(np.float32)
                        if overlaps(hull_pts):
                            continue
                        register(hull_pts)
                        insts.extend((c, r, bh_i) for c, r in block)
                    else:
                        chars, rect = _v2_instance(rng, h, w, cx, cy,
                                                   bh_i, ang)
                        if overlaps(rect):
                            continue
                        register(rect)
                        insts.append((chars, rect, bh_i))
                    break
            for chars, rect, bh_i in insts:
                if photo:
                    _render_photo_instance(rng, im, chars, rect)
                else:
                    allpts = np.concatenate(chars).astype(np.int32)
                    hull = cv2.convexHull(allpts)
                    plate = tuple(int(c) for c in rng.randint(190, 255, 3))
                    cv2.fillPoly(im, [hull], plate)
                    ink = (int(plate[0] * 0.2),) * 3
                    for cb in chars:
                        cv2.fillPoly(im, [cb.astype(np.int32)], ink)
                # unreadably small instances are don't-care, like ICDAR's
                # ### convention for illegible text
                tag = ("###" if bh_i < 8.5 or rng.rand() < 0.15
                       else "text")
                lines.append(f"{_gt_coords(rect, w, h)},{tag}")
            n_inst = 0  # v1 instance loop below is skipped
        for _ in range(n_inst):
            mx, my = max(w // 6, 16), max(h // 6, 12)
            cx, cy = rng.randint(mx, w - mx), rng.randint(my, h - my)
            bw = rng.randint(max(w // 12, 8), max(w // 4, 16))
            bh = rng.randint(max(h // 24, 6), max(h // 10, 10))
            ang = rng.uniform(-max_ang, max_ang)
            box = cv2.boxPoints(((cx, cy), (bw, bh), ang))
            # order clockwise from top-left-ish for gt format
            box = box[np.argsort(np.arctan2(box[:, 1] - cy, box[:, 0] - cx))]
            if hard:
                # striped "characters" on a bright plate, like real text
                plate = tuple(int(c) for c in rng.randint(190, 255, 3))
                cv2.fillPoly(im, [box.astype(np.int32)], plate)
                n_ch = max(2, int(round(bw / max(bh * 0.7, 4))))
                ux = np.array([np.cos(np.deg2rad(ang)),
                               np.sin(np.deg2rad(ang))])
                uy = np.array([-ux[1], ux[0]])
                for c in range(n_ch):
                    off = (c - (n_ch - 1) / 2.0) * (bw / max(n_ch, 1))
                    ctr = np.array([cx, cy]) + ux * off
                    cw, chh = bw / max(n_ch, 1) * 0.55, bh * 0.6
                    cb = np.stack([
                        ctr + ux * cw / 2 + uy * chh / 2,
                        ctr - ux * cw / 2 + uy * chh / 2,
                        ctr - ux * cw / 2 - uy * chh / 2,
                        ctr + ux * cw / 2 - uy * chh / 2,
                    ])
                    cv2.fillPoly(im, [cb.astype(np.int32)],
                                 (int(plate[0] * 0.2),) * 3)
                tag = "###" if rng.rand() < 0.2 else "text"
            else:
                cv2.fillPoly(im, [box.astype(np.int32)], (255, 255, 255))
                tag = "###" if rng.rand() < 0.15 else "text"
            lines.append(f"{_gt_coords(box, w, h)},{tag}")
        fn = os.path.join(path, f"img_{i}.jpg")
        if photo:
            # variable compression, like camera/web imagery
            cv2.imwrite(fn, im,
                        [cv2.IMWRITE_JPEG_QUALITY, int(rng.randint(60, 93))])
        else:
            cv2.imwrite(fn, im)
        with open(os.path.join(path, f"gt_img_{i}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        files.append(fn)
    return files
