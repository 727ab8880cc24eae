"""Device-resident dataset cache for in-device training loops.

For datasets that fit in HBM (ICDAR-2015 train is ~1000 images; at 512x512
uint8 that is ~0.8 GB), the fastest TPU input pipeline is no host pipeline
at all: stage decoded+resized images and padded polygon tensors in HBM
once, then let each train step gather its batch by index on device. The
host's only per-step job is choosing random indices. Combined with a
``lax.scan`` multi-step train loop (train/trainer.py make_multi_train_step)
the whole load->label->fwd/bwd path runs in one XLA program per S steps.

The reference's default config does exactly resize->label-gen per epoch
(random crop and scale are disabled at /root/reference/datasets/icdar.py:
576-600), so staging pre-resized frames reproduces its default pipeline
semantics with a one-time prep; label generation still runs on device
every step.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from tensorflow_ocr_tpu.config import DataConfig
from tensorflow_ocr_tpu.data import icdar


class DeviceDataset:
    """Host-side staging of the full dataset into dense arrays.

    With ``precompute_labels=True`` (valid whenever per-sample labels are
    deterministic, i.e. augmentation off — the reference's default config),
    the stride-4 label maps are generated once at staging with the same
    device kernels the train step would use, and cached alongside the
    images (~0.65 MB/img at 512px). Train steps then gather labels instead
    of re-rasterizing, trading a little HBM for per-step compute.
    """

    def __init__(self, cfg: DataConfig, want_east: bool = False,
                 max_images: Optional[int] = None,
                 precompute_labels: bool = False, label_stride: int = 4):
        files = icdar.get_images(cfg.training_data_path)
        if max_images:
            files = files[:max_images]
        rng = np.random.RandomState(0)
        samples = self._stage_native(files, cfg, want_east)
        if samples is None:
            samples = []
            for fn in files:
                s = icdar.prepare_sample(fn, cfg, rng, want_east=want_east)
                if s is not None:
                    samples.append(s)
        if not samples:
            raise FileNotFoundError(
                f"no usable training images in {cfg.training_data_path}"
            )
        self.images = np.stack([s.image for s in samples])        # (N,H,W,3) u8
        self.polys = np.stack([s.polys for s in samples])
        self.tags = np.stack([s.tags for s in samples])
        self.valid = np.stack([s.valid for s in samples])
        self.want_east = want_east
        if want_east:
            self.shrunk = np.stack([s.shrunk for s in samples])
            self.rects = np.stack([s.rects for s in samples])
            self.angles = np.stack([s.angles for s in samples])
        self.n = len(samples)
        self.labels: Dict[str, np.ndarray] = {}
        if precompute_labels:
            self._precompute(cfg, label_stride)

    @staticmethod
    def _stage_native(files, cfg: DataConfig, want_east: bool):
        """Batch-stage via the C++ loader when augmentation is off.

        Decode+resize of the whole dataset happens in one native call over
        a thread pool; Python only parses the (tiny) gt files and scales
        polygons. Returns None to fall back when unavailable/augmented.
        """
        if cfg.use_crop or cfg.use_rotate or cfg.use_random_scale:
            return None
        try:
            from tensorflow_ocr_tpu.data.native_loader import (
                NativeBatchLoader,
                native_available,
            )

            if not native_available():
                return None
            loader = NativeBatchLoader(num_threads=max(2, cfg.num_workers))
        except Exception:
            return None
        from tensorflow_ocr_tpu.ops import geometry as G

        size = cfg.input_size
        imgs, ok, src_hw = loader.load_batch(list(files), size, size)
        loader.close()
        samples = []
        for i, fn in enumerate(files):
            if not ok[i]:
                continue
            txt = icdar.gt_path_for_image(fn)
            import os

            if not os.path.exists(txt):
                continue
            polys, tags = icdar.load_annotation(txt)
            h, w = int(src_hw[i, 0]), int(src_hw[i, 1])
            polys, tags = G.check_and_validate_polys(polys, tags, (h, w))
            if polys.shape[0] == 0:
                continue
            polys = polys.copy()
            polys[:, :, 0] *= size / float(w)
            polys[:, :, 1] *= size / float(h)
            padded, ptags, pvalid = icdar._pad_polys(polys, tags, cfg.max_polys)
            if want_east:
                shrunk, rects, angles = icdar.east_poly_geometry(padded)
            else:
                shrunk = np.zeros_like(padded)
                rects = np.zeros_like(padded)
                angles = np.zeros((cfg.max_polys,), np.float32)
            samples.append(
                icdar.Sample(
                    image=imgs[i], polys=padded, tags=ptags, valid=pvalid,
                    shrunk=shrunk, rects=rects, angles=angles, fn=fn,
                )
            )
        return samples or None

    def _precompute(self, cfg: DataConfig, stride: int):
        import jax
        import jax.numpy as jnp

        from tensorflow_ocr_tpu.ops import labels as label_ops

        hw = cfg.input_size // stride
        if self.want_east:
            score, geo, mask = label_ops.east_labels_batch(
                jnp.asarray(self.polys), jnp.asarray(self.shrunk),
                jnp.asarray(self.rects), jnp.asarray(self.angles),
                jnp.asarray(self.tags), jnp.asarray(self.valid),
                hw, hw, stride, cfg.min_text_size,
                geometry=cfg.geometry,
            )
            self.labels = {
                "score": np.asarray(score),
                "geo": np.asarray(geo),
                "mask": np.asarray(mask),
            }
        else:
            def one(p, ig, va):
                return label_ops.pixellink_labels_stride(
                    p, ig, va, hw, hw, stride, cfg.min_text_size
                )
            s, l, m = jax.vmap(one)(
                jnp.asarray(self.polys), jnp.asarray(self.tags),
                jnp.asarray(self.valid),
            )
            self.labels = {
                "score": np.asarray(s)[..., None],
                "link": np.asarray(l),
                "mask": np.asarray(m)[..., None],
            }

    def arrays(self) -> Dict[str, np.ndarray]:
        out = {
            "images": self.images,
            "polys": self.polys,
            "tags": self.tags,
            "valid": self.valid,
        }
        if self.want_east:
            out.update(shrunk=self.shrunk, rects=self.rects, angles=self.angles)
        else:
            n, k = self.polys.shape[:2]
            out.update(
                shrunk=np.zeros((n, k, 4, 2), np.float32),
                rects=np.zeros((n, k, 4, 2), np.float32),
                angles=np.zeros((n, k), np.float32),
            )
        out.update(self.labels)
        return out

    def index_batches(self, batch_size: int, steps: int,
                      rng: np.random.RandomState) -> np.ndarray:
        """(steps, batch_size) int32 shuffled sample indices."""
        need = steps * batch_size
        reps = -(-need // self.n)
        idx = np.concatenate([rng.permutation(self.n) for _ in range(reps)])
        return idx[:need].reshape(steps, batch_size).astype(np.int32)
