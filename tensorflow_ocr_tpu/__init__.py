"""tensorflow_ocr_tpu — TPU-native scene-text detection framework.

A from-scratch JAX/Flax/Pallas rebuild of the capability surface of
BowieHsu/tensorflow_ocr (a TF1.4 PixelLink/EAST scene-text detector):

- ``ops``      — geometry, rasterization, label generation, losses, decode
                 (all jittable; the reference's per-pixel Python loops are
                 replaced by vectorized on-device kernels).
- ``models``   — Flax backbones (VGG-16, ResNet-v1 50/101/152/200) and
                 detection heads (PixelLink pixel+link, EAST score+RBOX).
- ``data``     — ICDAR-2015 loader, augmentation, and prefetching pipeline.
- ``parallel`` — mesh construction + shard_map data-parallel train steps.
- ``train``    — optax optimizers, EMA, Orbax checkpointing, trainer loop.
- ``eval``     — polygon-IoU box matching and streaming P/R/F metrics.
- ``utils``    — image resize, box ordering, result writers, profiling.

Reference parity notes are cited as ``/root/reference/<file>:<line>`` in
docstrings throughout.
"""

__version__ = "0.1.0"
