#!/usr/bin/env python
"""PixelLink trainer entry (slim-pipeline recipe).

Working rebuild of /root/reference/train_pixellink.py — which is broken in
the reference (missing config/util/tf_extended/dataset_factory modules,
SURVEY.md §2.4) but specifies the intended recipe: Momentum optimizer with
a piecewise-constant staircase LR (train_pixellink.py:221-243), VGG-16
PixelLink model, optional EMA, scope-exclusion warm start.

    python train_pixellink.py --training_data_path=... \
        --checkpoint_path=./ohem_logs/ --learning_rate=1e-3
"""

import os
import sys


def main(argv):
    from tensorflow_ocr_tpu.config import Config, parse_flags
    from tensorflow_ocr_tpu.data.pipeline import PrefetchLoader
    from tensorflow_ocr_tpu.parallel.mesh import make_mesh
    from tensorflow_ocr_tpu.train.trainer import Trainer, save_checkpoint

    cfg = Config()
    cfg.model.name = "pixellink_vgg16"
    cfg.loss.name = "ohem"
    cfg.train.optimizer = "momentum"
    cfg = parse_flags(argv, cfg)

    mesh = make_mesh(cfg.train.num_devices)
    cfg.data.batch_size = cfg.data.batch_size * mesh.devices.size
    os.makedirs(cfg.train.checkpoint_path, exist_ok=True)

    loader = PrefetchLoader(cfg.data, seed=cfg.train.seed)
    trainer = Trainer(cfg, mesh)
    first = next(loader)
    trainer.setup(first)

    def batches():
        yield first
        while True:
            yield next(loader)

    try:
        trainer.run(batches(), max_steps=cfg.train.max_steps)
        save_checkpoint(cfg.train.checkpoint_path, trainer.state)
    finally:
        loader.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
