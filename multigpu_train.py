#!/usr/bin/env python
"""Data-parallel training entry point.

CLI-compatible rebuild of /root/reference/multigpu_train.py (same public
flags: --input_size --batch_size_per_gpu --num_readers --learning_rate
--max_steps --moving_average_decay --gpu_list --checkpoint_path --restore
--save_checkpoint_steps --save_summary_steps --pretrained_model_path
--training_data_path ...). Device parallelism is a shard_map over the JAX
device mesh instead of tf.split towers; --gpu_list is accepted and ignored.

Example (reference train.sh:1-3 shape):
    python multigpu_train.py --gpu_list=0,1 --input_size=512 \
        --batch_size_per_gpu=14 --checkpoint_path=/tmp/east_resnet_v1_50_rbox/ \
        --training_data_path=/data/ocr/icdar2015/
"""

import os
import sys


def main(argv):
    from tensorflow_ocr_tpu.config import Config, parse_flags
    from tensorflow_ocr_tpu.data.pipeline import PrefetchLoader
    from tensorflow_ocr_tpu.parallel.mesh import make_mesh
    from tensorflow_ocr_tpu.train.trainer import Trainer, save_checkpoint

    argv = list(argv)
    cfg = Config()
    # --preset=N loads a BASELINE.json benchmark configuration first
    for a in list(argv):
        if a.startswith("--preset"):
            from tensorflow_ocr_tpu.configs import baseline_config

            n = int(a.split("=", 1)[1]) if "=" in a else int(
                argv[argv.index(a) + 1]
            )
            cfg = baseline_config(n)
            argv.remove(a)
            break
    cfg = parse_flags(argv, cfg)
    mesh = make_mesh(cfg.train.num_devices)
    n_dev = mesh.devices.size
    # reference semantics: global batch = batch_size_per_gpu * n_devices
    cfg.data.batch_size = cfg.data.batch_size * n_dev

    os.makedirs(cfg.train.checkpoint_path, exist_ok=True)
    want_east = cfg.model.name.startswith("east")

    from tensorflow_ocr_tpu.utils.summary import SummaryWriter

    writer = SummaryWriter(cfg.train.checkpoint_path)

    trainer = Trainer(cfg, mesh, summary_writer=writer)
    if cfg.train.use_device_cache:
        trainer.run_device_cached(max_steps=cfg.train.max_steps)
        save_checkpoint(cfg.train.checkpoint_path, trainer.state)
        trainer._maybe_calibrate()  # operating point for the final ckpt
        return

    loader = PrefetchLoader(cfg.data, want_east=want_east, seed=cfg.train.seed)
    first = next(loader)
    trainer.setup(first)

    def batches():
        yield first
        while True:
            yield next(loader)

    try:
        trainer.run(batches(), max_steps=cfg.train.max_steps)
        save_checkpoint(cfg.train.checkpoint_path, trainer.state)
        trainer._maybe_calibrate()  # operating point for the final ckpt
    finally:
        loader.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
