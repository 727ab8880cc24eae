#!/usr/bin/env python
"""Fast A/B harness: time the multi-step train program for one config.

Usage:
  python scripts/step_bench.py [--batch 32] [--scan 16] [--model NAME]
                               [--freeze-bn] [--dispatches 3]
Env:
  XLA_FLAGS extras are honored (set before launch; requires fresh process).

Prints ms/step and images/sec/chip for the steady-state dispatch.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--scan", type=int, default=16)
    ap.add_argument("--model", default="pixellink_resnet50")
    ap.add_argument("--loss", default="ohem")
    ap.add_argument("--freeze-bn", action="store_true")
    ap.add_argument("--dispatches", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tensorflow_ocr_tpu.config import Config
    from tensorflow_ocr_tpu.data.device_cache import DeviceDataset
    from tensorflow_ocr_tpu.data.icdar import make_synthetic_dataset, get_images
    from tensorflow_ocr_tpu.parallel.mesh import make_mesh
    from tensorflow_ocr_tpu.train import trainer as T

    data_dir = "/tmp/ocr_bench_data"
    if len(get_images(data_dir)) < 8:
        make_synthetic_dataset(data_dir, 16, (720, 1280))
    cfg = Config()
    cfg.model.name = args.model
    cfg.loss.name = args.loss
    cfg.model.freeze_bn = args.freeze_bn
    cfg.data.training_data_path = data_dir
    cfg.data.input_size = 512
    cfg.data.batch_size = args.batch
    cfg.data.max_polys = 16
    cfg.train.donate_state = True
    mesh = make_mesh()
    ds = DeviceDataset(cfg.data, precompute_labels=True)
    rep = NamedSharding(mesh, P())
    ds_dev = {k: jax.device_put(v, rep) for k, v in ds.arrays().items()}
    idx_sh = NamedSharding(mesh, P(None, "data"))
    tr = T.Trainer(cfg, mesh)
    tr.setup({k: ds.arrays()[k][:1] for k in ("images", "polys", "tags", "valid")})
    multi = T.make_multi_train_step(
        tr.model, tr.tx, cfg, mesh, extra_keys=tuple(ds.labels.keys())
    )
    rng = np.random.RandomState(0)
    state = tr.state

    def dispatch(state):
        idx = ds.index_batches(args.batch, args.scan, rng)
        return multi(state, ds_dev, jax.device_put(idx, idx_sh))

    t0 = time.time()
    state, m = dispatch(state)
    loss0 = float(m["total_loss"])
    print(f"compile+first: {time.time() - t0:.1f}s loss={loss0:.3f}")
    times = []
    for _ in range(args.dispatches):
        t0 = time.time()
        state, m = dispatch(state)
        float(m["total_loss"])  # hard sync
        times.append(time.time() - t0)
    dt = min(times)
    ms_step = dt / args.scan * 1e3
    print(
        f"batch={args.batch} scan={args.scan} model={args.model} "
        f"freeze_bn={args.freeze_bn}: {ms_step:.2f} ms/step, "
        f"{args.batch / (ms_step / 1e3):.1f} img/s/chip"
    )


if __name__ == "__main__":
    main()
