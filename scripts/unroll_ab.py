#!/usr/bin/env python
"""A/B the lax.scan unroll factor on the frozen-BN fine-tune step.

PERF.md §4.4: the post-fold frozen profile carries ~2.6 ms/step of
scan-carry copies (donation already on). Unrolling the scan body gives
XLA a straight-line region per N steps, which can eliminate the
intermediate carry materializations. One process, one TPU init, one
shared HBM dataset; each arm recompiles only the multi-step program.

Usage: python scripts/unroll_ab.py [--unrolls 1 2 4] [--batch 32]
       [--scan 32] [--freeze-bn] [--bf16-loss]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--unrolls", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--scan", type=int, default=32)
    ap.add_argument("--model", default="pixellink_resnet50")
    ap.add_argument("--freeze-bn", action="store_true")
    ap.add_argument("--bf16-loss", action="store_true")
    ap.add_argument("--dispatches", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tensorflow_ocr_tpu.config import Config
    from tensorflow_ocr_tpu.data.device_cache import DeviceDataset
    from tensorflow_ocr_tpu.data.icdar import (
        make_synthetic_dataset, get_images)
    from tensorflow_ocr_tpu.parallel.mesh import make_mesh
    from tensorflow_ocr_tpu.train import trainer as T

    data_dir = "/tmp/ocr_bench_data"
    if len(get_images(data_dir)) < 8:
        make_synthetic_dataset(data_dir, 16, (720, 1280))
    cfg = Config()
    cfg.model.name = args.model
    cfg.loss.name = "ohem"
    if args.bf16_loss:
        cfg.loss.compute_dtype = "bfloat16"
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
    tr.setup({k: ds.arrays()[k][:1]
              for k in ("images", "polys", "tags", "valid")})
    rng = np.random.RandomState(0)
    # donation consumes the state buffers; keep a host snapshot and
    # re-stage it per arm
    state0_host = jax.device_get(tr.state)

    for unroll in args.unrolls:
        os.environ["OCR_SCAN_UNROLL"] = str(unroll)
        multi = T.make_multi_train_step(
            tr.model, tr.tx, cfg, mesh, extra_keys=tuple(ds.labels.keys())
        )
        # fresh state per arm: donation consumed the previous buffers
        state = jax.device_put(state0_host, rep)

        def dispatch(state):
            idx = ds.index_batches(args.batch, args.scan, rng)
            return multi(state, ds_dev, jax.device_put(idx, idx_sh))

        t0 = time.time()
        state, m = dispatch(state)
        loss0 = float(m["total_loss"])
        compile_s = time.time() - t0
        times = []
        for _ in range(args.dispatches):
            t0 = time.time()
            state, m = dispatch(state)
            float(m["total_loss"])  # hard sync
            times.append(time.time() - t0)
        ms_step = min(times) / args.scan * 1e3
        print(
            f"unroll={unroll} freeze_bn={args.freeze_bn} "
            f"bf16_loss={args.bf16_loss} batch={args.batch} "
            f"scan={args.scan}: {ms_step:.2f} ms/step, "
            f"{args.batch / (ms_step / 1e3):.1f} img/s/chip "
            f"(compile {compile_s:.1f}s, loss {loss0:.3f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
