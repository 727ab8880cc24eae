#!/usr/bin/env python
"""Capture and summarize a device profile of the train step.

Usage: python scripts/profile_train.py [--batch 32] [--steps 4]
Writes the raw trace under /tmp/ocr_profile and prints the per-op-type
device time breakdown (the workflow that identified BN reductions as the
step's dominant cost).
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import collections
import glob
import gzip
import json
import re
import sys


def main(batch=32, steps=4, freeze_bn=False):
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
    cfg.model.name = "pixellink_resnet50"
    cfg.loss.name = "ohem"
    cfg.data.training_data_path = data_dir
    cfg.data.input_size = 512
    cfg.data.batch_size = batch
    cfg.data.max_polys = 16
    cfg.model.freeze_bn = freeze_bn
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
    state, m = multi(state, ds_dev,
                     jax.device_put(ds.index_batches(batch, steps, rng), idx_sh))
    float(m["total_loss"])

    jax.profiler.start_trace("/tmp/ocr_profile")
    state, m = multi(state, ds_dev,
                     jax.device_put(ds.index_batches(batch, steps, rng), idx_sh))
    float(m["total_loss"])
    jax.profiler.stop_trace()

    tr_file = sorted(
        glob.glob("/tmp/ocr_profile/**/*.trace.json.gz", recursive=True)
    )[-1]
    with gzip.open(tr_file) as f:
        data = json.load(f)
    events = data["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            name = e.get("name", "")
            if name == "0" or name.startswith(("jit_", "while")):
                continue
            agg[re.sub(r"[.\d]+$", "", name)] += e.get("dur", 0)
    total = sum(agg.values())
    print(f"device: {total / 1e3:.1f} ms / {steps} steps "
          f"= {total / steps / 1e3:.1f} ms/step (batch {batch})")
    for name, d in agg.most_common(20):
        print(f"{d / 1e3:8.2f} ms ({100 * d / total:4.1f}%)  {name}")


if __name__ == "__main__":
    kw = {}
    if "--batch" in sys.argv:
        kw["batch"] = int(sys.argv[sys.argv.index("--batch") + 1])
    if "--steps" in sys.argv:
        kw["steps"] = int(sys.argv[sys.argv.index("--steps") + 1])
    if "--freeze-bn" in sys.argv:
        kw["freeze_bn"] = True
    main(**kw)
