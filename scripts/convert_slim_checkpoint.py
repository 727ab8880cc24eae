#!/usr/bin/env python
"""Convert a TF-slim ImageNet checkpoint to the .npz warm-start format.

The reference warm-starts from slim checkpoints via
slim.assign_from_checkpoint_fn (/root/reference/multigpu_train.py:149-151,
train.sh). This repo's loader (train/pretrained.py) reads a plain .npz of
{slim_variable_name: tensor}; this script produces it from the original
TF tensor-bundle:

    python scripts/convert_slim_checkpoint.py resnet_v1_50.ckpt \
        resnet_v1_50.npz

Works on any checkpoint readable by tf.train.load_checkpoint (the
`resnet_v1_50.ckpt` / `vgg_16.ckpt` releases from the tf-slim model zoo,
or a checkpoint trained by the reference itself). Optimizer slots, EMA
shadows, and other unmappable variables are carried through — the loader
filters them — unless --mapped-only is given.

Exit status is non-zero if NO variable maps to this repo's backbone trees
(wrong checkpoint family), so automation can fail fast.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert(ckpt_path: str, out_path: str, mapped_only: bool = False) -> int:
    """Returns the number of variables that map into the Flax trees."""
    import numpy as np

    from tensorflow_ocr_tpu.train.pretrained import slim_to_flax_key

    try:
        import tensorflow as tf
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "tensorflow is required to read the TF tensor bundle; run this "
            "script in any environment with TF installed (the output .npz "
            "is then usable everywhere)") from e

    reader = tf.train.load_checkpoint(ckpt_path)
    shape_map = reader.get_variable_to_shape_map()
    tensors = {}
    n_mapped = 0
    for name in sorted(shape_map):
        mapped = slim_to_flax_key(name)
        if mapped is not None:
            n_mapped += 1
        elif mapped_only:
            continue
        tensors[name] = np.asarray(reader.get_tensor(name))
    np.savez(out_path, **tensors)
    print(f"{out_path}: {len(tensors)} tensors written, "
          f"{n_mapped} map into the backbone trees")
    return n_mapped


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt", help="TF checkpoint prefix (e.g. resnet_v1_50.ckpt)")
    ap.add_argument("out", help="output .npz path")
    ap.add_argument("--mapped-only", action="store_true",
                    help="write only variables that map into the Flax trees")
    args = ap.parse_args(argv)
    n = convert(args.ckpt, args.out, args.mapped_only)
    if n == 0:
        print("ERROR: no variable mapped — is this a resnet_v1_*/vgg_16 "
              "slim checkpoint?", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
