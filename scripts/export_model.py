#!/usr/bin/env python
"""Export a trained checkpoint as a portable serving bundle.

Usage:
    python scripts/export_model.py --checkpoint /tmp/ckpt/ \
        --model pixellink_resnet50 --out /tmp/bundle \
        [--batch 8 --size 512 --maps-only --bake-weights]

The bundle (program.bin StableHLO + meta.json) is loadable without this
repo's training stack via jax.export.deserialize; see
tensorflow_ocr_tpu/export.py for the contract. EMA weights are used,
matching the reference's inference restore (test.py:149-150), and the
decode operating point is the checkpoint-calibrated one when present.
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--model", default="pixellink_resnet50")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512,
                    help="square input size (must be a multiple of 32)")
    ap.add_argument("--maps-only", action="store_true",
                    help="export raw probability maps instead of the "
                         "decoded boxes")
    ap.add_argument("--bake-weights", action="store_true",
                    help="capture weights as program constants (one-file "
                         "artifact) instead of the external-Orbax contract")
    ap.add_argument("--platforms", default="cpu,tpu")
    args = ap.parse_args()

    from tensorflow_ocr_tpu.config import Config
    from tensorflow_ocr_tpu.export import save_serving_bundle
    from tensorflow_ocr_tpu.infer import Predictor

    cfg = Config()
    cfg.model.name = args.model
    cfg.infer.checkpoint_path = args.checkpoint
    pred = Predictor(cfg)
    out = save_serving_bundle(
        args.out, pred, args.batch, args.size, args.size,
        with_decode=not args.maps_only, bake_weights=args.bake_weights,
        platforms=tuple(p.strip() for p in args.platforms.split(",") if p))
    print(f"wrote serving bundle to {out} "
          f"(model={args.model}, {args.batch}x{args.size}x{args.size}, "
          f"calibrated={pred.calibrated})")


if __name__ == "__main__":
    main()
