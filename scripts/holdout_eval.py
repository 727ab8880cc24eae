#!/usr/bin/env python
"""Held-out evaluation on hard synthetic scenes.

Round-1 quality numbers were measured on the training images themselves
(VERDICT.md "What's weak" #6). This script closes that hole: it renders
two DISJOINT hard synthetic sets (textured backgrounds, striped
text-like instances, non-text distractors, ignore regions; see
data/icdar.make_synthetic_dataset(hard=True)), trains on one, and
reports P/R/F on the other with EMA weights — images the model has
never seen.

Usage: python scripts/holdout_eval.py [--steps 1500]
       [--model pixellink_resnet50] [--train-images 32] [--val-images 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--model", default="pixellink_resnet50")
    ap.add_argument("--train-images", type=int, default=32)
    ap.add_argument("--val-images", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--loss", default=None,
                    help="override the default family loss (ohem for "
                         "pixel/link heads, east for EAST) — e.g. "
                         "'focal' to validate the BASELINE focal-EAST "
                         "config, 'dice'")
    ap.add_argument("--input-size", type=int, default=512,
                    help="train/eval square size (multiple of 32); the "
                         "BASELINE heavy-aug focal config runs 768")
    ap.add_argument("--pretrain-steps", type=int, default=0,
                    help="first train this many steps on an EASY synthetic "
                         "set and warm-start the hard training from that "
                         "checkpoint (validates the reference's "
                         "pretrained->fine-tune workflow end to end)")
    ap.add_argument("--freeze-bn", action="store_true",
                    help="freeze BN statistics during the hard training "
                         "(the documented fine-tune recipe; pairs with "
                         "--pretrain-steps)")
    ap.add_argument("--augment", action="store_true",
                    help="train with crop/rotate/scale augmentation "
                         "applied ON DEVICE inside the scan loop "
                         "(data/device_augment.py) — same recipe the "
                         "reference runs on host, at device-cache speed")
    ap.add_argument("--host-augment", action="store_true",
                    help="force the host PrefetchLoader augmentation "
                         "path (the reference-fidelity pipeline; ~30x "
                         "slower than --augment through this runtime)")
    ap.add_argument("--min-size", type=int, default=None,
                    help="override infer.min_component_size (decode "
                         "keeps components larger than this many "
                         "stride-resolution pixels)")
    ap.add_argument("--sweep-thresholds", action="store_true",
                    help="after training, sweep decode (pixel, link) "
                         "thresholds on the held-out set (single compile: "
                         "thresholds are traced args) and report the best "
                         "operating point")
    ap.add_argument("--geometry", default="RBOX", choices=["RBOX", "QUAD"],
                    help="EAST head geometry (reference datasets/icdar.py"
                         ":29-30 declares QUAD but never implements it; "
                         "here both are real end to end)")
    ap.add_argument("--scenes", default="v1",
                    choices=["v1", "v2", "photo", "photo_mix", "photo2"],
                    help="hard-scene generation tier: v1 (round-2 set; "
                         "saturated at F~0.67), v2 (perspective warp, "
                         "curved baselines, dense crowding, extreme "
                         "scales), photo (v2 geometry composited over "
                         "real package photographs, disjoint train/val "
                         "backgrounds — the real-data proxy), "
                         "photo_mix (train on half v2 + half photo:train "
                         "— domain randomization against the 4-background "
                         "train set; val stays pure photo:val), or "
                         "photo2 (photo tier with the expanded real-"
                         "texture background sets — ~2x sources per "
                         "split, still split-disjoint)")
    ap.add_argument("--note", default=None,
                    help="free-text annotation stored in the JSON record "
                         "(e.g. which A/B arm or recalibration this row is)")
    ap.add_argument("--json", default=None, metavar="OUT",
                    help="write a machine-readable result record (model, "
                         "steps, recipe, train/val P/R/F, thresholds) to "
                         "this path; appends to the file's 'runs' list if "
                         "it already exists (so one QUALITY_r*.json can "
                         "collect all families)")
    args = ap.parse_args()

    from tensorflow_ocr_tpu.config import Config
    from tensorflow_ocr_tpu.data.icdar import make_synthetic_dataset
    from tensorflow_ocr_tpu.ops.losses import effective_loss_compute_dtype
    from tensorflow_ocr_tpu.parallel.mesh import make_mesh
    from tensorflow_ocr_tpu.train import trainer as T
    from tensorflow_ocr_tpu.train.eval_hook import EvalDuringTraining

    hard = "v2" if args.scenes == "v2" else True
    hard_val = hard
    if args.scenes.startswith("photo"):
        # disjoint real-photo background sets per split: generalization to
        # unseen real imagery, not background memorization
        tier = "photo2" if args.scenes == "photo2" else "photo"
        hard, hard_val = f"{tier}:train", f"{tier}:val"
    suffix = "" if args.scenes == "v1" else f"_{args.scenes}"
    if args.input_size != 512:
        suffix += f"_{args.input_size}"
    size = args.input_size
    train_dir = f"/tmp/holdout_train{suffix}"
    val_dir = f"/tmp/holdout_val{suffix}"
    if args.scenes == "photo_mix":
        # domain randomization: only 4 real train backgrounds exist
        # (_photo_sources), so a pure-photo train set memorizes their
        # textures. Mixing in v2 synthetic backgrounds forces the model
        # to key on text structure rather than backdrop statistics.
        half = args.train_images // 2
        make_synthetic_dataset(train_dir, half, (size, size),
                               seed=0, hard="v2")
        make_synthetic_dataset(train_dir, args.train_images - half,
                               (size, size), seed=2, hard="photo:train",
                               start_index=half)
    else:
        make_synthetic_dataset(train_dir, args.train_images, (size, size),
                               seed=0, hard=hard)
    make_synthetic_dataset(val_dir, args.val_images, (size, size),
                           seed=1, hard=hard_val)

    def base_cfg():
        cfg = Config()
        cfg.model.name = args.model
        cfg.loss.name = args.loss or (
            "east" if args.model.startswith("east") else "ohem")
        cfg.data.input_size = size
        cfg.data.geometry = args.geometry
        cfg.data.batch_size = args.batch
        cfg.data.max_polys = 16
        cfg.data.min_text_size = 5
        cfg.train.scan_steps = 25
        cfg.train.learning_rate = args.lr
        cfg.train.save_checkpoint_steps = 0
        if args.min_size is not None:
            cfg.infer.min_component_size = args.min_size
        return cfg

    mesh = make_mesh()

    pretrain_ckpt = None
    if args.pretrain_steps > 0:
        # per-size dirs: the easy set must be rendered at the SAME
        # resolution the run trains at, or the warm start validates a
        # different (upscaled) regime than claimed
        psuf = f"_{size}" if size != 512 else ""
        easy_dir = f"/tmp/holdout_pretrain{psuf}"
        pretrain_ckpt = f"/tmp/holdout_pretrain_ckpt{psuf}/"
        make_synthetic_dataset(easy_dir, args.train_images, (size, size),
                               seed=2, hard=False)
        pcfg = base_cfg()
        pcfg.data.training_data_path = easy_dir
        pcfg.train.max_steps = args.pretrain_steps
        pcfg.train.checkpoint_path = pretrain_ckpt
        ptr = T.Trainer(pcfg, mesh)
        t0 = time.time()
        pm = ptr.run_device_cached()
        print(f"pretrained {args.pretrain_steps} steps on easy scenes in "
              f"{time.time() - t0:.1f}s; loss {pm.get('total_loss'):.3f}")
        T.save_checkpoint(pretrain_ckpt, ptr.state)

    cfg = base_cfg()
    cfg.data.training_data_path = train_dir
    cfg.train.max_steps = args.steps
    cfg.model.freeze_bn = args.freeze_bn
    if pretrain_ckpt:
        cfg.train.pretrained_model_path = pretrain_ckpt

    if args.augment or args.host_augment:
        cfg.data.use_crop = True
        cfg.data.use_rotate = True
        cfg.data.use_random_scale = True
    tr = T.Trainer(cfg, mesh)
    t0 = time.time()
    if args.host_augment:
        from tensorflow_ocr_tpu.data.pipeline import PrefetchLoader

        want_east = cfg.model.name.startswith("east")
        loader = PrefetchLoader(cfg.data, want_east=want_east,
                                seed=cfg.train.seed)
        first = next(loader)
        tr.setup(first)

        def batches():
            yield first
            while True:
                yield next(loader)

        try:
            metrics = tr.run(batches(), max_steps=args.steps)
        finally:
            loader.stop()
    else:
        # device-cached scan loop; with --augment the scan body applies
        # per-image similarity transforms + in-step label rasterization
        # (run_device_cached reads the cfg.data.use_* flags)
        metrics = tr.run_device_cached()
    dt = time.time() - t0
    print(f"trained {args.steps} steps in {dt:.1f}s "
          f"({args.steps * args.batch / dt:.0f} img/s); {metrics}")

    val_hook = EvalDuringTraining(cfg, val_dir,
                                  max_images=args.val_images)
    train_hook = EvalDuringTraining(cfg, train_dir, max_images=16)
    val = val_hook(tr.model, tr.state, use_ema=True)
    train = train_hook(tr.model, tr.state, use_ema=True)
    print(f"VAL  (held out, {args.val_images} imgs): "
          f"P={val.get('precision', 0):.3f} R={val.get('recall', 0):.3f} "
          f"F={val.get('fmean', 0):.3f}")
    print(f"TRAIN (seen, 16 imgs):                  "
          f"P={train.get('precision', 0):.3f} "
          f"R={train.get('recall', 0):.3f} F={train.get('fmean', 0):.3f}")

    # Checkpoint-time threshold calibration (train/calibrate.py): sweep on
    # an 8-image TRAIN slice (never val), then score val at that operating
    # point — the number a Predictor restoring this checkpoint would get
    # by default. Closes the static-threshold drift (QUALITY_r04 default
    # F 0.70 vs swept 0.87 under augmentation).
    from tensorflow_ocr_tpu.train.calibrate import calibrate_thresholds

    calib = calibrate_thresholds(tr.model, tr.state, cfg, train_dir,
                                 max_images=8)
    val_cal = val
    if calib:
        kw = ({"score_thresh": calib["score"], "nms_thresh": calib["nms"]}
              if "score" in calib else
              {"pixel_thresh": calib["pixel"], "link_thresh": calib["link"]})
        val_cal = val_hook(tr.model, tr.state, use_ema=True, **kw)
        print(f"CALIBRATED (train-slice sweep) {calib}: "
              f"P={val_cal.get('precision', 0):.3f} "
              f"R={val_cal.get('recall', 0):.3f} "
              f"F={val_cal.get('fmean', 0):.3f}")

    is_east = args.model.startswith("east")
    if is_east:
        best_thresholds = (cfg.infer.score_map_thresh, cfg.infer.nms_thresh)
    else:
        best_thresholds = (cfg.infer.pixel_conf_threshold,
                           cfg.infer.link_conf_threshold)
    best_val = val
    if args.sweep_thresholds and is_east:
        # EAST operating point: device score threshold (traced arg, one
        # compile) x host locality-aware-NMS IoU threshold
        best = (val.get("fmean", 0.0), cfg.infer.score_map_thresh,
                cfg.infer.nms_thresh, val)
        for st in (0.5, 0.6, 0.7, 0.8, 0.9):
            for nt in (0.1, 0.2, 0.3):
                r = val_hook(tr.model, tr.state, use_ema=True,
                             score_thresh=st, nms_thresh=nt)
                f = r.get("fmean", 0.0)
                print(f"  sweep score={st:.1f} nms={nt:.1f}: "
                      f"P={r.get('precision', 0):.3f} "
                      f"R={r.get('recall', 0):.3f} F={f:.3f}")
                if f > best[0]:
                    best = (f, st, nt, r)
        f, st, nt, r = best
        best_thresholds, best_val = (st, nt), r
        print(f"BEST thresholds: score={st} nms={nt} -> "
              f"P={r.get('precision', 0):.3f} R={r.get('recall', 0):.3f} "
              f"F={f:.3f}")
    if args.sweep_thresholds and not is_east:
        best = (val.get("fmean", 0.0),
                cfg.infer.pixel_conf_threshold,
                cfg.infer.link_conf_threshold, val)
        for pt in (0.5, 0.6, 0.7, 0.8, 0.9):
            for lt in (0.5, 0.7, 0.8, 0.9):
                r = val_hook(tr.model, tr.state, use_ema=True,
                             pixel_thresh=pt, link_thresh=lt)
                f = r.get("fmean", 0.0)
                print(f"  sweep pixel={pt:.1f} link={lt:.1f}: "
                      f"P={r.get('precision', 0):.3f} "
                      f"R={r.get('recall', 0):.3f} F={f:.3f}")
                if f > best[0]:
                    best = (f, pt, lt, r)
        f, pt, lt, r = best
        best_thresholds, best_val = (pt, lt), r
        print(f"BEST thresholds: pixel={pt} link={lt} -> "
              f"P={r.get('precision', 0):.3f} R={r.get('recall', 0):.3f} "
              f"F={f:.3f}")

    if args.json:
        import json

        def prf(d):
            return {k: round(float(d.get(k, 0.0)), 4)
                    for k in ("precision", "recall", "fmean")}

        record = {
            "model": args.model,
            "geometry": args.geometry if is_east else None,
            "steps": args.steps,
            "batch": args.batch,
            "lr": args.lr,
            "loss": cfg.loss.name,
            # effective dtype incl. the OCR_LOSS_BF16 env override, via the
            # kernel's own parser so the record can't diverge from the run
            "loss_compute_dtype": effective_loss_compute_dtype(
                getattr(cfg.loss, "compute_dtype", None), cfg.loss.name),
            "input_size": size,
            "recipe": {
                "pretrain_steps": args.pretrain_steps,
                "freeze_bn": args.freeze_bn,
                "augment": args.augment or args.host_augment,
                "augment_path": ("host" if args.host_augment
                                 else "device" if args.augment else None),
                "min_component_size": cfg.infer.min_component_size,
            },
            "data": {
                "train_images": args.train_images,
                "val_images": args.val_images,
                "train_seed": 0,
                "val_seed": 1,
                "scenes": args.scenes,
            },
            # wall-clock img/s (compile + dataset staging included)
            "train_images_per_sec": round(args.steps * args.batch / dt, 1),
            # steady-state img/s, compile excluded (median dispatch of the
            # device-cached scan loop) — comparable to bench.py's number;
            # absent on the host-augment path
            "train_images_per_sec_steady": (
                round(metrics["images_per_sec_steady"], 1)
                if "images_per_sec_steady" in metrics else None),
            "val": prf(val),
            "train": prf(train),
            # train-slice-calibrated operating point + val scored there
            # (what a Predictor restoring this checkpoint serves by default)
            "calibrated_thresholds": calib,
            "val_at_calibrated": prf(val_cal),
            "thresholds": ({"score": best_thresholds[0],
                            "nms": best_thresholds[1]} if is_east else
                           {"pixel": best_thresholds[0],
                            "link": best_thresholds[1]}),
            "val_at_best_thresholds": prf(best_val),
        }
        if args.note:
            record["note"] = args.note
        doc = {"runs": []}
        if os.path.exists(args.json):
            with open(args.json) as f:
                try:
                    doc = json.load(f)
                except Exception:
                    doc = {"runs": []}
            doc.setdefault("runs", [])
        doc["runs"].append(record)
        with open(args.json, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"wrote {args.json} ({len(doc['runs'])} runs)")


if __name__ == "__main__":
    main()
