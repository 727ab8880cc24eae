#!/bin/bash
# Round-5 quality queue, part B: the real-data proxy tier. Train on
# photo-composite scenes (real package photographs as backgrounds), eval
# on a val set whose background photos are DISJOINT from training's —
# the closest measurable stand-in for "train on ICDAR-2015, score F"
# while the container ships no dataset (REAL_DATA.md). Serial on
# purpose: only one process may own the TPU.
set -x
OUT=${1:-QUALITY_r05.json}

python scripts/holdout_eval.py --scenes photo --steps 5000 --train-images 64 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model pixellink_resnet50 --json "$OUT"
python scripts/holdout_eval.py --scenes photo --steps 5000 --train-images 64 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model pixellink2s_vgg16 --json "$OUT"
