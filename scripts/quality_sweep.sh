#!/bin/bash
# Round-3 quality re-baseline: every model family on the v2 hard scenes,
# plus the 2s-model recipe runs on the v1 scenes (comparability with the
# round-2 number). Appends all records to QUALITY_r03.json.
# Serial on purpose: only one process may own the TPU.
set -x
OUT=${1:-QUALITY_r03.json}

# flagship + families on the re-armed v2 benchmark
python scripts/holdout_eval.py --scenes v2 --steps 1500 \
    --model pixellink_resnet50 --json "$OUT"
python scripts/holdout_eval.py --scenes v2 --steps 1500 \
    --model east_resnet50 --json "$OUT"
python scripts/holdout_eval.py --scenes v2 --steps 2000 --train-images 64 \
    --model link8_resnet50 --json "$OUT"
python scripts/holdout_eval.py --scenes v2 --steps 2500 --train-images 64 \
    --pretrain-steps 1000 --model pixellink2s_vgg16 \
    --sweep-thresholds --json "$OUT"

# 2s quality push on the v1 scenes (round-2 comparison point: F 0.415)
python scripts/holdout_eval.py --steps 2500 --train-images 64 \
    --pretrain-steps 1000 --model pixellink2s_vgg16 \
    --sweep-thresholds --json "$OUT"
