#!/bin/bash
# Quality re-baseline: every model family on the v2 hard scenes at the
# fair budget (64 train scenes seed 0 / 16 disjoint val scenes seed 1,
# 2500 steps, 1000-step easy-scene pretrain warm start), plus the
# 2s-model recipe on the v1 scenes (comparability with the round-2
# number). Appends all records to the JSON artifact (QUALITY_r0N.json).
# Serial on purpose: only one process may own the TPU.
set -x
OUT=${1:-QUALITY_r03.json}

python scripts/holdout_eval.py --scenes v2 --steps 2500 --train-images 64 \
    --pretrain-steps 1000 --model pixellink_resnet50 \
    --sweep-thresholds --json "$OUT"
python scripts/holdout_eval.py --scenes v2 --steps 2500 --train-images 64 \
    --pretrain-steps 1000 --model east_resnet50 \
    --sweep-thresholds --json "$OUT"
python scripts/holdout_eval.py --scenes v2 --steps 2000 --train-images 64 \
    --model link8_resnet50 --json "$OUT"
python scripts/holdout_eval.py --scenes v2 --steps 2500 --train-images 64 \
    --pretrain-steps 1000 --model pixellink2s_vgg16 \
    --sweep-thresholds --json "$OUT"

# 2s quality on the v1 scenes (round-2 comparison point: F 0.415)
python scripts/holdout_eval.py --steps 2500 --train-images 64 \
    --pretrain-steps 1000 --model pixellink2s_vgg16 \
    --sweep-thresholds --json "$OUT"

# EAST improved recipe (QUALITY_r03.json last east record: F 0.538/0.573):
# augmentation underfits at the fair budget, so it gets 2x the schedule.
python scripts/holdout_eval.py --scenes v2 --steps 5000 --train-images 64 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model east_resnet50 --json "$OUT"
