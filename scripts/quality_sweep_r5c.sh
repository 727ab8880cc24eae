#!/bin/bash
# Round-5 quality queue, part C: close the gaps parts A/B exposed.
#  - flagship re-calibration rerun: row 1 of part A used the old 4-image
#    argmax calibration (val F 0.824 at the chosen point vs 0.861 swept);
#    this rerun (identical training, seeds fixed) records the
#    plateau-centered 8-image calibration
#  - EAST levers beyond thresholds (RBOX plateaued ~0.66 in r4 AND r5):
#    backbone swap to VGG-16 (the VGG families score 0.86-0.94 on this
#    benchmark vs resnet50's 0.73-0.86 - small-data BN hypothesis), and
#    a 2x-schedule resnet50 arm (underfit hypothesis)
# Serial on purpose: only one process may own the TPU.
set -x
OUT=${1:-QUALITY_r05.json}

python scripts/holdout_eval.py --scenes v2 --steps 5000 --train-images 64 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model pixellink_resnet50 --json "$OUT" \
    --note "rerun of the part-A flagship row with plateau-centered 8-image calibration (training identical, seeds fixed)"
python scripts/holdout_eval.py --scenes v2 --steps 5000 --train-images 64 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model east_vgg16 --json "$OUT" \
    --note "EAST backbone lever: VGG-16 basenet (small-data BN hypothesis)"
python scripts/holdout_eval.py --scenes v2 --steps 10000 --train-images 64 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model east_resnet50 --json "$OUT" \
    --note "EAST schedule lever: 2x steps (underfit hypothesis)"
