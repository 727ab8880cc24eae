#!/bin/bash
# Round-5 quality queue, part F: EAST gap (NEXT.md item 6) + photo-tier
# schedule lever. Part C/D measured each EAST lever alone: VGG backbone
# 0.780/0.802 and 2x schedule 0.777/0.805 (vs the 0.66 plateau). Part E
# measured data scaling (4x train images) as the winning photo-tier lever.
# Arms:
#   1. east_vgg16 @ 2x steps            (combine the two winning levers)
#   2. east_vgg16 @ 256 train images    (data lever on the better backbone;
#      the RBOX-regression-wants-denser-supervision hypothesis, NEXT.md 6)
#   3. east_vgg16 @ 2x steps + 256 imgs (full combination)
#   4. pixellink2s_vgg16 photo-256 @ 2x steps (schedule lever at the photo
#      tier: part E fixed data, never schedule)
# Serial on purpose: only one process may own the TPU.
set -x
OUT=${1:-QUALITY_r05.json}

python scripts/holdout_eval.py --scenes v2 --steps 10000 --train-images 64 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model east_vgg16 --json "$OUT" \
    --note "EAST combined lever: VGG backbone + 2x schedule"
python scripts/holdout_eval.py --scenes v2 --steps 5000 --train-images 256 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model east_vgg16 --json "$OUT" \
    --note "EAST data lever: 4x train images (256) on the VGG backbone"
python scripts/holdout_eval.py --scenes v2 --steps 10000 --train-images 256 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model east_vgg16 --json "$OUT" \
    --note "EAST full combination: VGG backbone + 2x schedule + 256 train images"
python scripts/holdout_eval.py --scenes photo --steps 10000 --train-images 256 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model pixellink2s_vgg16 --json "$OUT" \
    --note "photo-tier schedule lever: 2x steps on the winning part-E recipe"
