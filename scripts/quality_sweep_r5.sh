#!/bin/bash
# Round-5 quality queue (VERDICT r4 items 2, 4, 9): the round-4 augmented
# long schedule (5000 steps + 1000-step easy-scene pretrain, device
# augmentation, v2 scenes, 64 train / 16 disjoint val) re-run with
#  - checkpoint-time threshold calibration recorded per row
#    (calibrated_thresholds + val_at_calibrated — the Predictor default)
#  - the 2s quality flagship under the same augmented recipe (item 9:
#    round 4 assumed "rerun not needed"; measure it)
#  - EAST scored under BOTH geometries (QUAD vs RBOX, identical
#    seeds/budgets — item 4's table)
# Serial on purpose: only one process may own the TPU.
set -x
OUT=${1:-QUALITY_r05.json}

python scripts/holdout_eval.py --scenes v2 --steps 5000 --train-images 64 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model pixellink_resnet50 --json "$OUT"
python scripts/holdout_eval.py --scenes v2 --steps 5000 --train-images 64 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model pixellink2s_vgg16 --json "$OUT"
python scripts/holdout_eval.py --scenes v2 --steps 5000 --train-images 64 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model east_resnet50 --json "$OUT"
python scripts/holdout_eval.py --scenes v2 --steps 5000 --train-images 64 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model east_resnet50 --geometry QUAD --json "$OUT"
python scripts/holdout_eval.py --scenes v2 --steps 5000 --train-images 64 \
    --augment --sweep-thresholds \
    --model link8_resnet50 --json "$OUT"
