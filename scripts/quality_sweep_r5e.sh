#!/bin/bash
# Round-5 part E: photo-tier generalization levers. Part B measured the
# flagship at val F 0.338 default (train F 0.59 -> a generalization gap,
# not an optimization one) with only 4 real train backgrounds
# (_photo_sources). Two arms against that gap, identical budget to part B
# (5000 steps, batch 8, pretrain 1000, device augment, sweep):
#   arm 1: 4x train images, pure photo backgrounds (data scaling)
#   arm 2: 4x train images, half v2 synthetic + half photo (domain
#          randomization -- text structure over backdrop statistics)
# Val is pure photo:val (4 UNSEEN real backgrounds) in both arms, so the
# number stays a real-data-transfer proxy. 2s flagship gets the winning
# arm afterwards.
# Serial on purpose: only one process may own the TPU.
set -x
COMMON="--steps 5000 --train-images 256 --pretrain-steps 1000 --augment \
  --sweep-thresholds --json QUALITY_r05.json"

python scripts/holdout_eval.py --scenes photo $COMMON \
  --model pixellink_resnet50 \
  --note "photo-tier data scaling: 4x train images (256), pure photo backgrounds"

python scripts/holdout_eval.py --scenes photo_mix $COMMON \
  --model pixellink_resnet50 \
  --note "photo-tier domain randomization: 128 v2 + 128 photo train images"
