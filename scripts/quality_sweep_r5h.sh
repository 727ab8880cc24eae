#!/bin/bash
# Round-5 quality queue, part H: the 2x-schedule lever at the photo2
# (expanded real-background) tier. Part F arm 4 measured 2x schedule as
# the winning photo-tier lever for the flagship (0.756 -> 0.769 swept,
# and default == swept); part G measures the photo2 tier at the 1x
# budget. H completes the grid:
#   1. pixellink2s_vgg16 photo2-256 @ 2x steps (headline real-data proxy)
#   2. east_vgg16 photo2-256 @ 2x steps       (EAST winning schedule on
#      the real-data proxy)
# Serial on purpose: only one process may own the TPU. Each arm is
# gated on a wall-clock deadline (OCR_H_DEADLINE, epoch seconds) so the
# queue never holds the TPU into the driver's round-end bench window.
set -x
OUT=${1:-QUALITY_r05.json}
DEADLINE=${OCR_H_DEADLINE:-0}

start_ok() {
  [ "$DEADLINE" = 0 ] && return 0
  [ "$(date +%s)" -lt "$DEADLINE" ]
}

start_ok && python scripts/holdout_eval.py --scenes photo2 --steps 10000 \
    --train-images 256 --pretrain-steps 1000 --augment --sweep-thresholds \
    --model pixellink2s_vgg16 --json "$OUT" \
    --note "photo2 tier, 2x schedule: flagship headline real-data proxy"

start_ok && python scripts/holdout_eval.py --scenes photo2 --steps 10000 \
    --train-images 256 --pretrain-steps 1000 --augment --sweep-thresholds \
    --model east_vgg16 --json "$OUT" \
    --note "photo2 tier, 2x schedule: EAST on the real-data proxy"

exit 0
