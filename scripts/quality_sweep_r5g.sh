#!/bin/bash
# Round-5 quality queue, part G: the expanded photo2 background tier
# (NEXT.md item 4 — "the honest fix is more real imagery"). photo2 adds
# real photographic textures from dm_control/gymnasium assets (~2x
# sources per split, still split-disjoint; data/icdar._photo_sources).
# Arms compare against the part-E winners at identical budgets:
#   1. pixellink2s_vgg16 photo2-256      (vs part-E arm 3 on photo: val F
#      0.634 default / 0.724 calibrated / 0.756 swept)
#   2. east_vgg16 photo2-256             (EAST on the real-data proxy —
#      NEXT.md item 6's next lever, never measured on any photo tier)
# Serial on purpose: only one process may own the TPU.
set -x
OUT=${1:-QUALITY_r05.json}

python scripts/holdout_eval.py --scenes photo2 --steps 5000 --train-images 256 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model pixellink2s_vgg16 --json "$OUT" \
    --note "photo2 expanded-background tier: flagship at the part-E winning budget"
python scripts/holdout_eval.py --scenes photo2 --steps 5000 --train-images 256 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model east_vgg16 --json "$OUT" \
    --note "photo2 tier: EAST on the real-data proxy (NEXT item 6 lever)"
