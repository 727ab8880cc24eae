#!/bin/bash
# Resume of the part-F queue: arm 3 died on a transient tunnel outage
# (remote_compile body closed, /tmp/r5f.log:740-754) while arms 1/2/4 ran.
# Waits for the original queue shell to release the TPU, re-runs arm 3,
# then runs the part-G (photo2) queue. Serial: one TPU owner at a time.
set -x
OUT=${1:-QUALITY_r05.json}
WAIT_PID=${2:-}

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

python scripts/holdout_eval.py --scenes v2 --steps 10000 --train-images 256 \
    --pretrain-steps 1000 --augment --sweep-thresholds \
    --model east_vgg16 --json "$OUT" \
    --note "EAST full combination: VGG backbone + 2x schedule + 256 train images"

bash scripts/quality_sweep_r5g.sh "$OUT"
