#!/bin/bash
# Round-5 frozen-BN closing attempt (VERDICT r4 item 3): A/B generic XLA
# compiler options against the 587 img/s/chip frozen-BN fine-tune
# baseline via the per-jit compiler_options channel (OCR_XLA_OPTS —
# XLA_FLAGS does not reach the tunneled backend, config.py:161).
# Each arm is a fresh process (options are trace-time) and a fresh
# server-side compile (options change the program fingerprint) — budget
# ~10-30 min per new program on the tunnel.
# Serial on purpose: only one process may own the TPU.
set -x
ARGS="--batch 32 --scan 32 --freeze-bn --dispatches 4"

# arm 0: baseline (program identical to bench.py's frozen recipe)
OCR_LOSS_BF16=1 python scripts/step_bench.py $ARGS

# arm 1: larger scoped VMEM — lets the fusion emitter form bigger
# fusions (deeper epilogues) before spilling; the remaining gap is
# ~30 small unfused elementwise passes (PERF.md §4.4)
OCR_LOSS_BF16=1 OCR_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=65536" \
    python scripts/step_bench.py $ARGS

# arm 2: latency-hiding scheduler off->on (if not already default) —
# overlaps the scan-carry copies with compute
OCR_LOSS_BF16=1 OCR_XLA_OPTS="xla_tpu_enable_latency_hiding_scheduler=true" \
    python scripts/step_bench.py $ARGS
