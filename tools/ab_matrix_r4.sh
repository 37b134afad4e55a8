#!/bin/bash
# Round-4 on-chip A/B matrix for the queued train-path optimizations.
# Pinned methodology: tools/train_bench.py, b=1, 1024x1024, G=24, 10-step window.
cd "$(dirname "$0")/.."
LOG=${1:-/root/repo/ab_r4.log}
run() {
  echo "=== $* ===" >> "$LOG"
  timeout 1500 env "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
: > "$LOG"
run python tools/train_bench.py
run GLASS_TPU_MAXPOOL_VJP=sas python tools/train_bench.py
run python tools/train_bench.py --opts TPU.MATCH_BACKEND flat
run python tools/train_bench.py --opts TPU.MATCH_BACKEND tiled
run python tools/train_bench.py --opts TPU.RPN_SAMPLER pool
run python tools/train_bench.py --opts TPU.MATCH_BACKEND tiled TPU.RPN_SAMPLER pool
run python tools/train_bench.py --gts 100
run python tools/train_bench.py --gts 100 --opts TPU.MATCH_BACKEND tiled TPU.RPN_SAMPLER pool
echo "ALL DONE" >> "$LOG"
