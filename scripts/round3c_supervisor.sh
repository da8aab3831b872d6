#!/bin/bash
# Round-3 pass-2 supervisor: waits for the pass-1 pipeline (v3 480k + MCL
# matrix) to exit, then re-runs round3b_pipeline.sh — markers skip everything
# that succeeded, so only the faces stages (OOM-fixed: bs 8 + accum 4) and
# any other failures re-run — and finally measures the bench addendum rows
# that need an idle chip: cached vs uncached train step and bf16-weight DDIM.
set -u
cd /root/repo

if [ -f /tmp/r3b_pipeline.pid ]; then
  while kill -0 "$(cat /tmp/r3b_pipeline.pid)" 2>/dev/null; do sleep 120; done
fi

bash scripts/round3b_pipeline.sh >> runs_r3b_pipeline2.out 2>&1

python scripts/bench_sweep.py \
  --out demo_artifacts/round3/bench_addendum.csv \
  --train_batches 128 --cached_variants --fused "" \
  --ddim "200:128:bf16p,50:1024:bf16p,200:128" \
  >> runs_r3b_pipeline2.out 2>&1

echo "[supervisor] done $(date -u +%H:%M:%S)" >> runs_r3b_pipeline2.out
