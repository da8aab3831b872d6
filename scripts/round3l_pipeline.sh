#!/bin/bash
# Round-3 chip pipeline, pass 9 (l): leftover-time extras after the pass-8
# queue (round3k -> exec round3i: MCL lambda grid + faces chain) finishes.
# Every stage is wall-clock gated against HARD_STOP so the driver's
# end-of-round bench.py run gets an idle chip.
#   1. reasoning_rep_long    -> 3x training budget on the v4 trained reps
#                               (the 1000-step number, 0.484, was still
#                               climbing 0.23 -> 0.48)
#   2. reasoning_onehot_long -> equal-budget oracle for a fair pair
#   3. bench_final_preview   -> one last bench.py line for BENCH_NOTES
set -u
cd /root/repo

HARD_STOP=1787172000   # 2026-08-19 20:40 UTC (round ends ~20:56)

# wait for the pass-8 pipeline script to exit, then for any straggler job
while kill -0 "$(cat /tmp/r3k.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
while ps -eo pid,args | grep -E "python (main_val\.py|bench\.py|scripts/(celeba|generate|run_mcl|eval|abstract|udr)_)" \
      | grep -v grep >/dev/null; do sleep 30; done

MARK=runs_r3l/markers
LOGS=runs_r3l/logs
ART=demo_artifacts/round3
mkdir -p "$MARK" "$LOGS" "$ART"

# stage NAME MIN_MINUTES cmd... — skip unless at least MIN_MINUTES remain
stage() {
  local name=$1 need_min=$2; shift 2
  if [ -f "$MARK/$name.done" ]; then echo "[pipeline] $name: done, skip"; return 0; fi
  local left=$(( (HARD_STOP - $(date +%s)) / 60 ))
  if [ "$left" -lt "$need_min" ]; then
    echo "[pipeline] $name: SKIP (${left}min left < ${need_min}min needed)"; return 0
  fi
  echo "[pipeline] $name: start $(date -u +%H:%M:%S) (${left}min left)"
  timeout $(( need_min * 60 + 300 )) "$@" >"$LOGS/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$MARK/$name.done"; echo "[pipeline] $name: OK"
  else echo "[pipeline] $name: FAILED rc=$rc (log: $LOGS/$name.log)"; fi
  return 0
}

V4LDM=$(ls -td runs_full/*v4ld*/ 2>/dev/null | head -1 | sed 's:/$::')
V4CFG=configs/demo/synthetic-shapes-v4-full-encdiff.yaml
if [ -n "$V4LDM" ] && [ -d "$V4LDM/checkpoints" ]; then
  BEST=$(ls -d "$V4LDM"/checkpoints/best_dci_* 2>/dev/null | sort | tail -1)
  [ -z "$BEST" ] && BEST="$V4LDM/checkpoints/last"
  stage reasoning_rep_long 45 python scripts/abstract_reasoning_eval.py \
    --dataset synthetic_shapes_full -b "$V4CFG" -r "$BEST" \
    --pgm_type easy_mixed --num_iterations 30 \
    --training_steps_per_iteration 100 --batch_size 32 \
    --output_dir "$ART/v4_reasoning_rep_long"
fi
stage reasoning_onehot_long 40 python scripts/abstract_reasoning_eval.py \
  --dataset synthetic_shapes_full --embedding onehot \
  --pgm_type easy_mixed --num_iterations 30 \
  --training_steps_per_iteration 100 --batch_size 32 \
  --output_dir "$ART/v4_reasoning_onehot_long"

bench_preview() {
  python bench.py | tail -1 > "$ART/bench_r3_final_preview.json" \
    && cat "$ART/bench_r3_final_preview.json"
}
stage bench_final_preview 15 bench_preview

echo "[pipeline] pass-9 done $(date -u +%H:%M:%S)"
