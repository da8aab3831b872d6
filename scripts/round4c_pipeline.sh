#!/bin/bash
# Round-4 chip pipeline, phase E (after round4b): perf evidence + the
# remaining VERDICT r3 items, wall-clock gated so the driver's end-of-round
# bench gets an idle chip.
#   1. bench_addendum   — DDIM-50/200 at bs 128/256 (the missing small-batch
#                         rows behind the bs=512 "inversion", VERDICT weak
#                         #5) + idle-chip bench.py preview (VERDICT #7)
#   2. reasoning x2     — v4h trained-rep vs onehot oracle, 3x budget
#                         (VERDICT #5: train both arms toward plateau)
#   3. faces chain      — trimmed 256px retrain + swap grid + recon metrics
#                         (VERDICT #8)
#   4. bench_final      — one last idle-chip bench.py line
set -u
cd /root/repo

HARD_STOP=${HARD_STOP:-1787217300}   # 2026-08-20 09:15 UTC

while kill -0 "$(cat /tmp/r4b.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
while ps -eo pid,args | grep -E "python (main_val\.py|bench\.py|scripts/(run_mcl|udr)_)" \
      | grep -v grep >/dev/null; do sleep 30; done

MARK=runs_r4/markers
LOGS=runs_r4/logs
ART=demo_artifacts/round4
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
  timeout $(( need_min * 60 + 600 )) "$@" >"$LOGS/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$MARK/$name.done"; echo "[pipeline] $name: OK"
  else echo "[pipeline] $name: FAILED rc=$rc (log: $LOGS/$name.log)"; fi
  return 0
}

# ---- 1. bench addendum (small-batch DDIM rows + idle preview) --------------
stage bench_addendum 30 python scripts/bench_sweep.py \
  --out "$ART/bench_addendum_r4.csv" \
  --train_batches 128 --fused "" \
  --ddim "50:128,50:256,200:128,200:256"

bench_preview() {
  python bench.py | tail -1 > "$ART/bench_r4_preview.json" \
    && cat "$ART/bench_r4_preview.json"
}
stage bench_preview 20 bench_preview

# ---- 2. abstract reasoning to plateau (rep + oracle, equal budget) ---------
V4H=$(ls -td runs_full/*v4base*/ 2>/dev/null | head -1 | sed 's:/$::')
V4CFG=configs/demo/synthetic-shapes-v4-full-encdiff.yaml
if [ -n "$V4H" ] && [ -d "$V4H/checkpoints" ]; then
  BEST=$(ls -d "$V4H"/checkpoints/best_dci_* 2>/dev/null | sort | tail -1)
  [ -z "$BEST" ] && BEST="$V4H/checkpoints/last"
  stage reasoning_rep_long 50 python scripts/abstract_reasoning_eval.py \
    --dataset synthetic_shapes_full -b "$V4CFG" -r "$BEST" \
    --pgm_type easy_mixed --num_iterations 30 \
    --training_steps_per_iteration 100 --batch_size 32 \
    --output_dir "$ART/reasoning_rep_long"
fi
stage reasoning_onehot_long 45 python scripts/abstract_reasoning_eval.py \
  --dataset synthetic_shapes_full --embedding onehot \
  --pgm_type easy_mixed --num_iterations 30 \
  --training_steps_per_iteration 100 --batch_size 32 \
  --output_dir "$ART/reasoning_onehot_long"

# ---- 3. faces chain (trimmed: 2-epoch retrain, swap grid + recon) ----------
stage faces_vq 60 python main_val.py -b configs/demo/synthetic-faces-vq.yaml \
  -t true --no-test true -l runs_faces -s 23 -n fvq
FVQ=$(ls -td runs_faces/*fvq*/ 2>/dev/null | head -1 | sed 's:/$::')
if [ -n "$FVQ" ] && [ -d "$FVQ/checkpoints/last" ]; then
  stage faces_encdiff 120 python main_val.py -t true --no-test true \
    -l runs_faces -n fld-encdiff \
    -b configs/demo/synthetic-faces-encdiff.yaml -s 23 --max_epochs 3 \
    "model.params.first_stage_config.params.ckpt_path=$FVQ/checkpoints/last"
  FLD=$(ls -td runs_faces/*encdiff*/ 2>/dev/null | head -1 | sed 's:/$::')
  if [ -n "$FLD" ] && [ -d "$FLD/checkpoints/last" ]; then
    # VERDICT r3 #8: the qualitative + recon evidence the r3 faces run
    # never preserved — TAD/FID/swap via the r3 eval chain (writes the
    # attribute npz itself), plus SSIM/LPIPS/MSE recon metrics (E13)
    stage faces_eval 70 env FACES_EVAL_OUT="$ART/faces" \
      bash scripts/round3_faces_eval.sh
    CKPT=$(ls -d "$FLD"/checkpoints/best_* 2>/dev/null | sort | tail -1)
    [ -z "$CKPT" ] && CKPT="$FLD/checkpoints/last"
    stage faces_recon 30 python scripts/recon_metrics.py \
      -b configs/demo/synthetic-faces-encdiff.yaml \
      -r "$CKPT" --ddim_steps 50 --batches 2 --batch_size 32 \
      --out "$ART/faces_recon.json"
    cp "$FLD"/record/*.csv "$ART/faces_record.csv" 2>/dev/null
  fi
fi

# ---- 4. final bench line ----------------------------------------------------
bench_final() {
  python bench.py | tail -1 > "$ART/bench_r4_final.json" \
    && cat "$ART/bench_r4_final.json"
}
stage bench_final 15 bench_final

echo "[pipeline] phase E complete $(date -u +%H:%M:%S)"
