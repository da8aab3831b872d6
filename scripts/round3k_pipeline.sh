#!/bin/bash
# Round-3 chip pipeline, pass 8 (k): single serial queue for everything
# after the v4 run (replaces the r3j + r3i pair, whose separate wait
# loops could race at stage gaps):
#   1. bench_ddim50_check   -> validate the new BENCH_DDIM50 row on-chip
#   2. v4_reasoning_rep     -> abstract reasoning over v4 trained reps
#   3. v4_reasoning_onehot  -> onehot oracle upper bound
#   4. udr_*                -> two-seed 27k run + first UDR numbers
#   5. exec round3i         -> faces retrain + TAD/probe-FID/LFW/swap
set -u
cd /root/repo

while ps -eo pid,args | grep -E "python (main_val\.py|bench\.py|scripts/(celeba|generate|run_mcl|eval|abstract)_)" \
      | grep -v grep >/dev/null; do sleep 30; done

MARK=runs_r3j/markers
LOGS=runs_r3j/logs
ART=demo_artifacts/round3
mkdir -p "$MARK" "$LOGS" "$ART"

STALL_S=1800
stage() {
  local name=$1; shift
  if [ -f "$MARK/$name.done" ]; then echo "[pipeline] $name: done, skip"; return 0; fi
  local attempt rc
  for attempt in 1 2 3; do
    echo "[pipeline] $name: start attempt $attempt $(date -u +%H:%M:%S)"
    touch "$LOGS/$name.log"
    "$@" >>"$LOGS/$name.log" 2>&1 &
    local pid=$!
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      local age=$(( $(date +%s) - $(stat -c %Y "$LOGS/$name.log" 2>/dev/null || date +%s) ))
      if [ "$age" -gt "$STALL_S" ]; then
        echo "[pipeline] $name: STALLED (${age}s) — killing $pid"
        kill -9 "$pid" 2>/dev/null; sleep 5
        break
      fi
    done
    wait "$pid"; rc=$?
    if [ $rc -eq 0 ]; then
      touch "$MARK/$name.done"; echo "[pipeline] $name: OK"; return 0
    fi
    echo "[pipeline] $name: attempt $attempt FAILED rc=$rc (log: $LOGS/$name.log)"
  done
  return $rc
}

# ---- 1: validate the BENCH_DDIM50 north-star row ---------------------------
bench_check() {
  python bench.py | tail -1 > "$ART/bench_r03_preview2.json"
  cat "$ART/bench_r03_preview2.json"
  python - <<'EOF'
import json
d = json.load(open("demo_artifacts/round3/bench_r03_preview2.json"))
assert "ddim50_bs1024_samples_per_s" in d.get("extra", {}), d
EOF
}
stage bench_ddim50_check bench_check

# ---- 2+3: abstract reasoning on v4 reps vs onehot oracle -------------------
V4LDM=$(ls -td runs_full/*v4ld*/ 2>/dev/null | head -1 | sed 's:/$::')
V4CFG=configs/demo/synthetic-shapes-v4-full-encdiff.yaml
if [ -n "$V4LDM" ] && [ -d "$V4LDM/checkpoints" ]; then
  BEST=$(ls -d "$V4LDM"/checkpoints/best_dci_* 2>/dev/null | sort | tail -1)
  [ -z "$BEST" ] && BEST="$V4LDM/checkpoints/last"
  stage v4_reasoning_rep python scripts/abstract_reasoning_eval.py \
    --dataset synthetic_shapes_full -b "$V4CFG" -r "$BEST" \
    --pgm_type easy_mixed --num_iterations 10 \
    --training_steps_per_iteration 100 --batch_size 32 \
    --output_dir "$ART/v4_reasoning_rep"
else
  echo "[pipeline] v4_reasoning_rep: SKIP (no v4 checkpoint)"
fi
stage v4_reasoning_onehot python scripts/abstract_reasoning_eval.py \
  --dataset synthetic_shapes_full --embedding onehot \
  --pgm_type easy_mixed --num_iterations 10 \
  --training_steps_per_iteration 100 --batch_size 32 \
  --output_dir "$ART/v4_reasoning_onehot"

# ---- 4: UDR across seeds ----------------------------------------------------
stage udr_vq python main_val.py -b configs/demo/synthetic_shapes_vq.yaml \
  -t true --no-test true -l runs_udr -s 23 -n uvq
UVQ=$(ls -td runs_udr/*uvq*/ 2>/dev/null | head -1 | sed 's:/$::')
UCFG=configs/demo/synthetic-shapes-encdiff.yaml
if [ -n "$UVQ" ] && [ -d "$UVQ/checkpoints/last" ]; then
  for SEED in 1 2; do
    stage udr_seed$SEED python main_val.py -b "$UCFG" -t true \
      --no-test true -l runs_udr -s $SEED -n useed$SEED \
      --check_val_every_n_epoch 10 --eval_metrics factor_VAE \
      "model.params.first_stage_config.params.ckpt_path=$UVQ/checkpoints/last"
  done
  CK1=$(ls -td runs_udr/*useed1*/ 2>/dev/null | head -1)checkpoints/last
  CK2=$(ls -td runs_udr/*useed2*/ 2>/dev/null | head -1)checkpoints/last
  if [ -d "$CK1" ] && [ -d "$CK2" ]; then
    stage udr_eval python scripts/udr_eval.py -b "$UCFG" -r "$CK1" "$CK2" \
      --num_data_points 4000 --out "$ART/udr_two_seed.json"
  else
    echo "[pipeline] udr_eval: SKIP (missing seed checkpoints)"
  fi
else
  echo "[pipeline] udr: SKIP (no VQ checkpoint)"
fi

# ---- 5: faces chain (round3i stages; markers make this idempotent) ---------
# round3i waits on /tmp/r3h.pid (long gone) and the same ps pattern; safe
# to exec directly since this process is the only chip driver left.
exec bash scripts/round3i_pipeline.sh
