#!/bin/bash
# Round-3 chip pipeline, third launch (pass 3).  The box rebooted again and
# every gitignored runs_*/ tree (checkpoints, markers) was lost; only the
# committed demo_artifacts survive.  Pass-3 ordering puts the DCI-parity
# north star first (VERDICT r2 "next round" #1-2), faces second, the bench
# addendum last:
#   1. v3_vq + v3_encdiff   -> DCI-parity 480k run on the v3 renderer
#   2. MCL matrix 5x2 (1ep) -> 10-row mcl_sweep.csv from the v3 best ckpt
#   3. MCL winner x 3 ep    -> headline DCI push
#   4. faces VQ+EncDiff+eval-> first FID/TAD numbers, flash-attn ON
#   5. bench addendum       -> cached-vs-uncached train + bf16-weight DDIM
# New vs round3b: long training stages RESUME from their own checkpoints on
# retry (a watchdog kill no longer restarts 24 epochs from scratch), and
# each stage's eval artifacts are copied into demo_artifacts/round3
# immediately so a mid-pipeline reboot cannot erase the evidence.
set -u
cd /root/repo
wait_chip_idle() {
  while ps -eo pid,args | grep -E "python (main_val\.py|bench\.py)" \
        | grep -v grep >/dev/null; do sleep 15; done
}
wait_chip_idle
MARK=runs_r3d/markers
LOGS=runs_r3d/logs
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
        echo "[pipeline] $name: STALLED (${age}s since last log write) — killing $pid"
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

# Train with resume-on-retry: if a run matching the -n name already has a
# last checkpoint, continue it with -r instead of starting a fresh logdir.
train_resume() {
  local logroot=$1 runname=$2; shift 2
  local prev
  prev=$(ls -td "$logroot"/*"$runname"*/ 2>/dev/null | head -1 | sed 's:/$::')
  if [ -n "$prev" ] && [ -d "$prev/checkpoints/last" ]; then
    echo "[train_resume] resuming $prev"
    python main_val.py -r "$prev" -t true "$@"
  else
    python main_val.py -t true -l "$logroot" -n "$runname" "$@"
  fi
}

# Copy a run's eval evidence (metric JSONs, record CSV, swap grids) into
# demo_artifacts so it survives reboots.  Usage: preserve <rundir> <destname>
preserve() {
  local run=$1 dest=$2
  [ -z "$run" ] && return 0
  mkdir -p "$ART/$dest"
  cp "$run"/metrics_sin/*.json "$ART/$dest/" 2>/dev/null
  cp "$run"/record/*.csv "$ART/$dest/record.csv" 2>/dev/null
  cp "$run"/testtube/*.csv "$ART/$dest/" 2>/dev/null
  ls -t "$run"/images/*/*swap*.png 2>/dev/null | head -3 \
    | while read -r f; do cp "$f" "$ART/$dest/"; done
  cp "$run"/test_results.json "$ART/$dest/" 2>/dev/null
  return 0
}

# ---- stage 1: v3-renderer 480k two-stage run (DCI-parity north star) ------
stage v3_vq python main_val.py -b configs/demo/synthetic-shapes-v3-full-vq.yaml \
  -t true --no-test true -l runs_full -s 23 -n v3vq

V3VQ=$(ls -td runs_full/*v3vq*/ 2>/dev/null | head -1 | sed 's:/$::')
V3CFG=configs/demo/synthetic-shapes-v3-full-encdiff.yaml
if [ -n "$V3VQ" ] && [ -d "$V3VQ/checkpoints/last" ]; then
  stage v3_encdiff train_resume runs_full v3ld -b "$V3CFG" -s 23 \
    "model.params.first_stage_config.params.ckpt_path=$V3VQ/checkpoints/last"
else
  echo "[pipeline] v3_encdiff: SKIP (no v3 VQ checkpoint)"
fi

V3LDM=$(ls -td runs_full/*v3ld*/ 2>/dev/null | head -1 | sed 's:/$::')
echo "[pipeline] v3 LDM run: $V3LDM"
preserve "$V3LDM" v3_run

# ---- stage 2: MCL matrix (5 loss types x 2 lambdas, 1 epoch each) ---------
if [ -n "${V3LDM:-}" ] && [ -d "$V3LDM/checkpoints" ]; then
  BEST=$(ls -d "$V3LDM"/checkpoints/best_dci_* 2>/dev/null | sort | tail -1)
  [ -z "$BEST" ] && BEST="$V3LDM/checkpoints/last"
  stage mcl_matrix python scripts/run_mcl_sweep.py \
    --base "$V3CFG" \
    --ckpt "$BEST" --vq_ckpt "$V3VQ/checkpoints/last" \
    --mcl_types nce_logistic,infonce_mechgrad,fisher_sm,denoise_sm,jacobian_vjp_infonce \
    --lambdas 0.01,0.05 --max_epochs 1 -l runs_mcl_v3
  cp runs_mcl_v3/mcl_sweep.csv "$ART/mcl_sweep.csv" 2>/dev/null
else
  echo "[pipeline] mcl_matrix: SKIP (no v3 LDM checkpoint)"
fi

# ---- stage 3: matrix winner x 3 epochs from the v3 best checkpoint --------
if [ -f runs_mcl_v3/mcl_sweep.csv ] && [ -n "${BEST:-}" ]; then
  WIN=$(python - <<'EOF'
import csv
rows=[r for r in csv.DictReader(open('runs_mcl_v3/mcl_sweep.csv'))
      if r.get('val/dci_disentanglement')]
rows.sort(key=lambda r: float(r['val/dci_disentanglement']), reverse=True)
if rows: print(rows[0]['mcl_type'], rows[0]['lambda'])
EOF
  )
  WTYPE=$(echo "$WIN" | cut -d' ' -f1); WLAM=$(echo "$WIN" | cut -d' ' -f2)
  if [ -n "$WTYPE" ]; then
    stage mcl_best python scripts/run_mcl_sweep.py \
      --base "$V3CFG" \
      --ckpt "$BEST" --vq_ckpt "$V3VQ/checkpoints/last" \
      --mcl_types "$WTYPE" --lambdas "$WLAM" --max_epochs 3 -l runs_mcl_best
    cp runs_mcl_best/mcl_sweep.csv "$ART/mcl_best_v3.csv" 2>/dev/null
  fi
fi

# ---- stage 4: CelebA-scale faces (256px, 4096-token flash attention) ------
stage faces_vq python main_val.py -b configs/demo/synthetic-faces-vq.yaml \
  -t true --no-test true -l runs_faces -s 23 -n fvq

FVQ=$(ls -td runs_faces/*fvq*/ 2>/dev/null | head -1 | sed 's:/$::')
if [ -n "$FVQ" ] && [ -d "$FVQ/checkpoints/last" ]; then
  stage faces_encdiff train_resume runs_faces fld-encdiff \
    -b configs/demo/synthetic-faces-encdiff.yaml -s 23 \
    "model.params.first_stage_config.params.ckpt_path=$FVQ/checkpoints/last"
else
  echo "[pipeline] faces_encdiff: SKIP (no faces VQ checkpoint)"
fi

if [ -f "$MARK/faces_encdiff.done" ]; then
  stage faces_eval bash scripts/round3_faces_eval.sh
  FLD=$(ls -td runs_faces/*fld-encdiff*/ 2>/dev/null | head -1 | sed 's:/$::')
  preserve "$FLD" faces_run
  cp runs_faces/eval/*.json "$ART/faces_run/" 2>/dev/null
else
  echo "[pipeline] faces_eval: SKIP (faces_encdiff not done)"
fi

# ---- stage 5: bench addendum (cached vs uncached, bf16-weight DDIM) -------
stage bench_addendum python scripts/bench_sweep.py \
  --out "$ART/bench_addendum.csv" \
  --train_batches 128 --cached_variants --fused "" \
  --ddim "200:128:bf16p,50:1024:bf16p,200:128"

echo "[pipeline] all stages attempted $(date -u +%H:%M:%S)"
