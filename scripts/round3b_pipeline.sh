#!/bin/bash
# Round-3 chip pipeline, second launch (the box rebooted mid-round and the
# gitignored runs_*/ checkpoints were lost; demo_artifacts/round3 preserves
# the completed v2 + bands evidence).  Revised order for the restart:
#   1. bench_sweep            -> MFU/DDIM tables (chip idle right now)
#   2. faces VQ+EncDiff+eval  -> first FID/TAD numbers, flash-attn ON
#   3. v3-renderer 480k run   -> DCI-parity benchmark (renderer with only
#                                the factor-pixel couplings real Shapes3D
#                                has; v2's shading/rotation confounds removed)
#   4. MCL matrix 5x2 (1 ep)  -> 10-row mcl_sweep.csv from the v3 ckpt
#   5. MCL winner x 3 ep      -> headline DCI push
# Stage machinery (markers, mtime watchdog) identical to round3_pipeline.sh.
set -u
cd /root/repo
wait_chip_idle() {
  while ps -eo pid,args | grep -E "python (main_val\.py|bench\.py)" \
        | grep -v grep >/dev/null; do sleep 15; done
}
wait_chip_idle
MARK=runs_r3b/markers
LOGS=runs_r3b/logs
mkdir -p "$MARK" "$LOGS" demo_artifacts/round3

STALL_S=1800
stage() {
  local name=$1; shift
  if [ -f "$MARK/$name.done" ]; then echo "[pipeline] $name: done, skip"; return 0; fi
  local attempt rc
  for attempt in 1 2; do
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

# ---- stage 0: MFU / DDIM sweep (chip idle at launch -> cheapest now) ------
stage bench_sweep python scripts/bench_sweep.py \
  --out demo_artifacts/round3/bench_sweep.csv \
  --train_batches 128,256,512 --ddim "200:128,200:512,50:512,50:1024"

# ---- stage 1: CelebA-scale faces (256px, 4096-token flash attention) ------
stage faces_vq python main_val.py -b configs/demo/synthetic-faces-vq.yaml \
  -t true --no-test true -l runs_faces -s 23

FVQ=$(ls -td runs_faces/*vq*/ 2>/dev/null | head -1 | sed 's:/$::')
if [ -n "$FVQ" ] && [ -d "$FVQ/checkpoints/last" ]; then
  stage faces_encdiff python main_val.py -b configs/demo/synthetic-faces-encdiff.yaml \
    -t true -l runs_faces -s 23 \
    "model.params.first_stage_config.params.ckpt_path=$FVQ/checkpoints/last"
else
  echo "[pipeline] faces_encdiff: SKIP (no faces VQ checkpoint)"
fi

if [ -f "$MARK/faces_encdiff.done" ]; then
  stage faces_eval bash scripts/round3_faces_eval.sh
else
  echo "[pipeline] faces_eval: SKIP (faces_encdiff not done)"
fi

# ---- stage 2: v3-renderer 480k two-stage run ------------------------------
# The v3 configs are being written while the earlier stages run; wait for
# them (up to 3 h) so a slow authoring session doesn't abort the pipeline.
V3CFG=configs/demo/synthetic-shapes-v3-full-encdiff.yaml
for _ in $(seq 1 180); do [ -f "$V3CFG" ] && break; sleep 60; done
if [ -f "$V3CFG" ]; then
  stage v3_vq python main_val.py -b configs/demo/synthetic-shapes-v3-full-vq.yaml \
    -t true --no-test true -l runs_full -s 23 -n v3vq

  V3VQ=$(ls -td runs_full/*v3vq* 2>/dev/null | head -1)
  if [ -n "$V3VQ" ] && [ -d "$V3VQ/checkpoints/last" ]; then
    stage v3_encdiff python main_val.py -b "$V3CFG" \
      -t true -l runs_full -s 23 -n v3ld \
      "model.params.first_stage_config.params.ckpt_path=$V3VQ/checkpoints/last"
  else
    echo "[pipeline] v3_encdiff: SKIP (no v3 VQ checkpoint)"
  fi
else
  echo "[pipeline] v3 stages: SKIP (config never appeared)"
fi

V3LDM=$(ls -td runs_full/*v3ld*/ 2>/dev/null | head -1 | sed 's:/$::')
echo "[pipeline] v3 LDM run: $V3LDM"

# ---- stage 3: MCL matrix (5 loss types x 2 lambdas, 1 epoch each) ---------
if [ -n "${V3LDM:-}" ] && [ -d "$V3LDM/checkpoints" ]; then
  BEST=$(ls -d "$V3LDM"/checkpoints/best_dci_* 2>/dev/null | sort | tail -1)
  [ -z "$BEST" ] && BEST="$V3LDM/checkpoints/last"
  stage mcl_matrix python scripts/run_mcl_sweep.py \
    --base "$V3CFG" \
    --ckpt "$BEST" --vq_ckpt "$V3VQ/checkpoints/last" \
    --mcl_types nce_logistic,infonce_mechgrad,fisher_sm,denoise_sm,jacobian_vjp_infonce \
    --lambdas 0.01,0.05 --max_epochs 1 -l runs_mcl_v3
  cp runs_mcl_v3/mcl_sweep.csv demo_artifacts/round3/mcl_sweep.csv 2>/dev/null
else
  echo "[pipeline] mcl_matrix: SKIP (no v3 LDM checkpoint)"
fi

# ---- stage 4: matrix winner x 3 epochs from the v3 best checkpoint --------
if [ -f runs_mcl_v3/mcl_sweep.csv ] && [ -n "${BEST:-}" ]; then
  WIN=$(python -c "
import csv
rows=[r for r in csv.DictReader(open('runs_mcl_v3/mcl_sweep.csv'))
      if r.get('val/dci_disentanglement')]
rows.sort(key=lambda r: float(r['val/dci_disentanglement']), reverse=True)
print(rows[0]['mcl_type'], rows[0]['lambda']) if rows else print('')" )
  WTYPE=$(echo "$WIN" | cut -d' ' -f1); WLAM=$(echo "$WIN" | cut -d' ' -f2)
  if [ -n "$WTYPE" ]; then
    stage mcl_best python scripts/run_mcl_sweep.py \
      --base "$V3CFG" \
      --ckpt "$BEST" --vq_ckpt "$V3VQ/checkpoints/last" \
      --mcl_types "$WTYPE" --lambdas "$WLAM" --max_epochs 3 -l runs_mcl_best
    cp runs_mcl_best/mcl_sweep.csv demo_artifacts/round3/mcl_best_v3.csv 2>/dev/null
  fi
fi

echo "[pipeline] all stages attempted $(date -u +%H:%M:%S)"
