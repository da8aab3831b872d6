#!/bin/bash
# Round-4 chip pipeline, phase D (fresh-VM rerun, wall-clock constrained):
# cross-dataset generality evidence (VERDICT r3 next #3) sized to fit the
# remaining round budget on one chip.
#
#   1. cars_vq      — Cars3D stand-in VQ first stage (2 epochs)
#   2. cars_encdiff — Cars3D EncDiff LDM, 8 epochs, eval every 2, post-fit
#                     full reference protocol (DCI 10k/5k GBT etc.)
#   3. preserve     — metric JSONs + swap grid -> demo_artifacts/round4
#   4. mpi chain    — only if >=34 min remain at cars completion: VQ 1 epoch
#                     on a stride-subsampled grid + LDM 2 epochs on the full
#                     1,036,800-image grid with one eval (liveness + first
#                     cross-dataset numbers on the 7-factor structure)
#
# The base recipe (no from-scratch hsic) is used: the abandoned-scratch
# study (demo_artifacts/round4/v4h_scratch_abandoned) showed independence
# pressure from step 0 stalls factor discovery; short-budget runs get the
# known-good discovery recipe.
set -u
cd /root/repo

HARD_STOP=${HARD_STOP:-$(( $(date +%s) + 1980 ))}   # default: 33 min

MARK=runs_r4/markers
LOGS=runs_r4/logs
ART=demo_artifacts/round4
mkdir -p "$MARK" "$LOGS" "$ART"

left_min() { echo $(( (HARD_STOP - $(date +%s)) / 60 )); }

stage() {
  local name=$1 need_min=$2; shift 2
  if [ -f "$MARK/$name.done" ]; then echo "[pipeline] $name: done, skip"; return 0; fi
  local left; left=$(left_min)
  if [ "$left" -lt "$need_min" ]; then
    echo "[pipeline] $name: SKIP (${left}min left < ${need_min}min needed)"; return 1
  fi
  echo "[pipeline] $name: start $(date -u +%H:%M:%S) (${left}min left)"
  timeout $(( (HARD_STOP - $(date +%s)) )) "$@" >"$LOGS/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$MARK/$name.done"; echo "[pipeline] $name: OK"
  else echo "[pipeline] $name: FAILED rc=$rc (log: $LOGS/$name.log)"; fi
  return $rc
}

preserve() {
  local run=$1 dest=$2
  [ -z "$run" ] && return 0
  mkdir -p "$ART/$dest"
  cp "$run"/metrics_sin/*.json "$ART/$dest/" 2>/dev/null
  cp "$run"/record/*.csv "$ART/$dest/record.csv" 2>/dev/null
  cp "$run"/run_metadata.json "$ART/$dest/" 2>/dev/null
  ls -t "$run"/images/*/*swap*.png 2>/dev/null | head -2 \
    | while read -r f; do cp "$f" "$ART/$dest/"; done
  cp "$run"/test_results.json "$ART/$dest/" 2>/dev/null
  return 0
}

# ---- 1-2: Cars3D chain -----------------------------------------------------
stage cars_vq 4 python main_val.py -b configs/demo/synthetic-cars3d-vq.yaml \
  -t true --no-test true -l runs_cross -s 23 -n carsvq --max_epochs 2
CVQ=$(ls -td runs_cross/*carsvq*/ 2>/dev/null | head -1 | sed 's:/$::')
if [ -n "$CVQ" ] && [ -d "$CVQ/checkpoints/last" ]; then
  stage cars_encdiff 12 python main_val.py \
    -b configs/demo/synthetic-cars3d-encdiff.yaml -t true \
    -l runs_cross -s 23 -n carsld \
    --max_epochs 8 --check_val_every_n_epoch 2 \
    "model.params.first_stage_config.params.ckpt_path=$CVQ/checkpoints/last"
  CLD=$(ls -td runs_cross/*carsld*/ 2>/dev/null | head -1 | sed 's:/$::')
  preserve "$CLD" cars3d_run
else
  echo "[pipeline] cars_encdiff: SKIP (no cars VQ checkpoint)"
fi

# ---- 4: MPI3D chain (only with comfortable margin) --------------------------
if [ "$(left_min)" -ge 34 ]; then
  stage mpi_vq 5 python main_val.py -b configs/demo/synthetic-mpi3d-vq.yaml \
    -t true --no-test true -l runs_cross -s 23 -n mpivq --max_epochs 1 \
    "data.params.train.params.factor_sizes=[6,6,2,3,3,10,10]"
  MVQ=$(ls -td runs_cross/*mpivq*/ 2>/dev/null | head -1 | sed 's:/$::')
  if [ -n "$MVQ" ] && [ -d "$MVQ/checkpoints/last" ]; then
    stage mpi_encdiff 12 python main_val.py \
      -b configs/demo/synthetic-mpi3d-encdiff.yaml -t true \
      -l runs_cross -s 23 -n mpild \
      --max_epochs 2 --check_val_every_n_epoch 1 \
      "model.params.first_stage_config.params.ckpt_path=$MVQ/checkpoints/last"
    MLD=$(ls -td runs_cross/*mpild*/ 2>/dev/null | head -1 | sed 's:/$::')
    preserve "$MLD" mpi3d_run
  fi
else
  echo "[pipeline] mpi chain: SKIP ($(left_min)min left)"
fi

echo "[pipeline] phase D complete $(date -u +%H:%M:%S)"
