#!/bin/bash
# Round-4 chip pipeline, phase B-D (after round4a's flagship run):
#   B. fine-tune sweep on the v4h best checkpoint — the r3 MCL winner as
#      control vs hsic-augmented and indep-only cells (VERDICT r3 next #1-2;
#      winner re-scored under the full reference protocol)
#   C. cross-dataset generality: Cars3D [4,24,183] and MPI3D
#      [6,6,2,3,3,40,40] stand-in chains, full protocol at the end
#      (VERDICT r3 next #3)
#   D. UDR at protocol scale: 5 seeds x 30 epochs on the 27k grid, scored
#      with the variance-activity filter (VERDICT r3 next #4 + weak #4)
set -u
cd /root/repo

# wait for phase A (pipeline script exit + no training process left)
while kill -0 "$(cat /tmp/r4a.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
while ps -eo pid,args | grep -E "python (main_val\.py|bench\.py)" \
      | grep -v grep >/dev/null; do sleep 30; done

MARK=runs_r4/markers
LOGS=runs_r4/logs
ART=demo_artifacts/round4
mkdir -p "$MARK" "$LOGS" "$ART"

STALL_S=2400
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
        echo "[pipeline] $name: STALLED (${age}s quiet) — killing $pid"
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

preserve() {
  local run=$1 dest=$2
  [ -z "$run" ] && return 0
  mkdir -p "$ART/$dest"
  cp "$run"/metrics_sin/*.json "$ART/$dest/" 2>/dev/null
  cp "$run"/record/*.csv "$ART/$dest/record.csv" 2>/dev/null
  cp "$run"/run_metadata.json "$ART/$dest/" 2>/dev/null
  ls -t "$run"/images/*/*swap*.png 2>/dev/null | head -3 \
    | while read -r f; do cp "$f" "$ART/$dest/"; done
  cp "$run"/test_results.json "$ART/$dest/" 2>/dev/null
  return 0
}

V4VQ=$(ls -td runs_full/*v4vq*/ 2>/dev/null | head -1 | sed 's:/$::')
V4H=$(ls -td runs_full/*v4base*/ 2>/dev/null | head -1 | sed 's:/$::')
V4CFG=configs/demo/synthetic-shapes-v4-full-encdiff.yaml
preserve "$V4H" v4purify_run

# ---- phase B: fine-tune sweep on the v4h best checkpoint -------------------
if [ -n "$V4H" ] && [ -d "$V4H/checkpoints" ]; then
  BEST=$(ls -d "$V4H"/checkpoints/best_dci_* 2>/dev/null | sort | tail -1)
  [ -z "$BEST" ] && BEST="$V4H/checkpoints/last"
  echo "[pipeline] fine-tune base checkpoint: $BEST"
  # control (r3 winner) + hsic-augmented cells at the reference fine-tune lr
  stage ft_sweep python scripts/run_mcl_sweep.py \
    --base "$V4CFG" \
    --ckpt "$BEST" --vq_ckpt "$V4VQ/checkpoints/last" \
    --mcl_types infonce_mechgrad --lambdas 0.01 \
    --indep_types none,hsic --indep_lambdas 2,10 \
    --max_epochs 1 -l runs_mcl_r4 --skip_finale
  # indep-only cells at a 5x lr (the encoder moves on indep gradients alone)
  stage ft_sweep_indep python scripts/run_mcl_sweep.py \
    --base "$V4CFG" \
    --ckpt "$BEST" --vq_ckpt "$V4VQ/checkpoints/last" \
    --mcl_types none --indep_types hsic --indep_lambdas 10,50 \
    --base_lr 1e-6 --max_epochs 1 -l runs_mcl_r4
  cp runs_mcl_r4/mcl_sweep.csv "$ART/ft_sweep.csv" 2>/dev/null
  cp runs_mcl_r4/mcl_best_full_protocol.json "$ART/ft_best_full_protocol.json" 2>/dev/null
else
  echo "[pipeline] phase B: SKIP (no v4h checkpoint)"
fi

# ---- phase C1: Cars3D chain ------------------------------------------------
stage cars_vq python main_val.py -b configs/demo/synthetic-cars3d-vq.yaml \
  -t true --no-test true -l runs_cross -s 23 -n carsvq
CVQ=$(ls -td runs_cross/*carsvq*/ 2>/dev/null | head -1 | sed 's:/$::')
if [ -n "$CVQ" ] && [ -d "$CVQ/checkpoints/last" ]; then
  stage cars_encdiff train_resume runs_cross carsld \
    -b configs/demo/synthetic-cars3d-encdiff.yaml -s 23 \
    "model.params.first_stage_config.params.ckpt_path=$CVQ/checkpoints/last" \
    "model.params.indep_type=hsic" "model.params.lambda_indep=2.0"
  CLD=$(ls -td runs_cross/*carsld*/ 2>/dev/null | head -1 | sed 's:/$::')
  preserve "$CLD" cars3d_run
else
  echo "[pipeline] cars_encdiff: SKIP (no cars VQ checkpoint)"
fi

# ---- phase C2: MPI3D chain ---------------------------------------------------
stage mpi_vq python main_val.py -b configs/demo/synthetic-mpi3d-vq.yaml \
  -t true --no-test true -l runs_cross -s 23 -n mpivq
MVQ=$(ls -td runs_cross/*mpivq*/ 2>/dev/null | head -1 | sed 's:/$::')
if [ -n "$MVQ" ] && [ -d "$MVQ/checkpoints/last" ]; then
  stage mpi_encdiff train_resume runs_cross mpild \
    -b configs/demo/synthetic-mpi3d-encdiff.yaml -s 23 \
    "model.params.first_stage_config.params.ckpt_path=$MVQ/checkpoints/last" \
    "model.params.indep_type=hsic" "model.params.lambda_indep=2.0"
  MLD=$(ls -td runs_cross/*mpild*/ 2>/dev/null | head -1 | sed 's:/$::')
  preserve "$MLD" mpi3d_run
else
  echo "[pipeline] mpi_encdiff: SKIP (no mpi VQ checkpoint)"
fi

# ---- phase D: UDR at protocol scale (5 seeds x 30 epochs, 27k grid) --------
stage udr_vq python main_val.py -b configs/demo/synthetic_shapes_vq.yaml \
  -t true --no-test true -l runs_udr -s 23 -n uvq
UVQ=$(ls -td runs_udr/*uvq*/ 2>/dev/null | head -1 | sed 's:/$::')
UCFG=configs/demo/synthetic-shapes-encdiff.yaml
if [ -n "$UVQ" ] && [ -d "$UVQ/checkpoints/last" ]; then
  CKS=""
  for SEED in 1 2 3 4 5; do
    stage udr_seed$SEED python main_val.py -b "$UCFG" -t true \
      --no-test true -l runs_udr -s $SEED -n useed$SEED \
      --max_epochs 30 --check_val_every_n_epoch 30 \
      --eval_metrics factor_VAE \
      "model.params.first_stage_config.params.ckpt_path=$UVQ/checkpoints/last"
    CK=$(ls -td runs_udr/*useed$SEED*/ 2>/dev/null | head -1)checkpoints/last
    [ -d "$CK" ] && CKS="$CKS $CK"
  done
  if [ "$(echo $CKS | wc -w)" -ge 4 ]; then
    stage udr_eval5 python scripts/udr_eval.py -b "$UCFG" -r $CKS \
      --num_data_points 4000 --activity variance \
      --out "$ART/udr_five_seed.json"
    # unfiltered control: quantifies the dead-code dilution on real seeds
    stage udr_eval5_raw python scripts/udr_eval.py -b "$UCFG" -r $CKS \
      --num_data_points 4000 --activity none \
      --out "$ART/udr_five_seed_unfiltered.json"
  else
    echo "[pipeline] udr_eval5: SKIP (missing seed checkpoints)"
  fi
else
  echo "[pipeline] udr: SKIP (no VQ checkpoint)"
fi

echo "[pipeline] phases B-D complete $(date -u +%H:%M:%S)"
