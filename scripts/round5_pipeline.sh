#!/bin/bash
# Round-5 chip pipeline — executes VERDICT r4's "Next round" list in priority
# order on the single tunnel chip, serially:
#
#   1. bench addendum (DDIM-50/200 x bs128/256 — the falsifiable ~250
#      samples/s DDIM-50@bs128 prediction, VERDICT #2c)
#   2. TWO-PHASE FLAGSHIP (VERDICT #1): v4 VQ (2 ep) -> 18 discovery epochs
#      (r3 recipe, indep OFF) -> hsic lambda=2 purification resume (8 ep)
#      with full-protocol test(). Compact npz exported after every stage;
#      the harness additionally mirrors every checkpoint save as
#      checkpoints/compact_last.npz.
#   3. MPI3D end-to-end (VERDICT #3): full 1,036,800-image 40x40 grid
#      (cache pre-rendered on host by stage mpi_render), VQ 1 ep + LDM 8 ep.
#   4. Cars3D resume to 15 total epochs + full-protocol test (VERDICT #4).
#   5. UDR 5 seeds x 30 epochs + activity-filtered scoring (VERDICT #6).
#   6. reasoning-to-plateau + faces evidence (VERDICT #7) — time-gated.
#
# Each stage is marker-gated (re-runnable), watchdogged against the tunnel
# hang mode (log quiet >2400s => kill+retry), and hard-stop gated so the
# pipeline never runs past the round budget.
set -u
cd /root/repo

MARK=runs_r5/markers
LOGS=runs_r5/logs
ART=demo_artifacts/round5
mkdir -p "$MARK" "$LOGS" "$ART"

# Hard stop: default 7h from launch, overridable.
HARD_STOP=${R5_HARD_STOP:-$(( $(date +%s) + 7*3600 ))}
left_min() { echo $(( (HARD_STOP - $(date +%s)) / 60 )); }

STALL_S=2400
stage() {
  local name=$1 need_min=$2; shift 2
  if [ -f "$MARK/$name.done" ]; then echo "[pipeline] $name: done, skip"; return 0; fi
  local left; left=$(left_min)
  if [ "$left" -lt "$need_min" ]; then
    echo "[pipeline] $name: SKIP (${left}min left < ${need_min}min)"; return 1
  fi
  local attempt rc
  for attempt in 1 2; do
    echo "[pipeline] $name: start attempt $attempt $(date -u +%H:%M:%S) (${left}min left)"
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
      if [ "$(date +%s)" -gt "$HARD_STOP" ]; then
        echo "[pipeline] $name: HARD STOP — killing $pid"
        kill -9 "$pid" 2>/dev/null; sleep 5
        return 1
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
  ls -t "$run"/images/*/*swap*.png 2>/dev/null | head -2 \
    | while read -r f; do cp "$f" "$ART/$dest/"; done
  cp "$run"/test_results.json "$ART/$dest/" 2>/dev/null
  return 0
}

export_npz() {  # export_npz <ckpt_dir> <out.npz> [--slim]
  if [ -n "${3:-}" ]; then
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      python scripts/export_compact_ckpt.py -r "$1" --out "$2" "$3"
  else
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      python scripts/export_compact_ckpt.py -r "$1" --out "$2"
  fi
}

# ---- 0. MPI3D render cache (pure host, ~6 min, no chip) ---------------------
stage mpi_render 10 python -c "
import sys; sys.path.insert(0, '/root/repo')
from encdiff_tpu.data.synthetic_mpi3d import get_mpi3d_images
a = get_mpi3d_images(64)
print('cache ready', a.shape, a.dtype)"

# ---- 1. bench addendum (VERDICT #2b/c) -------------------------------------
stage bench_addendum 35 python scripts/bench_sweep.py \
  --out "$ART/bench_addendum_r5.csv" \
  --train_batches "" \
  --ddim "50:128,50:256,200:128,200:256"
# also satisfy the r4 promise at its documented path
[ -f "$ART/bench_addendum_r5.csv" ] && \
  cp "$ART/bench_addendum_r5.csv" demo_artifacts/round4/bench_addendum_r4.csv

# ---- 2. flagship: VQ stage --------------------------------------------------
V4CFG=configs/demo/synthetic-shapes-v4-full-encdiff.yaml
stage v4_vq 40 python main_val.py -b configs/demo/synthetic-shapes-v4-full-vq.yaml \
  -t true --no-test true -l runs_r5 -s 23 -n v4vq
V4VQ=$(ls -td runs_r5/*v4vq*/ 2>/dev/null | head -1 | sed 's:/$::')
if [ -n "$V4VQ" ] && [ -d "$V4VQ/checkpoints/last" ]; then
  [ -f "$ART/v4vq_fp16.npz" ] || \
    export_npz "$V4VQ/checkpoints/last" "$ART/v4vq_fp16.npz"

  # ---- 3. flagship: 18 discovery epochs (indep OFF) ------------------------
  stage v4_base 160 train_resume runs_r5 v4base -b "$V4CFG" -s 23 \
    --no-test true --max_epochs 18 \
    "model.params.first_stage_config.params.ckpt_path=$V4VQ/checkpoints/last"
  V4B=$(ls -td runs_r5/*v4base*/ 2>/dev/null | head -1 | sed 's:/$::')
  if [ -n "$V4B" ] && [ -d "$V4B/checkpoints/last" ]; then
    [ -d "$V4B/checkpoints/base18" ] || \
      cp -r "$V4B/checkpoints/last" "$V4B/checkpoints/base18"
    BESTB=$(ls -d "$V4B"/checkpoints/best_dci_* 2>/dev/null | sort | tail -1)
    [ -z "$BESTB" ] && BESTB="$V4B/checkpoints/last"
    [ -f "$ART/v4base18_best_dci_fp16.npz" ] || \
      export_npz "$BESTB" "$ART/v4base18_best_dci_fp16.npz" --slim
    preserve "$V4B" v4base_run

    # ---- 4. flagship: hsic purification resume (full protocol test()) -----
    stage v4_purify 110 python main_val.py -r "$V4B" -t true --max_epochs 8 \
      --check_val_every_n_epoch 1 \
      "model.params.indep_type=hsic" "model.params.lambda_indep=2.0"
    BESTP=$(ls -d "$V4B"/checkpoints/best_dci_* 2>/dev/null | sort | tail -1)
    [ -z "$BESTP" ] && BESTP="$V4B/checkpoints/last"
    export_npz "$BESTP" "$ART/v4purify_best_dci_fp16.npz" --slim
    preserve "$V4B" v4purify_run

    # lambda bracket (VERDICT #1 fallback): if lambda=2 misses the 0.992 bar
    # or costs FactorVAE, run a gentler 5-epoch lambda=0.5 cell from the
    # base18 snapshot so the round reports a frontier, not one point.
    NEED_BRACKET=$(python - "$V4B" <<'PYEOF'
import glob, json, sys
run = sys.argv[1]
tr = glob.glob(run + "/test_results.json")
ok = False
if tr:
    d = json.load(open(tr[0]))
    dci = d.get("val/dci_disentanglement") or 0
    fv = d.get("val/factor_vae_score") or 0
    ok = dci >= 0.992 and fv >= 0.999
print("no" if ok else "yes")
PYEOF
)
    if [ "$NEED_BRACKET" = "yes" ] && [ -d "$V4B/checkpoints/base18" ]; then
      stage v4_purify_l05 70 python main_val.py -t true -l runs_r5 \
        -n v4pur05 -b "$V4CFG" -s 23 --max_epochs 5 \
        --check_val_every_n_epoch 1 \
        --resume_ckpt "$V4B/checkpoints/base18" \
        "model.params.first_stage_config.params.ckpt_path=$V4VQ/checkpoints/last" \
        "model.params.indep_type=hsic" "model.params.lambda_indep=0.5"
      P05=$(ls -td runs_r5/*v4pur05*/ 2>/dev/null | head -1 | sed 's:/$::')
      if [ -n "$P05" ]; then
        B05=$(ls -d "$P05"/checkpoints/best_dci_* 2>/dev/null | sort | tail -1)
        [ -n "$B05" ] && export_npz "$B05" "$ART/v4purify_l05_best_dci_fp16.npz" --slim
        preserve "$P05" v4purify_l05_run
      fi
    fi
  fi
fi

# ---- 5. MPI3D end-to-end ----------------------------------------------------
stage mpi_vq 40 python main_val.py -b configs/demo/synthetic-mpi3d-vq.yaml \
  -t true --no-test true -l runs_r5 -s 23 -n mpivq
MVQ=$(ls -td runs_r5/*mpivq*/ 2>/dev/null | head -1 | sed 's:/$::')
if [ -n "$MVQ" ] && [ -d "$MVQ/checkpoints/last" ]; then
  stage mpi_ld 110 train_resume runs_r5 mpild \
    -b configs/demo/synthetic-mpi3d-encdiff.yaml -s 23 \
    --max_epochs 5 --check_val_every_n_epoch 2 \
    "model.params.first_stage_config.params.ckpt_path=$MVQ/checkpoints/last"
  MLD=$(ls -td runs_r5/*mpild*/ 2>/dev/null | head -1 | sed 's:/$::')
  if [ -n "$MLD" ]; then
    BESTM=$(ls -d "$MLD"/checkpoints/best_dci_* 2>/dev/null | sort | tail -1)
    [ -z "$BESTM" ] && BESTM="$MLD/checkpoints/last"
    export_npz "$BESTM" "$ART/mpi3d_best_dci_fp16.npz" --slim
    preserve "$MLD" mpi3d_run
  fi
fi

# ---- 6. Cars3D: resume to 15 total epochs + full-protocol test -------------
CLD=$(ls -td runs_cross/*carsld*/ 2>/dev/null | head -1 | sed 's:/$::')
if [ -n "$CLD" ] && [ -d "$CLD/checkpoints/last" ]; then
  stage cars_finish 60 python main_val.py -r "$CLD" -t true --max_epochs 9 \
    --check_val_every_n_epoch 3
  BESTC=$(ls -d "$CLD"/checkpoints/best_dci_* 2>/dev/null | sort | tail -1)
  [ -z "$BESTC" ] && BESTC="$CLD/checkpoints/last"
  export_npz "$BESTC" "$ART/cars3d_15ep_best_dci_fp16.npz" --slim
  preserve "$CLD" cars3d_15ep_run
fi

# ---- 7. UDR: 5 seeds x 30 epochs on the 27k grid (VERDICT #6) --------------
stage udr_vq 25 python main_val.py -b configs/demo/synthetic_shapes_vq.yaml \
  -t true --no-test true -l runs_r5 -s 23 -n uvq
UVQ=$(ls -td runs_r5/*uvq*/ 2>/dev/null | head -1 | sed 's:/$::')
UCFG=configs/demo/synthetic-shapes-encdiff.yaml
if [ -n "$UVQ" ] && [ -d "$UVQ/checkpoints/last" ]; then
  CKS=""
  for SEED in 1 2 3 4 5; do
    stage udr_seed$SEED 25 python main_val.py -b "$UCFG" -t true \
      --no-test true -l runs_r5 -s $SEED -n useed$SEED \
      --max_epochs 30 --check_val_every_n_epoch 30 \
      --eval_metrics factor_VAE \
      "model.params.first_stage_config.params.ckpt_path=$UVQ/checkpoints/last"
    CK="$(ls -td runs_r5/*useed$SEED*/ 2>/dev/null | head -1)checkpoints/last"
    [ -d "$CK" ] && CKS="$CKS $CK"
  done
  if [ "$(echo $CKS | wc -w)" -ge 4 ]; then
    stage udr_eval5 30 python scripts/udr_eval.py -b "$UCFG" -r $CKS \
      --num_data_points 4000 --activity variance \
      --out "$ART/udr_five_seed.json"
    stage udr_eval5_raw 20 python scripts/udr_eval.py -b "$UCFG" -r $CKS \
      --num_data_points 4000 --activity none \
      --out "$ART/udr_five_seed_unfiltered.json"
  fi
fi

# ---- 8. reasoning to plateau + faces (VERDICT #7, time-gated) --------------
V4B=$(ls -td runs_r5/*v4base*/ 2>/dev/null | head -1 | sed 's:/$::')
if [ -n "$V4B" ] && [ -d "$V4B/checkpoints" ]; then
  BEST=$(ls -d "$V4B"/checkpoints/best_dci_* 2>/dev/null | sort | tail -1)
  [ -z "$BEST" ] && BEST="$V4B/checkpoints/last"
  stage reasoning_rep_long 50 python scripts/abstract_reasoning_eval.py \
    --dataset synthetic_shapes_full -b "$V4CFG" -r "$BEST" \
    --pgm_type easy_mixed --num_iterations 30 \
    --training_steps_per_iteration 100 --batch_size 32 \
    --output_dir "$ART/reasoning_rep_long"
  stage reasoning_onehot_long 45 python scripts/abstract_reasoning_eval.py \
    --dataset synthetic_shapes_full --embedding onehot \
    --pgm_type easy_mixed --num_iterations 30 \
    --training_steps_per_iteration 100 --batch_size 32 \
    --output_dir "$ART/reasoning_onehot_long"
fi

stage faces_vq 45 python main_val.py -b configs/demo/synthetic-faces-vq.yaml \
  -t true --no-test true -l runs_r5 -s 23 -n fvq
FVQ=$(ls -td runs_r5/*fvq*/ 2>/dev/null | head -1 | sed 's:/$::')
if [ -n "$FVQ" ] && [ -d "$FVQ/checkpoints/last" ]; then
  stage faces_encdiff 100 python main_val.py -t true --no-test true \
    -l runs_r5 -n fld-encdiff \
    -b configs/demo/synthetic-faces-encdiff.yaml -s 23 --max_epochs 3 \
    "model.params.first_stage_config.params.ckpt_path=$FVQ/checkpoints/last"
  FLD=$(ls -td runs_r5/*fld-encdiff*/ 2>/dev/null | head -1 | sed 's:/$::')
  if [ -n "$FLD" ] && [ -d "$FLD/checkpoints/last" ]; then
    CKPT=$(ls -d "$FLD"/checkpoints/best_* 2>/dev/null | sort | tail -1)
    [ -z "$CKPT" ] && CKPT="$FLD/checkpoints/last"
    stage faces_swap 25 python scripts/generate_swap_from_ckpt.py \
      -b configs/demo/synthetic-faces-encdiff.yaml -r "$CKPT" \
      --ddim_steps 50 --num_samples 6 \
      --out "$ART/faces_swap"
    stage faces_recon 30 python scripts/recon_metrics.py \
      -b configs/demo/synthetic-faces-encdiff.yaml \
      -r "$CKPT" --ddim_steps 50 --batches 2 --batch_size 32 \
      --out "$ART/faces_recon.json"
    cp "$FLD"/record/*.csv "$ART/faces_record.csv" 2>/dev/null
    preserve "$FLD" faces_run
  fi
fi

# ---- 9. final bench preview -------------------------------------------------
bench_preview() {
  python bench.py | tail -1 > "$ART/bench_r5_final.json" \
    && cat "$ART/bench_r5_final.json"
}
stage bench_final 25 bench_preview

echo "[pipeline] round 5 complete $(date -u +%H:%M:%S), $(left_min)min left"
