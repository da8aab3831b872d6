#!/bin/bash
# Round-3 chip pipeline, pass 6 (i): rebuild the CelebA-scale faces
# evidence lost in the box reboot and extend it with the two new drivers:
#   1. faces_vq + faces_encdiff  -> 256px two-stage retrain (flash attn ON)
#   2. faces_tad                 -> TAD on the binary-attribute eval npz
#   3. faces_probe_fid           -> learned-feature FID (attribute probe,
#                                   replaces the uncalibrated random-
#                                   features number)
#   4. faces_lfw                 -> FIRST end-to-end LFW attribute-
#                                   regression numbers (synthetic
#                                   LFW-format set, --synthetic)
#   5. faces_swap                -> 20-factor swap grid
# Runs after round3h/g finishes (waits for any chip job). Same
# stage/watchdog pattern as round3g_pipeline.sh.
set -u
cd /root/repo

# wait for the pass-4/5 pipeline SCRIPT to exit (not just its current
# python child — between-stage gaps would race), then belt-and-braces on
# any straggler chip job
while kill -0 "$(cat /tmp/r3h.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
while ps -eo pid,args | grep -E "python (main_val\.py|bench\.py|scripts/(celeba|generate|run_mcl)_)" \
      | grep -v grep >/dev/null; do sleep 30; done

MARK=runs_r3i/markers
LOGS=runs_r3i/logs
OUT=demo_artifacts/round3/faces
mkdir -p "$MARK" "$LOGS" "$OUT"

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

# ---- stage 0 (pass-8 extension): v4 MCL lambda/epoch extension -------------
# The v4 flagship + MCL(lambda=0.01, 1ep) sits at DCI 0.9835 full-protocol,
# 0.0085 from the reference's 0.992. Cheap cells (~3.8k steps each) that
# might close it: a wider lambda grid at 1 epoch (the sweep driver resumes
# runs_mcl_v4/mcl_sweep.csv, so lambda=0.01 is skipped and the finale
# re-scores the overall best), plus a 2-epoch run at the winner lambda.
V4CFG=configs/demo/synthetic-shapes-v4-full-encdiff.yaml
V4BEST=runs_full/2026-08-19T09-41-21_v4ld/checkpoints/best_dci_019_0.9840
V4VQ=runs_full/2026-08-19T09-11-20_v4vq/checkpoints/last
if [ -d "$V4BEST" ] && [ -d "$V4VQ" ]; then
  v4_mcl_ext() {
    python scripts/run_mcl_sweep.py --base "$V4CFG" \
      --ckpt "$V4BEST" --vq_ckpt "$V4VQ" \
      --mcl_types infonce_mechgrad --lambdas 0.005,0.01,0.02,0.05 \
      --max_epochs 1 -l runs_mcl_v4 || return 1
    cp runs_mcl_v4/mcl_sweep.csv demo_artifacts/round3/mcl_v4.csv
    cp runs_mcl_v4/mcl_best_full_protocol.json \
       demo_artifacts/round3/mcl_v4_full_protocol.json 2>/dev/null
    true
  }
  stage v4_mcl_ext v4_mcl_ext
  v4_mcl_ep2() {
    python scripts/run_mcl_sweep.py --base "$V4CFG" \
      --ckpt "$V4BEST" --vq_ckpt "$V4VQ" \
      --mcl_types infonce_mechgrad --lambdas 0.01 \
      --max_epochs 2 -l runs_mcl_v4ep2 || return 1
    cp runs_mcl_v4ep2/mcl_sweep.csv demo_artifacts/round3/mcl_v4_ep2.csv
    cp runs_mcl_v4ep2/mcl_best_full_protocol.json \
       demo_artifacts/round3/mcl_v4_ep2_full_protocol.json 2>/dev/null
    true
  }
  stage v4_mcl_ep2 v4_mcl_ep2
else
  echo "[pipeline] v4_mcl_ext: SKIP (v4 checkpoints missing)"
fi

# ---- stage 1: faces two-stage retrain -------------------------------------
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

FLDM=$(ls -td runs_faces/*encdiff*/ 2>/dev/null | head -1 | sed 's:/$::')
if [ -z "$FLDM" ] || [ ! -d "$FLDM/checkpoints" ]; then
  echo "[pipeline] no faces EncDiff checkpoint — stopping"; exit 1
fi
CKPT=$(ls -d "$FLDM"/checkpoints/best_* 2>/dev/null | sort | tail -1)
[ -z "$CKPT" ] && CKPT="$FLDM/checkpoints/last"
CFG=configs/demo/synthetic-faces-encdiff.yaml
echo "[pipeline] faces ckpt: $CKPT"

# ---- stage 2: TAD ----------------------------------------------------------
NPZ=/tmp/encdiff_cache/test_faces.npz
ensure_npz() {
  [ -f "$NPZ" ] && return 0
  python -c "
from encdiff_tpu.data.synthetic_faces import write_eval_npz
print(write_eval_npz('$NPZ', num=4096))"
}
faces_tad() {
  ensure_npz || return 1
  python scripts/celeba_tad.py -b "$CFG" -r "$CKPT" --eval_npz "$NPZ" \
    --out "$OUT/tad.json"
}
stage faces_tad faces_tad

# ---- stage 3: learned-feature FID (attribute probe) ------------------------
faces_probe_fid() {
  ensure_npz || return 1
  python scripts/celeba_fid.py -b "$CFG" -r "$CKPT" --num 2048 \
    --batch_size 64 --ddim_steps 50 --feature_probe_npz "$NPZ" \
    --out "$OUT/fid_probe.json"
}
stage faces_probe_fid faces_probe_fid

# ---- stage 4: LFW attribute regression (first end-to-end numbers) ----------
faces_lfw() {
  python scripts/eval_lfw.py -b "$CFG" -r "$CKPT" \
    --lfw_root /tmp/encdiff_cache/syn_lfw --synthetic 4000 \
    --image_size 256 --out "$OUT/lfw.json"
}
stage faces_lfw faces_lfw

# ---- stage 5: swap grid -----------------------------------------------------
if ! ls "$OUT"/swap/*.png >/dev/null 2>&1; then
  stage faces_swap python scripts/generate_swap_from_ckpt.py -b "$CFG" \
    -r "$CKPT" --num_samples 4 --ddim_steps 50 --out "$OUT/swap"
else
  echo "[pipeline] faces_swap: grid already present, skip"
fi

echo "[pipeline] all stages attempted $(date -u +%H:%M:%S)"
