#!/bin/bash
# Round-4 chip pipeline, phase A: the DCI/completeness north-star run.
#
# VERDICT r3 next #1-2: beat the 0.992 DCI bar and fix completeness 0.70 /
# the MIG regression *together*. Diagnosis (dci_protocol_floor.json): the
# residual gap is excess statistical dependence between code pairs — two
# codes splitting the scale factor plus an objhue x scale interaction leak.
# Fix: train the v4 480k benchmark with the pairwise unbiased-HSIC
# independence penalty on the concept scalars from the start
# (losses/indep.py, model.params.indep_type=hsic), monitoring
# DCI + completeness + MIG every 2 epochs.
#
# Stages:
#   1. v4_vq       — stage-1 VQ (launched manually before this script;
#                    stage just waits for and validates it)
#   2. v4h_encdiff — 24-epoch LDM + hsic lambda=2.0, post-fit full protocol
#   3. preserve    — metric JSONs + swap grids -> demo_artifacts/round4
set -u
cd /root/repo

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

# ---- stage 1: wait for the manually-launched v4 VQ run --------------------
if [ ! -f "$MARK/v4_vq.done" ]; then
  while ps -eo pid,args | grep "python main_val.py -b configs/demo/synthetic-shapes-v4-full-vq" \
        | grep -v grep >/dev/null; do sleep 60; done
  V4VQ=$(ls -td runs_full/*v4vq*/ 2>/dev/null | head -1 | sed 's:/$::')
  if [ -n "$V4VQ" ] && [ -d "$V4VQ/checkpoints/last" ]; then
    touch "$MARK/v4_vq.done"; echo "[pipeline] v4_vq: OK ($V4VQ)"
  else
    echo "[pipeline] v4_vq: checkpoint missing — relaunching"
    stage v4_vq python main_val.py -b configs/demo/synthetic-shapes-v4-full-vq.yaml \
      -t true --no-test true -l runs_full -s 23 -n v4vq
  fi
fi
V4VQ=$(ls -td runs_full/*v4vq*/ 2>/dev/null | head -1 | sed 's:/$::')

# ---- stage 2: v4 + hsic 480k run (24 epochs, full protocol at the end) ----
V4CFG=configs/demo/synthetic-shapes-v4-full-encdiff.yaml
if [ -n "$V4VQ" ] && [ -d "$V4VQ/checkpoints/last" ]; then
  stage v4h_encdiff train_resume runs_full v4hld -b "$V4CFG" -s 23 \
    "model.params.first_stage_config.params.ckpt_path=$V4VQ/checkpoints/last" \
    "model.params.indep_type=hsic" \
    "model.params.lambda_indep=2.0"
else
  echo "[pipeline] v4h_encdiff: SKIP (no VQ checkpoint)"
fi

V4H=$(ls -td runs_full/*v4hld*/ 2>/dev/null | head -1 | sed 's:/$::')
echo "[pipeline] v4h LDM run: $V4H"
preserve "$V4H" v4h_run

echo "[pipeline] phase A complete $(date -u +%H:%M:%S)"
