#!/bin/bash
# Round-4 chip pipeline, phase A take 2: TWO-PHASE flagship run.
#
# The from-scratch hsic run (demo_artifacts/round4/v4h_scratch_abandoned)
# proved the penalty's structural effect (completeness 0.78, MIG 0.31 at
# ep7 — both far above the r3 baseline's finals 0.69/0.117) but ALSO that
# applying it from step 0 fights factor discovery (FactorVAE stuck at 0.89
# vs the baseline's 1.0 by ep5; DCI 0.78@7 vs 0.9754@7). Two-phase design:
#   1. v4_base   — the exact r3 v4 recipe, 18 epochs (known to reach ~0.98
#                  fast-tier DCI), indep OFF; discovery undisturbed
#   2. v4_purify — RESUME the same run with hsic lambda=2 ON for 8 more
#                  epochs at full LR: prune the two-code scale split and
#                  the objhue x scale interaction leak from a locked-in
#                  representation. best_dci checkpointing keeps the base-
#                  era checkpoint if purification ever scores lower; the
#                  post-fit test() reports the full reference protocol.
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

V4VQ=$(ls -td runs_full/*v4vq*/ 2>/dev/null | head -1 | sed 's:/$::')
V4CFG=configs/demo/synthetic-shapes-v4-full-encdiff.yaml
if [ -z "$V4VQ" ] || [ ! -d "$V4VQ/checkpoints/last" ]; then
  echo "[pipeline] FATAL: no v4 VQ checkpoint"; exit 1
fi

# ---- stage 1: baseline (r3 recipe, indep OFF), 18 epochs -------------------
stage v4_base train_resume runs_full v4base -b "$V4CFG" -s 23 \
  --no-test true --max_epochs 18 \
  "model.params.first_stage_config.params.ckpt_path=$V4VQ/checkpoints/last"

V4B=$(ls -td runs_full/*v4base*/ 2>/dev/null | head -1 | sed 's:/$::')
if [ -z "$V4B" ] || [ ! -d "$V4B/checkpoints/last" ]; then
  echo "[pipeline] FATAL: baseline run missing"; exit 1
fi
# snapshot the pre-purify weights (purify overwrites checkpoints/last)
[ -d "$V4B/checkpoints/base18" ] || cp -r "$V4B/checkpoints/last" \
  "$V4B/checkpoints/base18"
preserve "$V4B" v4base_run

# ---- stage 2: purification resume (hsic ON, 8 epochs, full LR) -------------
stage v4_purify python main_val.py -r "$V4B" -t true --max_epochs 8 \
  "model.params.indep_type=hsic" "model.params.lambda_indep=2.0"

preserve "$V4B" v4purify_run

echo "[pipeline] phase A2 complete $(date -u +%H:%M:%S)"
