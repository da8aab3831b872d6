#!/bin/bash
# Round-3 chip pipeline, pass 4 (g).  Runs after the faces eval chain:
#   1. bench_r03 preview      -> default bench.py (what the driver will run)
#   2. bench_remat            -> BENCH_REMAT=1 train row (HBM-bound step:
#                                trade saved-activation traffic for recompute)
#   3. v4_vq + v4_encdiff     -> 480k two-stage run on the v4 renderer (the
#                                targeted scale/shape-decoupling cell; the v3
#                                importance matrix shows scale<->shape as the
#                                only residual entanglement)
#   4. v4_mcl                 -> matrix-winner MCL fine-tune (infonce_mechgrad
#                                lambda=0.01, 1 epoch) from the v4 best ckpt
# Same stage/watchdog/resume pattern as round3d_pipeline.sh.
set -u
cd /root/repo

# wait for the standalone faces eval chain (and any other chip job)
while kill -0 "$(cat /tmp/r3g_faces_eval.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
while ps -eo pid,args | grep -E "python (main_val\.py|bench\.py|scripts/(celeba|generate)_)" \
      | grep -v grep >/dev/null; do sleep 15; done

MARK=runs_r3g/markers
LOGS=runs_r3g/logs
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
  cp "$run"/record.csv "$ART/$dest/record.csv" 2>/dev/null
  ls -t "$run"/images/*/*swap*.png 2>/dev/null | head -3 \
    | while read -r f; do cp "$f" "$ART/$dest/"; done
  cp "$run"/test_results.json "$ART/$dest/" 2>/dev/null
  return 0
}

# ---- stage 1+2: bench preview + remat row ---------------------------------
bench_preview() {
  python bench.py | tail -1 > "$ART/bench_r03_preview.json"
  cat "$ART/bench_r03_preview.json"
}
bench_remat() {
  BENCH_REMAT=1 BENCH_DDIM=0 python bench.py | tail -1 > "$ART/bench_remat.json"
  cat "$ART/bench_remat.json"
}
stage bench_r03_preview bench_preview
stage bench_remat bench_remat

# ---- stage 3: v4-renderer 480k two-stage run ------------------------------
stage v4_vq python main_val.py -b configs/demo/synthetic-shapes-v4-full-vq.yaml \
  -t true --no-test true -l runs_full -s 23 -n v4vq

V4VQ=$(ls -td runs_full/*v4vq*/ 2>/dev/null | head -1 | sed 's:/$::')
V4CFG=configs/demo/synthetic-shapes-v4-full-encdiff.yaml
if [ -n "$V4VQ" ] && [ -d "$V4VQ/checkpoints/last" ]; then
  stage v4_encdiff train_resume runs_full v4ld -b "$V4CFG" -s 23 \
    "model.params.first_stage_config.params.ckpt_path=$V4VQ/checkpoints/last"
else
  echo "[pipeline] v4_encdiff: SKIP (no v4 VQ checkpoint)"
fi

V4LDM=$(ls -td runs_full/*v4ld*/ 2>/dev/null | head -1 | sed 's:/$::')
echo "[pipeline] v4 LDM run: $V4LDM"
preserve "$V4LDM" v4_run

# ---- stage 4: matrix-winner MCL fine-tune from the v4 best ckpt -----------
if [ -n "${V4LDM:-}" ] && [ -d "$V4LDM/checkpoints" ]; then
  BEST=$(ls -d "$V4LDM"/checkpoints/best_dci_* 2>/dev/null | sort | tail -1)
  [ -z "$BEST" ] && BEST="$V4LDM/checkpoints/last"
  stage v4_mcl python scripts/run_mcl_sweep.py \
    --base "$V4CFG" \
    --ckpt "$BEST" --vq_ckpt "$V4VQ/checkpoints/last" \
    --mcl_types infonce_mechgrad --lambdas 0.01 --max_epochs 1 \
    -l runs_mcl_v4
  cp runs_mcl_v4/mcl_sweep.csv "$ART/mcl_v4.csv" 2>/dev/null
else
  echo "[pipeline] v4_mcl: SKIP (no v4 LDM checkpoint)"
fi

echo "[pipeline] all stages attempted $(date -u +%H:%M:%S)"
