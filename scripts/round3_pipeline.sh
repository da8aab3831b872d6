#!/bin/bash
# Round-3 chip pipeline: serial TPU jobs chained so they survive session
# restarts (launch once with nohup/setsid; stage markers make re-runs
# idempotent).  Order = VERDICT r2 "next round" value order:
#   1. v2-renderer 480k run (VQ + EncDiff)     -> DCI-parity benchmark
#   2. MCL matrix 5 types x {0.01,0.05}        -> 10-row mcl_sweep.csv
#   3. CelebA-scale faces run (flash attn ON)  -> first FID/TAD numbers
#   4. MFU / DDIM throughput sweep             -> BENCH_NOTES tables
# The chip serializes everything; one stage at a time.
set -u
cd /root/repo
# The chip serializes everything: if a bench or a previously-launched
# training job is still on it, wait (pattern match is for WAITING only —
# never kill by pattern).
wait_chip_idle() {
  while ps -eo pid,args | grep -E "python (main_val\.py|bench\.py)" \
        | grep -v grep >/dev/null; do sleep 15; done
}
wait_chip_idle
MARK=runs_r3/markers
LOGS=runs_r3/logs
mkdir -p "$MARK" "$LOGS" demo_artifacts/round3

STALL_S=1800  # tunnel-chip RPCs can hang forever; no log write in 30 min = stalled
stage() {  # stage <name> <cmd...>: skip if marker exists, mark on success.
  # Runs the command in background and watchdogs the log mtime: a hung
  # device RPC leaves the process asleep on a futex at 0% CPU (seen in the
  # MCL matrix, 57-min stall) — kill by PID and retry once (stages resume:
  # markers for train runs, CSV rows for the sweep).
  local name=$1; shift
  if [ -f "$MARK/$name.done" ]; then echo "[pipeline] $name: done, skip"; return 0; fi
  local attempt rc
  for attempt in 1 2; do
    echo "[pipeline] $name: start attempt $attempt $(date -u +%H:%M:%S)"
    touch "$LOGS/$name.log"  # reset mtime: stale pre-existing logs must not trip the watchdog
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

# ---- stage 1a: v2 VQ first stage (2 epochs, 480k v2 grid) ----------------
# Adopt a VQ run completed outside this controller (first launch used -n v2
# -> dir "<ts>_v2"): mark done if its checkpoint exists.
PREV=$(ls -td runs_full/*_v2 runs_full/*v2vq* 2>/dev/null | head -1)
if [ -n "$PREV" ] && [ -d "$PREV/checkpoints/last" ]; then
  touch "$MARK/v2_vq.done"
fi
stage v2_vq python main_val.py -b configs/demo/synthetic-shapes-v2-full-vq.yaml \
  -t true --no-test true -l runs_full -s 23 -n v2vq

V2VQ=$(ls -td runs_full/*_v2 runs_full/*v2vq* 2>/dev/null | head -1)
echo "[pipeline] v2 VQ run: $V2VQ"

# ---- stage 1b: v2 EncDiff (16 epochs, val every 2) -----------------------
if [ -n "$V2VQ" ] && [ -d "$V2VQ/checkpoints/last" ]; then
  stage v2_encdiff python main_val.py -b configs/demo/synthetic-shapes-v2-full-encdiff.yaml \
    -t true -l runs_full -s 23 -n v2ld \
    "model.params.first_stage_config.params.ckpt_path=$V2VQ/checkpoints/last"
else
  echo "[pipeline] v2_encdiff: SKIP (no VQ checkpoint)"
fi

V2LDM=$(ls -td runs_full/*v2ld*/ 2>/dev/null | head -1 | sed 's:/$::')
echo "[pipeline] v2 LDM run: $V2LDM"

# ---- stage 2: MCL matrix (5 loss types x 2 lambdas, 1 epoch each) --------
if [ -n "$V2LDM" ] && [ -d "$V2LDM/checkpoints" ]; then
  BEST=$(ls -d "$V2LDM"/checkpoints/best_dci_* 2>/dev/null | sort | tail -1)
  [ -z "$BEST" ] && BEST="$V2LDM/checkpoints/last"
  stage mcl_matrix python scripts/run_mcl_sweep.py \
    --base configs/demo/synthetic-shapes-v2-full-encdiff.yaml \
    --ckpt "$BEST" --vq_ckpt "$V2VQ/checkpoints/last" \
    --mcl_types nce_logistic,infonce_mechgrad,fisher_sm,denoise_sm,jacobian_vjp_infonce \
    --lambdas 0.01,0.05 --max_epochs 1 -l runs_mcl_v2
  cp runs_mcl_v2/mcl_sweep.csv demo_artifacts/round3/mcl_sweep.csv 2>/dev/null
else
  echo "[pipeline] mcl_matrix: SKIP (no v2 LDM checkpoint)"
fi

# ---- stage 3: CelebA-scale faces (256px, 4096-token flash attention) -----
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

# ---- stage 3b: faces FID / TAD / swap eval -------------------------------
if [ -f "$MARK/faces_encdiff.done" ]; then
  stage faces_eval bash scripts/round3_faces_eval.sh
else
  echo "[pipeline] faces_eval: SKIP (faces_encdiff not done)"
fi

# ---- stage 4: MFU / DDIM sweep (chip must be idle -> last) ---------------
stage bench_sweep python scripts/bench_sweep.py \
  --out demo_artifacts/round3/bench_sweep.csv \
  --train_batches 128,256,512 --ddim "200:128,200:512,50:512,50:1024"

# ---- stage 5: best-of-matrix MCL x 3 epochs from the v1 flagship ---------
# The matrix fine-tunes the v2 checkpoint (DCI base 0.848); the headline
# benchmark is the v1 flagship (0.907 -> 0.916 with 3-epoch
# infonce_mechgrad in round 2). Re-run the matrix's WINNING loss type at
# reference epoch count (3, run_mcl_parallel_amd.sh) from the v1 best-DCI
# checkpoint to push the headline number.
V1LDM=runs_full/2026-08-17T01-36-54_synthetic-shapes-full-encdiff
V1VQ=runs_full/2026-08-17T01-11-43_synthetic_shapes_full_vq
if [ -f runs_mcl_v2/mcl_sweep.csv ] && [ -d "$V1LDM/checkpoints/best_dci_013_0.9070" ]; then
  WIN=$(python -c "
import csv
rows=[r for r in csv.DictReader(open('runs_mcl_v2/mcl_sweep.csv'))
      if r.get('val/dci_disentanglement')]
rows.sort(key=lambda r: float(r['val/dci_disentanglement']), reverse=True)
print(rows[0]['mcl_type'], rows[0]['lambda']) if rows else print('')" )
  WTYPE=$(echo "$WIN" | cut -d' ' -f1); WLAM=$(echo "$WIN" | cut -d' ' -f2)
  if [ -n "$WTYPE" ]; then
    stage mcl_best_v1 python scripts/run_mcl_sweep.py \
      --base configs/demo/synthetic-shapes-full-encdiff.yaml \
      --ckpt "$V1LDM/checkpoints/best_dci_013_0.9070" \
      --vq_ckpt "$V1VQ/checkpoints/last" \
      --mcl_types "$WTYPE" --lambdas "$WLAM" --max_epochs 3 -l runs_mcl_best
    cp runs_mcl_best/mcl_sweep.csv demo_artifacts/round3/mcl_best_v1.csv 2>/dev/null
  fi
fi

# ---- stage 6 (opportunistic): extend the v2 run — DCI was still climbing
# at the 16-epoch cutoff (0.829 -> 0.848 over the last two evals).
if [ -n "${V2LDM:-}" ] && [ -d "$V2LDM/checkpoints/last" ]; then
  stage v2_extend python main_val.py -r "$V2LDM" -t true --max_epochs 28
fi

echo "[pipeline] all stages attempted $(date -u +%H:%M:%S)"
