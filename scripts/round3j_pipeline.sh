#!/bin/bash
# Round-3 chip pipeline, pass 7 (j): after the v4 pipeline (r3h/g)
# finishes, evaluate abstract reasoning over the v4 checkpoint's TRAINED
# representations (the reference's HubEmbedding protocol — its TF1
# version is dead) against the onehot oracle upper bound, then chain
# into the faces pipeline (round3i).
set -u
cd /root/repo

while kill -0 "$(cat /tmp/r3h.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
while ps -eo pid,args | grep -E "python (main_val\.py|bench\.py|scripts/(celeba|generate|run_mcl)_)" \
      | grep -v grep >/dev/null; do sleep 30; done

MARK=runs_r3j/markers
LOGS=runs_r3j/logs
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
        echo "[pipeline] $name: STALLED (${age}s) — killing $pid"
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

# validate the BENCH_DDIM50 north-star row added this session (also what
# the driver will run at round end)
bench_check() {
  python bench.py | tail -1 > "$ART/bench_r03_preview2.json"
  cat "$ART/bench_r03_preview2.json"
  python - <<'EOF'
import json
d = json.load(open("demo_artifacts/round3/bench_r03_preview2.json"))
assert "ddim50_bs1024_samples_per_s" in d.get("extra", {}), d
EOF
}
stage bench_ddim50_check bench_check

V4LDM=$(ls -td runs_full/*v4ld*/ 2>/dev/null | head -1 | sed 's:/$::')
V4CFG=configs/demo/synthetic-shapes-v4-full-encdiff.yaml
if [ -n "$V4LDM" ] && [ -d "$V4LDM/checkpoints" ]; then
  BEST=$(ls -d "$V4LDM"/checkpoints/best_dci_* 2>/dev/null | sort | tail -1)
  [ -z "$BEST" ] && BEST="$V4LDM/checkpoints/last"
  stage v4_reasoning_rep python scripts/abstract_reasoning_eval.py \
    --dataset synthetic_shapes_full -b "$V4CFG" -r "$BEST" \
    --pgm_type easy_mixed --num_iterations 10 \
    --training_steps_per_iteration 100 --batch_size 32 \
    --output_dir "$ART/v4_reasoning_rep"
else
  echo "[pipeline] v4_reasoning_rep: SKIP (no v4 checkpoint)"
fi

# onehot oracle upper bound on the same PGM distribution (no model)
stage v4_reasoning_onehot python scripts/abstract_reasoning_eval.py \
  --dataset synthetic_shapes_full --embedding onehot \
  --pgm_type easy_mixed --num_iterations 10 \
  --training_steps_per_iteration 100 --batch_size 32 \
  --output_dir "$ART/v4_reasoning_onehot"

exec bash scripts/round3i_pipeline.sh
