#!/bin/bash
# Round-3 follow-up (pass 3b): once round3d_pipeline.sh exits, retry the two
# fisher_sm MCL matrix cells that crashed the tunnel's remote-compile helper
# at bs=128 (runs_r3d/logs/mcl_matrix.log: HTTP 500, tpu_compile_helper
# subprocess exit 1).  The Hutchinson grad-of-grad program needs ~2x the
# HLO-temp HBM of the single-grad step, so retry at bs=64 + accum 2 (same
# effective batch, LR rule unchanged), falling back to bs=32 + accum 4.
# run_mcl_sweep.py's resume logic re-runs ONLY the errored cells and
# replaces their stale rows.  Updates the preserved matrix CSV afterwards.
set -u
cd /root/repo
LOG=runs_r3d/logs/fisher_retry.log
mkdir -p runs_r3d/logs runs_r3d/markers
exec >>"$LOG" 2>&1

if [ -f runs_r3d/markers/fisher_retry.done ]; then
  echo "[followup] already done"; exit 0
fi

echo "[followup] waiting for round3d pipeline to exit $(date -u +%H:%M:%S)"
if [ -f /tmp/r3d_pipeline.pid ]; then
  while kill -0 "$(cat /tmp/r3d_pipeline.pid)" 2>/dev/null; do sleep 60; done
fi
# straggler chip jobs (anchored: the grep process itself never matches)
while ps -eo args | grep -E "^python (main_val\.py|bench\.py|scripts/)" \
      >/dev/null; do sleep 30; done
echo "[followup] chip idle $(date -u +%H:%M:%S)"

V3VQ=$(ls -td runs_full/*v3vq*/ 2>/dev/null | head -1 | sed 's:/$::')
V3LDM=$(ls -td runs_full/*v3ld*/ 2>/dev/null | head -1 | sed 's:/$::')
if [ -z "$V3VQ" ] || [ -z "$V3LDM" ]; then
  echo "[followup] no v3 runs found; abort"; exit 1
fi
BEST=$(ls -d "$V3LDM"/checkpoints/best_dci_* 2>/dev/null | sort | tail -1)
[ -z "$BEST" ] && BEST="$V3LDM/checkpoints/last"
echo "[followup] ckpt=$BEST vq=$V3VQ/checkpoints/last"

check_ok() {
  python - <<'EOF'
import csv, sys
rows = [r for r in csv.DictReader(open("runs_mcl_v3/mcl_sweep.csv"))
        if r["mcl_type"] == "fisher_sm"]
ok = len(rows) >= 2 and all(r.get("val/dci_disentanglement") for r in rows)
sys.exit(0 if ok else 1)
EOF
}

# Attempt 1 runs WITHOUT --skip_finale: after the fisher cells land, the
# sweep's finale re-scores the best cell of the WHOLE updated matrix with
# the full reference protocol (test(), 10k/5k GBT) — the round-3 headline
# MCL number.  The bs=32 fallback skips the finale (already scored).
FINALE=""
for BSAC in "64 2" "32 4"; do
  set -- $BSAC
  echo "[followup] fisher_sm retry at bs=$1 accum=$2 $(date -u +%H:%M:%S)"
  timeout 7200 python scripts/run_mcl_sweep.py \
    --base configs/demo/synthetic-shapes-v3-full-encdiff.yaml \
    --ckpt "$BEST" --vq_ckpt "$V3VQ/checkpoints/last" \
    --mcl_types fisher_sm --lambdas 0.01,0.05 --max_epochs 1 \
    -l runs_mcl_v3 --batch_size "$1" --accum "$2" $FINALE
  FINALE="--skip_finale"
  if check_ok; then echo "[followup] fisher_sm cells green"; break; fi
  echo "[followup] still failing at bs=$1"
done

cp runs_mcl_v3/mcl_sweep.csv demo_artifacts/round3/mcl_sweep.csv
cp runs_mcl_v3/mcl_best_full_protocol.json \
   demo_artifacts/round3/mcl_best_full_protocol.json 2>/dev/null || true
touch runs_r3d/markers/fisher_retry.done
echo "[followup] done $(date -u +%H:%M:%S)"
