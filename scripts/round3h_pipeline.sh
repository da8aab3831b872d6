#!/bin/bash
# Round-3 chip pipeline, pass 5 (h): finish the faces eval chain's last
# step (swap grid — killed mid-run when the previous session ended), then
# run the pass-4 stages (scripts/round3g_pipeline.sh: bench preview + remat
# row -> v4 480k two-stage -> v4 MCL).  Serial; chip must be idle.
set -u
cd /root/repo
OUT=demo_artifacts/round3/faces

if ! ls "$OUT"/swap/*.png >/dev/null 2>&1; then
  FLDM=$(ls -td runs_faces/*encdiff*/ 2>/dev/null | head -1 | sed 's:/$::')
  CKPT=$(ls -d "$FLDM"/checkpoints/best_* 2>/dev/null | sort | tail -1)
  [ -z "$CKPT" ] && CKPT="$FLDM/checkpoints/last"
  timeout 3600 python scripts/generate_swap_from_ckpt.py \
    -b configs/demo/synthetic-faces-encdiff.yaml -r "$CKPT" \
    --num_samples 4 --ddim_steps 50 --out "$OUT/swap" || echo "swap failed"
fi

exec bash scripts/round3g_pipeline.sh
