#!/bin/bash
# CelebA-scale eval chain (VERDICT r2 missing #3): after the faces EncDiff
# run finishes, produce the first end-to-end FID / TAD / swap-grid numbers
# at 256px with flash attention on.  Run AFTER round3_pipeline.sh's
# faces_encdiff stage (chip must be idle).
set -u
cd /root/repo
OUT=${FACES_EVAL_OUT:-demo_artifacts/round3/faces}
mkdir -p "$OUT"

FLDM=$(ls -td runs_faces/*encdiff*/ 2>/dev/null | head -1 | sed 's:/$::')
if [ -z "$FLDM" ] || [ ! -d "$FLDM/checkpoints" ]; then
  echo "no faces EncDiff run found"; exit 1
fi
CKPT=$(ls -d "$FLDM"/checkpoints/best_* 2>/dev/null | sort | tail -1)
[ -z "$CKPT" ] && CKPT="$FLDM/checkpoints/last"
CFG=configs/demo/synthetic-faces-encdiff.yaml
echo "faces ckpt: $CKPT"

# eval npz (test_celeba.npz format: data images + targ binary attributes)
NPZ=/tmp/encdiff_cache/test_faces.npz
[ -f "$NPZ" ] || python -c "
from encdiff_tpu.data.synthetic_faces import write_eval_npz
print(write_eval_npz('$NPZ', num=4096))"

python scripts/celeba_tad.py -b "$CFG" -r "$CKPT" --eval_npz "$NPZ" \
  --out "$OUT/tad.json" || echo "TAD failed"
python scripts/celeba_fid.py -b "$CFG" -r "$CKPT" --num 2048 \
  --batch_size 64 --ddim_steps 50 --out "$OUT/fid.json" || echo "FID failed"
python scripts/generate_swap_from_ckpt.py -b "$CFG" -r "$CKPT" \
  --num_samples 4 --ddim_steps 50 --out "$OUT/swap" || echo "swap failed"
echo "faces eval done -> $OUT"
