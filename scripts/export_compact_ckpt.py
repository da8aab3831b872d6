"""Export a git-committable compact checkpoint from an orbax run checkpoint.

This box loses every gitignored ``runs_*/`` tree on reboot, so any study
that needs a trained flagship (MCL fine-tunes, swap/probe/TAD/UDR evals)
previously began with a multi-hour retrain. This script snapshots the model
weights (no optimizer state) as one fp16 ``.npz`` small enough for
``demo_artifacts/`` — consumable by every eval script and by
``--resume_ckpt`` (see ``encdiff_tpu/core/compact_ckpt.py``).

Usage:
  python scripts/export_compact_ckpt.py -r runs_full/<run>/checkpoints/last \
      --out demo_artifacts/round4/flagship_fp16.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-r", "--ckpt", required=True,
                    help="orbax checkpoint dir (e.g. <run>/checkpoints/last)")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--slim", action="store_true",
                    help="drop the EMA parameter copy (halves LDM archives; "
                         "raw params reproduce the in-training eval metrics)")
    args = ap.parse_args()

    from encdiff_tpu.core.checkpoints import restore_pytree
    from encdiff_tpu.core.compact_ckpt import save_compact, save_compact_vq

    tree = restore_pytree(os.path.abspath(args.ckpt))
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    state = tree.get("state", tree)
    if "gen_params" in state:
        # VQ-GAN trainer layout (gen/disc two-optimizer state)
        save_compact_vq(args.out, state)
    else:
        if args.slim and isinstance(state, dict):
            state = {k: v for k, v in state.items() if k != "ema"}
        save_compact(args.out, state, tree["frozen"])
    mb = os.path.getsize(args.out) / 1e6
    print(f"[export] {args.out} ({mb:.1f} MB) from {args.ckpt}")


if __name__ == "__main__":
    main()
