"""Batch swap generation over many experiment directories.

Rebuild of ``generate_swap_all.py:31-313``: walks a logs root, finds runs
matching a pattern, resolves each run's config + best/last checkpoint, and
invokes the single-checkpoint swap generation for every (run, ckpt) pair.
Paths come from the CLI, not hard-coded user directories (SURVEY.md §2.5).

Usage:
  python scripts/generate_swap_all.py --logs_root logs \
      [--pattern shapes3d] [--ckpt best_vae|best_dci|last] [--out swap_all]
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def find_runs(logs_root: str, pattern: str) -> list[str]:
    runs = []
    for d in sorted(glob.glob(os.path.join(logs_root, "*"))):
        if not os.path.isdir(d):
            continue
        if pattern and pattern not in os.path.basename(d):
            continue
        if os.path.isdir(os.path.join(d, "checkpoints")):
            runs.append(d)
    return runs


def resolve_ckpt(run_dir: str, which: str) -> str | None:
    ckdir = os.path.join(run_dir, "checkpoints")
    if which == "last":
        p = os.path.join(ckdir, "last")
        return p if os.path.exists(p) else None
    cands = sorted(glob.glob(os.path.join(ckdir, f"{which}*")))
    return cands[-1] if cands else None


def resolve_config(run_dir: str) -> str | None:
    cands = sorted(glob.glob(os.path.join(run_dir, "configs",
                                          "*-project.yaml")))
    return cands[-1] if cands else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logs_root", default="logs")
    ap.add_argument("--pattern", default="")
    ap.add_argument("--ckpt", default="last",
                    help="last | best_vae | best_dci | glob prefix")
    ap.add_argument("--out", default="swap_all")
    ap.add_argument("--num_samples", type=int, default=8)
    ap.add_argument("--ddim_steps", type=int, default=200)
    ap.add_argument("--eta", type=float, default=0.0)
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args()

    runs = find_runs(args.logs_root, args.pattern)
    print(f"found {len(runs)} runs under {args.logs_root!r}")
    for run in runs:
        cfg = resolve_config(run)
        ck = resolve_ckpt(run, args.ckpt)
        if cfg is None or ck is None:
            print(f"  skip {run}: config={bool(cfg)} ckpt={bool(ck)}")
            continue
        out = os.path.join(args.out, os.path.basename(run))
        cmd = [sys.executable, os.path.join(HERE, "generate_swap_from_ckpt.py"),
               "-b", cfg, "-r", ck, "--out", out,
               "--num_samples", str(args.num_samples),
               "--ddim_steps", str(args.ddim_steps), "--eta", str(args.eta)]
        print("  " + " ".join(cmd))
        if not args.dry_run:
            subprocess.run(cmd, check=False)


if __name__ == "__main__":
    main()
