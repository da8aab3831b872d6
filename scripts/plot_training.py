"""Training-curve comparison plots from Record CSVs.

Rebuild of ``plot_training.py:12-150``: reads pairs of loss CSVs (e.g.
with/without disentangled-concat), plots per-dataset loss curves, raw and
smoothed differences, into ``comparison_plots/``. Paths come from the CLI
instead of the reference's hard-coded user paths (SURVEY.md §2.5).

Usage: python scripts/plot_training.py --without a.csv [b.csv...]
       --with_ c.csv [d.csv...] --names shapes3d mpi3d ...
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np


def read_csv(path: str, loss_keys=("train/loss_simple", "train/loss",
                                   "train/loss_simple_step")):
    steps, losses = [], []
    with open(path) as f:
        reader = csv.DictReader(f)
        key = None
        for row in reader:
            if key is None:
                key = next((k for k in loss_keys if k in row and row[k]), None)
                if key is None:
                    continue
            if not row.get(key):
                continue
            steps.append(float(row["step"]))
            losses.append(float(row[key]))
    return np.asarray(steps), np.asarray(losses)


def smooth(x: np.ndarray, w: int = 51) -> np.ndarray:
    if len(x) < w:
        return x
    kernel = np.ones(w) / w
    return np.convolve(x, kernel, mode="valid")


def plot_comparison(csv_without: list[str], csv_with: list[str],
                    names: list[str], output_dir: str = "comparison_plots"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    for i, name in enumerate(names):
        s0, l0 = read_csv(csv_without[i])
        s1, l1 = read_csv(csv_with[i])
        fig, axes = plt.subplots(3, 1, figsize=(10, 12), sharex=True)
        axes[0].plot(s0, l0, label="without concat", lw=1.2, alpha=0.8)
        axes[0].plot(s1, l1, label="with concat", lw=1.2, alpha=0.8)
        axes[0].set_ylabel("loss_simple")
        axes[0].legend()
        axes[0].set_title(f"{name}: training loss")

        n = min(len(l0), len(l1))
        diff = l1[:n] - l0[:n]
        axes[1].plot(s0[:n], diff, lw=1.0, color="#2A9D8F")
        axes[1].axhline(0, color="k", lw=0.5)
        axes[1].set_ylabel("diff (with - without)")

        ds = smooth(diff)
        axes[2].plot(s0[:len(ds)], ds, lw=2.0, color="#E76F51")
        axes[2].axhline(0, color="k", lw=0.5)
        axes[2].set_ylabel("smoothed diff")
        axes[2].set_xlabel("step")

        out = os.path.join(output_dir, f"{name}_comparison.png")
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--without", nargs="+", required=True)
    ap.add_argument("--with_", nargs="+", required=True)
    ap.add_argument("--names", nargs="+", required=True)
    ap.add_argument("--output_dir", default="comparison_plots")
    args = ap.parse_args()
    plot_comparison(args.without, args.with_, args.names, args.output_dir)


if __name__ == "__main__":
    main()
