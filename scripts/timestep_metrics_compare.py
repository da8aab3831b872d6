"""Scan per-step metric JSONs and tabulate top-K runs.

Rebuild of ``timestep_metrics_compare.py:28-57``: walks experiment logdirs,
reads ``metrics_sin/{step}.json`` files, extracts FactorVAE eval accuracy +
DCI disentanglement, and writes a ranked CSV comparison table.

Usage: python scripts/timestep_metrics_compare.py LOGDIR [LOGDIR...]
       [--top_k 5] [--out comparison.csv]
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os


def extract_metrics(json_path: str) -> dict:
    try:
        with open(json_path) as f:
            data = json.load(f)
        return {
            "factor_vae_eval_accuracy":
                data.get("factor_VAE", {}).get("eval_accuracy"),
            "dci_disentanglement":
                data.get("dci", {}).get("disentanglement"),
            "mig": data.get("MIG", {}).get("discrete_mig"),
            "beta_vae": data.get("beta_VAE", {}).get("eval_accuracy"),
        }
    except (OSError, json.JSONDecodeError) as e:
        print(f"  warning: {json_path}: {e}")
        return {}


def process_experiment_dir(exp_dir: str) -> list[dict]:
    rows = []
    for jp in sorted(glob.glob(os.path.join(exp_dir, "metrics_sin", "*.json"))):
        step_str = os.path.splitext(os.path.basename(jp))[0]
        try:
            step = int("".join(c for c in step_str if c.isdigit()))
        except ValueError:
            continue
        m = extract_metrics(jp)
        if m.get("factor_vae_eval_accuracy") is None and \
                m.get("dci_disentanglement") is None:
            continue
        rows.append({"experiment": os.path.basename(exp_dir.rstrip("/")),
                     "step": step, **m})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdirs", nargs="+")
    ap.add_argument("--top_k", type=int, default=5)
    ap.add_argument("--out", default="timestep_metrics_comparison.csv")
    args = ap.parse_args()

    all_rows = []
    for d in args.logdirs:
        rows = process_experiment_dir(d)
        all_rows.extend(rows)
        top = sorted(rows,
                     key=lambda r: -(r.get("factor_vae_eval_accuracy") or 0))
        print(f"\n== {d} ({len(rows)} eval steps) — "
              f"top {args.top_k} by FactorVAE:")
        for r in top[:args.top_k]:
            print(f"  step {r['step']:>8}  "
                  f"fv={r.get('factor_vae_eval_accuracy')}  "
                  f"dci={r.get('dci_disentanglement')}")

    if all_rows:
        keys = list(all_rows[0].keys())
        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(all_rows)
        print(f"\nwrote {len(all_rows)} rows -> {args.out}")


if __name__ == "__main__":
    main()
