"""Protocol-floor study: what the exact DCI protocol scores a representation
with KNOWN (zero or probe-measured) true cross-factor mixing.

Companion to `scripts/dci_seed_study.py` (which re-scores a trained
checkpoint across eval seeds) for the case where no checkpoint is on disk:
instead of a trained encoder, the representation is SYNTHESIZED with the
v4 flagship's code->factor allocation (read from the committed DCI
importance matrix, `demo_artifacts/round3/v4_run/90000.json`) and an
exactly-controlled amount of true leakage:

  cell "pure":  code_i = zscore(factor_{p(i)}) + sigma*eps        (zero true
                mixing; dead rows in the matrix stay pure-noise codes)
  cell "leak":  same, plus alpha*zscore(objhue) on the two scale codes with
                alpha set so the leak is 0.2% of code variance -- the level
                `scripts/probe_code_leak.py` measured on the real v4 encoder.
  cell "sharednoise": "pure" but with the observation noise CORRELATED
                across codes (rho=0.3 shared component) -- a real CNN
                encoder's codes share features, so their errors co-move;
                a factor model can then harvest denoising signal from
                other factors' codes, which is spurious importance the
                protocol cannot distinguish from true mixing.
  cell "leak+sharednoise": both effects -- the closest synthetic analogue
                of the trained v4 encoder.
  cell "xleak": INTERACTION leak: alpha*zscore(objhue)*zscore(scale) on the
                two scale codes. Zero main effect, so invisible to
                probe_code_leak's fixed-other-factors grid, but real
                predictive signal a GBT can harvest -- the candidate
                mechanism once the pure/leak/sharednoise cells all score
                ~1.0. --xleak_var sets its variance share.

Both cells are scored with the UNMODIFIED reference protocol
(`evaluation/metrics/dci.py:35-135` semantics: 10k/5k points, sklearn
GradientBoostingClassifier with default estimators and random_state=None)
across several protocol seeds. If a zero-mixing representation shaped like
the flagship scores ~0.98x rather than 1.0, the flagship's measured
0.9835-vs-0.992 gap sits at the protocol's own floor, not in the model.

Pure CPU/sklearn, no checkpoint or chip needed. ONE command regenerates the
committed artifact (the full cell grid incl. the interaction dose-response;
--out merges, so partial runs resume and extra seeds append):

  JAX_PLATFORMS=cpu python scripts/dci_protocol_floor.py \
      --seeds 0,1,2,3 --cells pure,leak+sharednoise,sharednoise \
      --xleak_vars 0.01,0.02 \
      --out demo_artifacts/round3/dci_protocol_floor.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from encdiff_tpu.evalx.ground_truth.core import GroundTruthData
from encdiff_tpu.evalx.metrics.dci import compute_dci

# Shapes3D factor grid (shapes3d.py:44 parity; matches SyntheticShapes3DFull)
FACTOR_SIZES = [10, 10, 10, 8, 4, 15]
OBJHUE, SCALE = 2, 3
V4_MATRIX = "demo_artifacts/round3/v4_run/90000.json"
DEAD_ROW_MAX = 0.01  # importance below this = code carries no factor


class FactorIndexData(GroundTruthData):
    """GroundTruthData whose observations are the flat factor index — the
    reference's own index-lookup trick (`main_val.py:55-56`), letting the
    representation be a deterministic function of the index."""

    def __init__(self, factor_sizes):
        self.factor_sizes = list(factor_sizes)
        self._bases = np.array(
            [int(np.prod(factor_sizes[i + 1:])) for i in range(len(factor_sizes))],
            dtype=np.int64)

    @property
    def num_factors(self):
        return len(self.factor_sizes)

    @property
    def factors_num_values(self):
        return list(self.factor_sizes)

    @property
    def observation_shape(self):
        return (1,)

    def sample_factors(self, num, random_state):
        return np.stack([random_state.randint(s, size=num)
                         for s in self.factor_sizes], axis=1)

    def sample_observations_from_factors(self, factors, random_state):
        return factors @ self._bases


def build_rep_fn(importance_matrix, sigma, leak_alpha, noise_seed,
                 shared_rho=0.0, xleak_alpha=0.0):
    """Deterministic 'encoder': flat index -> 20 synthetic codes."""
    m = np.asarray(importance_matrix)
    primary = m.argmax(1)
    live = m.max(1) >= DEAD_ROW_MAX
    scale_codes = [i for i in range(len(primary))
                   if live[i] and primary[i] == SCALE]
    sizes = np.array(FACTOR_SIZES, dtype=np.float64)
    bases = np.array([int(np.prod(FACTOR_SIZES[i + 1:]))
                      for i in range(len(FACTOR_SIZES))], dtype=np.int64)
    n_total = int(np.prod(FACTOR_SIZES))
    # fixed noise table = the fixed encoder's per-image response (float32,
    # 480k x 20 = 38 MB); regenerated identically for every protocol seed
    rng = np.random.default_rng(noise_seed)
    noise = rng.standard_normal((n_total, m.shape[0]), dtype=np.float32)
    if shared_rho:
        shared = rng.standard_normal((n_total, 1), dtype=np.float32)
        noise = (np.sqrt(1.0 - shared_rho) * noise
                 + np.sqrt(shared_rho) * shared)

    def zscore(vals, k):
        return (vals - (k - 1) / 2.0) / np.sqrt((k * k - 1) / 12.0)

    def rep_fn(obs):
        idx = np.asarray(obs, dtype=np.int64).reshape(-1)
        factors = (idx[:, None] // bases[None, :]) % sizes.astype(np.int64)
        z = np.stack([zscore(factors[:, j], FACTOR_SIZES[j])
                      for j in range(len(FACTOR_SIZES))], axis=1)
        codes = sigma * noise[idx]
        for i in range(m.shape[0]):
            if live[i]:
                codes[:, i] += z[:, primary[i]]
        if leak_alpha:
            for i in scale_codes:
                codes[:, i] += leak_alpha * z[:, OBJHUE]
        if xleak_alpha:
            for i in scale_codes:
                codes[:, i] += xleak_alpha * z[:, OBJHUE] * z[:, SCALE]
        return codes

    return rep_fn, {"primary": primary.tolist(), "live": live.tolist(),
                    "scale_codes": scale_codes}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0,1,2,3")
    ap.add_argument("--sigma", type=float, default=0.05,
                    help="observation-noise std (z-scored factor units); "
                         "0.05 reproduces the flagship's ~0.999 "
                         "informativeness_test")
    ap.add_argument("--leak_var", type=float, default=0.002,
                    help="true leak as a fraction of code variance for the "
                         "'leak' cell (probe_code_leak measured 0.002)")
    ap.add_argument("--cells", default="pure,leak,sharednoise,leak+sharednoise")
    ap.add_argument("--shared_rho", type=float, default=0.3,
                    help="shared-noise variance fraction for *sharednoise "
                         "cells")
    ap.add_argument("--xleak_var", type=float, default=0.02,
                    help="true interaction-leak variance fraction for the "
                         "bare 'xleak' cell (2% ~ the off-primary GBT "
                         "importance share measured on v4's scale codes)")
    ap.add_argument("--xleak_vars", default=None,
                    help="comma list of interaction-leak doses; expands to "
                         "one 'xleak@<v>' cell per dose with per-cell "
                         "alpha, so the full dose-response regenerates "
                         "from ONE command (e.g. --xleak_vars 0.01,0.02)")
    ap.add_argument("--num_train", type=int, default=10000)
    ap.add_argument("--num_test", type=int, default=5000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--overwrite", action="store_true",
                    help="start --out from scratch; the default MERGES into "
                         "an existing file (new cells added, new seeds "
                         "appended to existing cells, unknown top-level "
                         "keys like 'note' preserved)")
    args = ap.parse_args()

    matrix = json.load(open(V4_MATRIX))["dci"]["importance_matrix"]
    data = FactorIndexData(FACTOR_SIZES)
    # signal variance is ~1 (z-scored factor), so leak_var fraction f needs
    # alpha^2 = f * (1 + sigma^2) / (1 - f)
    total = 1.0 + args.sigma ** 2
    alpha = float(np.sqrt(args.leak_var * total / (1.0 - args.leak_var)))

    def xvar_to_alpha(v):
        return float(np.sqrt(v * total / (1.0 - v)))

    results = {"sigma": args.sigma, "leak_var": args.leak_var,
               "leak_alpha": alpha, "shared_rho": args.shared_rho,
               "num_train": args.num_train,
               "num_test": args.num_test, "matrix_source": V4_MATRIX,
               "cells": {}}
    if args.out and os.path.exists(args.out) and not args.overwrite:
        prev = json.load(open(args.out))
        prev.setdefault("cells", {})
        prev.update({k: v for k, v in results.items() if k != "cells"})
        results = prev

    # cell name -> interaction-leak variance (None = no xleak term)
    cells: list[tuple[str, float | None]] = []
    for cell in args.cells.split(","):
        cells.append((cell, args.xleak_var if cell == "xleak" else None))
    if args.xleak_vars:
        for v in args.xleak_vars.split(","):
            cells.append((f"xleak@{v}", float(v)))
    doses = sorted({v for _, v in cells if v is not None})
    if doses:
        results["xleak_doses"] = doses

    seeds = [int(s) for s in args.seeds.split(",")]
    for cell, xvar in cells:
        xalpha = xvar_to_alpha(xvar) if xvar is not None else 0.0
        rep_fn, meta = build_rep_fn(
            matrix, args.sigma,
            alpha if "leak" in cell.replace("xleak", "") else 0.0,
            noise_seed=1234,
            shared_rho=args.shared_rho if "sharednoise" in cell else 0.0,
            xleak_alpha=xalpha)
        if xvar is not None:
            meta = {**meta, "xleak_var": xvar, "xleak_alpha": xalpha}
        rows = list(results["cells"].get(cell, {}).get("rows", []))
        done_seeds = {r["seed"] for r in rows}
        for seed in seeds:
            if seed in done_seeds:
                print(json.dumps({"cell": cell, "seed": seed,
                                  "skip": "already in --out"}), flush=True)
                continue
            t0 = time.time()
            scores = compute_dci(data, rep_fn, np.random.RandomState(seed),
                                 num_train=args.num_train,
                                 num_test=args.num_test)
            row = {"seed": seed,
                   "disentanglement": scores["disentanglement"],
                   "completeness": scores["completeness"],
                   "informativeness_test": scores["informativeness_test"],
                   "seconds": round(time.time() - t0, 1)}
            rows.append(row)
            print(json.dumps({"cell": cell, **row}), flush=True)
            _dump(args.out, results, cell, meta, rows)
        _dump(args.out, results, cell, meta, rows)
    for cell, c in results["cells"].items():
        print(json.dumps({"cell": cell, "dci_mean": c["dci_mean"],
                          "dci_std": c["dci_std"],
                          "n_seeds": len(c["rows"])}), flush=True)


def _dump(out, results, cell, meta, rows):
    rows = sorted(rows, key=lambda r: r["seed"])
    d = np.array([r["disentanglement"] for r in rows])
    results["cells"][cell] = {
        "meta": meta, "rows": list(rows),
        "dci_mean": float(d.mean()),
        "dci_std": float(d.std(ddof=1 if len(d) > 1 else 0)),
        "dci_min": float(d.min()), "dci_max": float(d.max())}
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
