"""Probe a trained EncDiff representation for cross-factor leakage.

Loads the cond-stage encoder from a checkpoint, encodes a controlled
factor grid (every value of --probe_factor x every value of
--response_factor, all other factors fixed at their middle), and reports
per-code variance decomposition: how much each code moves with the probe
factor vs the response factor. Used to turn a DCI importance-matrix leak
(e.g. "scale codes carry 2% objhue importance") into a mechanism
hypothesis before spending chip time on a renderer revision.

Runs fine on CPU (JAX_PLATFORMS=cpu): a few hundred images through the
small Encoder4 CNN.

Usage:
  JAX_PLATFORMS=cpu python scripts/probe_code_leak.py \
      -b configs/demo/synthetic-shapes-v4-full-encdiff.yaml \
      -r runs_full/<run>/checkpoints/best_dci_* \
      --probe_factor 2 --response_factor 3 --codes 19,3
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-b", "--base", required=True)
    ap.add_argument("-r", "--ckpt", required=True)
    ap.add_argument("--probe_factor", type=int, required=True,
                    help="factor whose influence we suspect leaks")
    ap.add_argument("--response_factor", type=int, required=True,
                    help="factor the leaky codes nominally encode")
    ap.add_argument("--codes", default=None,
                    help="comma list of code indices to report (default all)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from encdiff_tpu.core.config import instantiate_from_config, to_plain
    from encdiff_tpu.core.yamlcfg import OmegaConf
    from encdiff_tpu.train.checkpoint_io import load_model_variables

    config = OmegaConf.load(args.base)
    model_cfg = to_plain(config["model"])
    model = instantiate_from_config(
        {"target": model_cfg["target"], "params": model_cfg["params"]})
    gt = model.label_dataset
    assert gt is not None, "config needs eval_name"

    data = instantiate_from_config(to_plain(config["data"]))
    data.setup()
    images = data._raw("train").images

    sizes = list(gt.factor_sizes)
    bases = np.concatenate([np.cumprod(sizes[::-1])[::-1][1:], [1]])
    pf, rf = args.probe_factor, args.response_factor
    fixed = [s // 2 for s in sizes]

    grid = []
    for a in range(sizes[pf]):
        for b in range(sizes[rf]):
            f = list(fixed)
            f[pf], f[rf] = a, b
            grid.append(int(np.dot(f, bases)))
    batch = np.asarray(images[np.asarray(grid)])

    variables, _ = load_model_variables(model, args.ckpt)
    cond_vars = {"params": variables["cond"]["params"],
                 "batch_stats": variables["cond"].get("batch_stats", {})}
    enc = jax.jit(lambda x: model.cond_encoding(
        cond_vars, x.astype(jnp.float32) / 127.5 - 1.0))
    codes = np.asarray(enc(jnp.asarray(batch)))  # (P*R, 20)
    codes = codes.reshape(sizes[pf], sizes[rf], -1)

    sel = (list(range(codes.shape[-1])) if args.codes is None
           else [int(c) for c in args.codes.split(",")])
    total_var = codes.var(axis=(0, 1)) + 1e-12
    # variance of the probe-factor main effect (mean over response axis)
    probe_var = codes.mean(axis=1).var(axis=0)
    resp_var = codes.mean(axis=0).var(axis=0)
    report = {}
    for c in sel:
        report[str(c)] = {
            "total_var": float(total_var[c]),
            "probe_frac": float(probe_var[c] / total_var[c]),
            "response_frac": float(resp_var[c] / total_var[c]),
            "probe_profile": np.round(
                codes.mean(axis=1)[:, c], 4).tolist(),
        }
        print(f"code {c:2d}: var={total_var[c]:.4f} "
              f"probe(f{pf})={probe_var[c]/total_var[c]:.3f} "
              f"response(f{rf})={resp_var[c]/total_var[c]:.3f}")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
