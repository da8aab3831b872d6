"""Latent-swap grids + factor-correspondence analysis from one checkpoint.

Rebuild of ``generate_swap_from_ckpt.py:1-279``: loads a trained EncDiff
model (native orbax dir or reference torch .ckpt), runs the all-factor
latent-swap DDIM generation (folded into ONE batched sampler run instead of
the reference's 20 sequential chains), saves the full grid and per-factor
pages, and reports which image regions each factor controls via per-factor
pixel-difference energy (the reference's "factor correspondence" analysis).

Usage:
  python scripts/generate_swap_from_ckpt.py -b <config.yaml> -r <ckpt> \
      [--num_samples 8] [--ddim_steps 200] [--eta 0] [--out swap_out]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def factor_correspondence(base: np.ndarray, swapped: np.ndarray) -> dict:
    """Per-factor pixel-difference energy: how much of the image each factor
    controls (generate_swap_from_ckpt.py analysis tail)."""
    u, b = swapped.shape[0] // base.shape[0], base.shape[0]
    out = {}
    for cdx in range(u):
        blk = swapped[cdx * b:(cdx + 1) * b]
        diff = np.abs(blk - base).mean(axis=(0, 3))  # (H, W)
        out[f"factor_{cdx:02}"] = {
            "mean_abs_diff": float(diff.mean()),
            "max_abs_diff": float(diff.max()),
            "active_fraction": float((diff > 0.05).mean()),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-b", "--base", required=True)
    ap.add_argument("-r", "--ckpt", required=True)
    ap.add_argument("--num_samples", type=int, default=8)
    ap.add_argument("--ddim_steps", type=int, default=200)
    ap.add_argument("--eta", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="swap_out")
    args = ap.parse_args()

    import jax

    from encdiff_tpu.core.config import instantiate_from_config, to_plain
    from encdiff_tpu.core.yamlcfg import OmegaConf
    from encdiff_tpu.evalx import swap as swap_lib
    from encdiff_tpu.train.callbacks import save_image_grid
    from encdiff_tpu.train.checkpoint_io import load_model_variables
    from encdiff_tpu.train.data import epoch_loader

    config = OmegaConf.load(args.base)
    model_cfg = to_plain(config["model"])
    model = instantiate_from_config(
        {"target": model_cfg["target"], "params": model_cfg["params"]})
    variables, sf = load_model_variables(model, args.ckpt)
    model.scale_factor = sf

    data = instantiate_from_config(to_plain(config["data"]))
    data.setup()
    ds = data._raw("train")
    rs = np.random.RandomState(args.seed)
    idx = rs.choice(len(ds), size=args.num_samples, replace=False)
    if hasattr(ds, "batch_uint8"):
        batch = ds.batch_uint8(idx).astype(np.float32) / 127.5 - 1.0
    else:
        batch = np.stack([np.asarray(ds[int(i)]["image"]) for i in idx])

    x = np.asarray(swap_lib.swap_sample(
        model, variables, batch, jax.random.PRNGKey(args.seed),
        ddim_steps=args.ddim_steps, eta=args.eta))

    os.makedirs(args.out, exist_ok=True)
    save_image_grid(np.concatenate([batch, x], axis=0),
                    os.path.join(args.out, "swap_full_grid.png"),
                    nrow=args.num_samples)
    n_units = x.shape[0] // args.num_samples
    for cdx in range(n_units):
        blk = x[cdx * args.num_samples:(cdx + 1) * args.num_samples]
        save_image_grid(np.concatenate([batch, blk], axis=0),
                        os.path.join(args.out, f"factor_{cdx:02}.png"),
                        nrow=args.num_samples)

    corr = factor_correspondence(batch, x)
    with open(os.path.join(args.out, "factor_correspondence.json"), "w") as f:
        json.dump(corr, f, indent=2)
    print(f"wrote {n_units}-factor swap grids + correspondence -> {args.out}")


if __name__ == "__main__":
    main()
