"""Reconstruction-metric driver: DDIM-resample SSIM / LPIPS / MSE / PSNR.

Rebuild of ``recon_metrics.py:50-104`` as a CLI over the TPU-native stack:
loads a config + native checkpoint, streams the train split through
encode -> DDIM(200, eta=1) -> decode, and reports windowed SSIM, LPIPS
(flax VGG16 port), MSE and PSNR means.

Usage:
  python scripts/recon_metrics.py -b configs/latent-diffusion/shapes3d-vq-4-16-encdiff.yaml \
      -r logs/<run>/checkpoints/last [--batches 20] [--ddim_steps 200]
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
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--ddim_steps", type=int, default=200)
    ap.add_argument("--eta", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from encdiff_tpu.core.config import instantiate_from_config, to_plain
    from encdiff_tpu.core.yamlcfg import OmegaConf
    from encdiff_tpu.evalx.recon import recon_eval
    from encdiff_tpu.train.checkpoint_io import load_model_variables
    from encdiff_tpu.train.data import epoch_loader

    config = OmegaConf.load(args.base)
    model_cfg = to_plain(config["model"])
    model = instantiate_from_config(
        {"target": model_cfg["target"], "params": model_cfg["params"]})
    variables, scale_factor = load_model_variables(model, args.ckpt)

    data = instantiate_from_config(to_plain(config["data"]))
    data.setup()
    ds = data._raw("train")

    batches = []
    it = epoch_loader(ds, args.batch_size, shuffle=False)
    for i, b in enumerate(it):
        if i >= args.batches:
            break
        batches.append(np.asarray(b))

    scores = recon_eval(model, variables, batches, jax.random.PRNGKey(0),
                        ddim_steps=args.ddim_steps, eta=args.eta,
                        scale_factor=scale_factor)
    print(json.dumps(scores, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(scores, f, indent=2)


if __name__ == "__main__":
    main()
