"""CelebA FID: real images vs DDIM samples.

Rebuild of ``celeba_fid.py:26-229``: loads a trained EncDiff model, samples
N images via DDIM, computes InceptionV3 pool3 activations for real and
generated sets, and reports the Fréchet distance. Pass --inception_weights
to load a pt_inception state_dict (scores are uncalibrated without it).

Usage:
  python scripts/celeba_fid.py -b <config.yaml> -r <ckpt> [--num 5000]
      [--batch_size 64] [--ddim_steps 200] [--inception_weights pt.pth]
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
    ap.add_argument("--num", type=int, default=5000)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--ddim_steps", type=int, default=200)
    ap.add_argument("--eta", type=float, default=1.0)
    ap.add_argument("--inception_weights", default=None)
    ap.add_argument("--feature_probe_npz", default=None,
                    help="eval npz (data images + targ binary attributes, "
                         "the celeba_tad.py input format): train an "
                         "attribute-supervised probe and compute the "
                         "Fréchet distance in its learned feature space "
                         "instead of random-init Inception features")
    ap.add_argument("--probe_steps", type=int, default=1500)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from encdiff_tpu.core.config import instantiate_from_config, to_plain
    from encdiff_tpu.core.schedules import DDIMSchedule
    from encdiff_tpu.core.yamlcfg import OmegaConf
    from encdiff_tpu.diffusion import ddim as ddim_lib
    from encdiff_tpu.evalx import fid as fid_lib
    from encdiff_tpu.train.checkpoint_io import load_model_variables

    config = OmegaConf.load(args.base)
    model_cfg = to_plain(config["model"])
    model = instantiate_from_config(
        {"target": model_cfg["target"], "params": model_cfg["params"]})
    variables, sf = load_model_variables(model, args.ckpt)

    data = instantiate_from_config(to_plain(config["data"]))
    data.setup()
    ds = data._raw("train")
    rs = np.random.RandomState(0)
    real_idx = rs.choice(len(ds), size=args.num, replace=False)
    real = ds.batch_uint8(real_idx)

    fs_vars = variables["first_stage"]
    cond_vars = {"params": variables["cond"]["params"],
                 "batch_stats": variables["cond"].get("batch_stats", {})}
    unet_vars = ({"params": variables["ema"]} if variables["ema"] is not None
                 else {"params": variables["unet"]["params"]})
    dsched = DDIMSchedule.create(model.schedule, args.ddim_steps, eta=args.eta)

    @jax.jit
    def sample_batch(x, rng):
        x = x.astype(jnp.float32) / 127.5 - 1.0
        u = model.cond_encoding(cond_vars, x)
        tokens = model.cond_warp(cond_vars, u)
        if tokens.ndim == 3:
            tokens = tokens.reshape(tokens.shape[0], -1)
        denoise = lambda xx, tt: model.apply_model(unet_vars, xx, tt, tokens)
        shape = (x.shape[0], model.image_size, model.image_size,
                 model.channels)
        s, _ = ddim_lib.ddim_sample(dsched, denoise, shape, rng)
        return model.decode_first_stage(fs_vars, s, scale_factor=sf)

    gen = []
    for i in range(0, args.num, args.batch_size):
        chunk = real[i:i + args.batch_size]
        out = np.asarray(sample_batch(jnp.asarray(chunk),
                                      jax.random.PRNGKey(i)))
        gen.append(np.clip((out + 1) / 2, 0, 1))
        if (i // args.batch_size) % 10 == 0:
            print(f"sampled {i + len(chunk)}/{args.num}")
    gen = np.concatenate(gen, axis=0)

    real_f = real.astype(np.float32) / 255.0
    if args.inception_weights:
        import torch

        fvars = fid_lib.init_fid_variables(jax.random.PRNGKey(0))
        sd = torch.load(args.inception_weights, map_location="cpu")
        fvars = fid_lib.load_torch_fid_inception(fvars, sd)
        score = fid_lib.compute_fid(fvars, real_f, gen,
                                    batch_size=args.batch_size)
        result = {"fid": score, "num": args.num, "mode": "inception",
                  "calibrated": True}
    elif args.feature_probe_npz:
        f = np.load(args.feature_probe_npz)
        print(f"training attribute probe on {len(f['data'])} images "
              f"x {f['targ'].shape[1]} attributes ({args.probe_steps} steps)")
        pvars, info = fid_lib.train_attribute_probe(
            f["data"], f["targ"], steps=args.probe_steps)
        print(f"probe holdout AUROC {info['holdout_auc']:.4f}")
        score = fid_lib.compute_probe_fid(
            pvars, real_f, gen, batch_size=args.batch_size,
            num_attrs=int(f["targ"].shape[1]))
        result = {"fid": score, "num": args.num, "mode": "attribute_probe",
                  "calibrated": False, "probe": info}
    else:
        print("WARNING: no --inception_weights / --feature_probe_npz; "
              "FID is uncalibrated (random-init Inception features)")
        fvars = fid_lib.init_fid_variables(jax.random.PRNGKey(0))
        score = fid_lib.compute_fid(fvars, real_f, gen,
                                    batch_size=args.batch_size)
        result = {"fid": score, "num": args.num, "mode": "random_features",
                  "calibrated": False}
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
