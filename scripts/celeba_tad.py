"""CelebA TAD driver: attribute-AUROC disentanglement of the concept codes.

Rebuild of ``celeba_tad.py:1-129``: loads a trained model, encodes a CelebA
eval set (expects an npz with ``data`` images + ``targ`` 40-attr binary
labels, like the reference's ``test_celeba.npz``), computes all
latent-vs-attribute threshold AUROCs (one einsum on device instead of the
reference's triple loop), applies the MI-redundancy filter, and reports the
TAD score.

Usage:
  python scripts/celeba_tad.py -b <config.yaml> -r <ckpt> --eval_npz test_celeba.npz
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
    ap.add_argument("--eval_npz", required=True)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--use_tokens", action="store_true",
                    help="use warped (U*D) tokens instead of raw scalars, "
                         "matching the reference's cond_stage_model(x) codes")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from encdiff_tpu.core.config import instantiate_from_config, to_plain
    from encdiff_tpu.core.yamlcfg import OmegaConf
    from encdiff_tpu.evalx.tad import CELEBA_ATTRS, tad_score
    from encdiff_tpu.train.checkpoint_io import load_model_variables

    config = OmegaConf.load(args.base)
    model_cfg = to_plain(config["model"])
    model = instantiate_from_config(
        {"target": model_cfg["target"], "params": model_cfg["params"]})
    variables, _ = load_model_variables(model, args.ckpt)
    cond_vars = {"params": variables["cond"]["params"],
                 "batch_stats": variables["cond"].get("batch_stats", {})}

    f = np.load(args.eval_npz)
    data, targ = f["data"], f["targ"]
    attr_names = ([str(n) for n in f["attr_names"]]
                  if "attr_names" in f.files else CELEBA_ATTRS)
    if data.ndim == 4 and data.shape[1] == 3:   # NCHW -> NHWC
        data = np.transpose(data, (0, 2, 3, 1))
    targ = (np.asarray(targ) > 0).astype(np.float32)

    @jax.jit
    def encode(x):
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 127.5 - 1.0
        u = model.cond_encoding(cond_vars, x.astype(jnp.float32))
        if args.use_tokens:
            return model.cond_warp(cond_vars, u).reshape(u.shape[0], -1)
        return u

    codes = []
    for i in range(0, len(data), args.batch_size):
        codes.append(np.asarray(encode(jnp.asarray(data[i:i + args.batch_size]))))
    z = np.concatenate(codes, axis=0)

    result = tad_score(z, targ)
    print(f"TAD SCORE: {result['tad_score']:.4f}  "
          f"Attributes Captured: {result['attributes_captured']}")
    for i, name in enumerate(attr_names[:targ.shape[1]]):
        print(f"  {name:<22} lat {int(result['argmax_latent'][i]):>4} "
              f"max {result['max_auroc'][i]:.3f} "
              f"nd {result['norm_diffs'][i]:.3f}")
    if args.out:
        with open(args.out, "w") as fo:
            json.dump({"TAD SCORE: ": result["tad_score"],
                       "Attributes Captured: ":
                           result["attributes_captured"]}, fo)


if __name__ == "__main__":
    main()
