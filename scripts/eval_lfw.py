"""LFW attribute-regression driver.

Rebuild of ``eval_lfw.py:1-120``: loads the cond-stage encoder from a
trained checkpoint (native orbax dir or reference torch .ckpt, stripping the
``cond_stage_model.`` prefix exactly like ``eval_lfw.py:50-57``), encodes
the LFW attribute splits, trains a linear regression probe, and writes
per-epoch Pearson r / MSE results under ``<run>/regression/``.

Usage:
  python scripts/eval_lfw.py -b <config.yaml> -r <ckpt> --lfw_root data/lfw
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-b", "--base", required=True)
    ap.add_argument("-r", "--ckpt", required=True)
    ap.add_argument("--lfw_root", required=True)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--image_size", type=int, default=64,
                    help="encode resolution (match the model's input size)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="if >0 and lfw_root lacks lfw_attributes.txt, "
                         "write an N-image synthetic-faces LFW-format set "
                         "there first (zero-egress stand-in)")
    ap.add_argument("--use_tokens", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.synthetic and not os.path.exists(
            os.path.join(args.lfw_root, "lfw_attributes.txt")):
        from encdiff_tpu.data.synthetic_faces import write_lfw_format

        print(f"writing {args.synthetic}-image synthetic LFW set "
              f"-> {args.lfw_root}")
        write_lfw_format(args.lfw_root, image_size=args.image_size,
                         num=args.synthetic)

    import jax
    import jax.numpy as jnp

    from encdiff_tpu.core.config import instantiate_from_config, to_plain
    from encdiff_tpu.core.yamlcfg import OmegaConf
    from encdiff_tpu.evalx.lfw import eval_lfw
    from encdiff_tpu.train.checkpoint_io import load_model_variables

    config = OmegaConf.load(args.base)
    model_cfg = to_plain(config["model"])
    model = instantiate_from_config(
        {"target": model_cfg["target"], "params": model_cfg["params"]})
    variables, _ = load_model_variables(model, args.ckpt)
    cond_vars = {"params": variables["cond"]["params"],
                 "batch_stats": variables["cond"].get("batch_stats", {})}

    @jax.jit
    def encode(x):
        u = model.cond_encoding(cond_vars, jnp.asarray(x))
        if args.use_tokens:
            return model.cond_warp(cond_vars, u).reshape(u.shape[0], -1)
        return u

    results = eval_lfw(encode, args.lfw_root, epochs=args.epochs,
                       image_size=args.image_size)
    print(f"best epoch {results['best_epoch']}: "
          f"avg pearson r {results['best_avg_pearson_r']:.3f}, "
          f"avg MSE {results['best_avg_mse']:.3f}")
    out = args.out
    if out is None and os.path.isdir(os.path.dirname(args.ckpt)):
        run_dir = os.path.dirname(os.path.dirname(args.ckpt))
        os.makedirs(os.path.join(run_dir, "regression"), exist_ok=True)
        out = os.path.join(run_dir, "regression", "lfw_results.json")
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
