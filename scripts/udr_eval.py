"""UDR across model seeds (the ``evaluation/udr/evaluate.py`` driver).

Given several trained run checkpoints of the SAME config (different seeds),
encodes the dataset with each and reports pairwise UDR disentanglement +
per-model scores.

Usage:
  python scripts/udr_eval.py -b <config.yaml> -r <ckpt1> <ckpt2> [...]
      [--num_data_points 1000] [--correlation lasso|spearman]
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
    ap.add_argument("-r", "--ckpts", nargs="+", required=True)
    ap.add_argument("--num_data_points", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=100)
    ap.add_argument("--correlation", default="lasso",
                    choices=["lasso", "spearman"])
    ap.add_argument("--activity", default="variance",
                    choices=["variance", "none"],
                    help="per-dim activity proxy passed as the protocol's "
                         "KL vector (udr.py:162-258 filter_low_kl). The "
                         "reference masks dead VAE dims by per-dim KL; "
                         "EncDiff's encoder is deterministic, so dead codes "
                         "(near-constant over the data) are masked by "
                         "max-normalized variance instead. Without a mask, "
                         "a 6-factor representation in 20 codes has a "
                         "structural UDR ceiling of ~6/20*0.9 = 0.27 — the "
                         "dilution measured in round 3 (udr_two_seed.json).")
    ap.add_argument("--activity_threshold", type=float, default=0.01,
                    help="mask codes whose activity is below this fraction "
                         "of the most active code's")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from encdiff_tpu.core.config import instantiate_from_config, to_plain
    from encdiff_tpu.core.yamlcfg import OmegaConf
    from encdiff_tpu.evalx.udr import compute_udr
    from encdiff_tpu.train.checkpoint_io import load_model_variables

    config = OmegaConf.load(args.base)
    model_cfg = to_plain(config["model"])
    model = instantiate_from_config(
        {"target": model_cfg["target"], "params": model_cfg["params"]})
    assert model.label_dataset is not None, \
        "config needs eval_name for the ground-truth dataset"

    data = instantiate_from_config(to_plain(config["data"]))
    data.setup()
    ds = data._raw("train")
    images = ds.images

    rep_fns = []
    activities = []
    act_rs = np.random.RandomState(17)
    act_idx = act_rs.randint(0, len(images), size=2048)
    for ck in args.ckpts:
        variables, _ = load_model_variables(model, ck)
        cond_vars = {"params": variables["cond"]["params"],
                     "batch_stats": variables["cond"].get("batch_stats", {})}
        enc = jax.jit(lambda x, cv=cond_vars: model.cond_encoding(
            cv, x.astype(jnp.float32) / 127.5 - 1.0))

        act = None
        if args.activity == "variance":
            sample = np.concatenate(
                [np.asarray(enc(jnp.asarray(images[act_idx[i:i + 256]])))
                 for i in range(0, len(act_idx), 256)], axis=0)
            var = sample.var(axis=0)
            act = var / max(var.max(), 1e-12)
            activities.append(act.tolist())

        def rep_fn(obs, enc=enc, act=act):
            codes = np.asarray(enc(jnp.asarray(
                images[np.asarray(obs, np.int64)])))
            return codes if act is None else (codes, act)

        rep_fns.append(rep_fn)

    scores = compute_udr(model.label_dataset, rep_fns,
                         np.random.RandomState(0),
                         batch_size=args.batch_size,
                         num_data_points=args.num_data_points,
                         correlation_matrix=args.correlation,
                         include_raw_correlations=False,
                         kl_filter_threshold=args.activity_threshold)
    if activities:
        scores["activity_vectors"] = activities
        scores["activity_threshold"] = args.activity_threshold
    print(json.dumps({"model_scores": scores["model_scores"],
                      "pairwise": scores["pairwise_disentanglement_scores"]},
                     indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(scores, f, indent=2)


if __name__ == "__main__":
    main()
