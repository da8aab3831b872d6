"""Protocol-noise study: full-protocol DCI across evaluation seeds.

The reference's headline bar (DCI 0.992, `run_shape3d_mcl_quick.sh:19`) is
a single draw of a stochastic protocol: 10k/5k points sampled with a seed,
and sklearn `GradientBoostingClassifier()` left at `random_state=None`
(both in the reference's `evaluation/metrics/dci.py` and here). This
script re-scores ONE fixed checkpoint N times with different protocol
seeds to measure that noise directly — turning "0.98x vs 0.992" into a
statement about whether the gap clears the protocol's own spread.

Runs fine on CPU (`JAX_PLATFORMS=cpu`): the representation is Encoder4's
(B, latent_unit) scalars, on-demand over the sampled indices only (the
index-lookup trick; ~15k images/seed through a small CNN). The GBT fit
dominates (~18 min/seed on a 1-core host, `evalx/metrics/dci.py` note).

Usage:
  JAX_PLATFORMS=cpu nice -n 10 python scripts/dci_seed_study.py \
      -b configs/demo/synthetic-shapes-v4-full-encdiff.yaml \
      -r runs_mcl_v4/<cell>/checkpoints/best_dci_* \
      --seeds 0,1,2,3,4 --out demo_artifacts/round3/dci_seed_study.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-b", "--base", required=True)
    ap.add_argument("-r", "--ckpt", required=True)
    ap.add_argument("--seeds", default="0,1,2,3,4")
    ap.add_argument("--num_train", type=int, default=10000)
    ap.add_argument("--num_test", type=int, default=5000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from encdiff_tpu.core.config import instantiate_from_config, to_plain
    from encdiff_tpu.core.yamlcfg import OmegaConf
    from encdiff_tpu.evalx.metrics.dci import compute_dci
    from encdiff_tpu.train.checkpoint_io import load_model_variables

    config = OmegaConf.load(args.base)
    model_cfg = to_plain(config["model"])
    model = instantiate_from_config(
        {"target": model_cfg["target"], "params": model_cfg["params"]})
    assert model.label_dataset is not None, "config needs eval_name"

    data = instantiate_from_config(to_plain(config["data"]))
    data.setup()
    images = data._raw("train").images

    variables, _ = load_model_variables(model, args.ckpt)
    cond_vars = {"params": variables["cond"]["params"],
                 "batch_stats": variables["cond"].get("batch_stats", {})}
    enc = jax.jit(lambda x, cv=cond_vars: model.cond_encoding(
        cv, x.astype(jnp.float32) / 127.5 - 1.0))

    def rep_fn(obs):
        return np.asarray(enc(jnp.asarray(images[np.asarray(obs, np.int64)])))

    rows = []
    for seed in [int(s) for s in args.seeds.split(",")]:
        t0 = time.time()
        scores = compute_dci(model.label_dataset, rep_fn,
                             np.random.RandomState(seed),
                             num_train=args.num_train,
                             num_test=args.num_test)
        row = {"seed": seed,
               "disentanglement": scores["disentanglement"],
               "completeness": scores["completeness"],
               "informativeness_test": scores["informativeness_test"],
               "seconds": round(time.time() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.out:  # incremental: survive kills
            _dump(args.out, args, rows)
    _dump(args.out, args, rows)
    d = np.array([r["disentanglement"] for r in rows])
    print(json.dumps({"mean": d.mean(), "std": d.std(ddof=1 if len(d) > 1
                                                      else 0),
                      "min": d.min(), "max": d.max()}), flush=True)


def _dump(out, args, rows):
    if not out:
        return
    d = np.array([r["disentanglement"] for r in rows])
    with open(out, "w") as f:
        json.dump({"ckpt": args.ckpt, "base": args.base,
                   "num_train": args.num_train, "num_test": args.num_test,
                   "seeds": [r["seed"] for r in rows], "rows": rows,
                   "dci_mean": float(d.mean()),
                   "dci_std": float(d.std(ddof=1 if len(d) > 1 else 0)),
                   "dci_min": float(d.min()), "dci_max": float(d.max())},
                  f, indent=2)


if __name__ == "__main__":
    main()
