"""Abstract-reasoning evaluation CLI.

Counterpart of the reference's ``evaluation/abstract_reasoning/reason.py``
protocol entry point (reason_with_gin:40-62 — gin bindings become plain
flags here). Trains a WildRelNet on PGMs over a named ground-truth dataset
and writes results.json.

Usage:
    python scripts/abstract_reasoning_eval.py --dataset dsprites \\
        --pgm_type easy_mixed --embedding onehot --output_dir out/
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    sys.path.insert(0, ".")
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="dummy_data",
                   help="named ground-truth dataset (evalx.ground_truth)")
    p.add_argument("--pgm_type", default="easy_mixed",
                   help="{easy|hard}_{1|2|3|mixed}")
    p.add_argument("--embedding", default="onehot",
                   choices=["values", "onehot", "cnn"])
    p.add_argument("-b", "--base", default=None,
                   help="model config YAML: with --ckpt, evaluate reasoning "
                        "over the TRAINED concept-token representations "
                        "(the reference's HubEmbedding protocol; its TF1 "
                        "version is not runnable)")
    p.add_argument("-r", "--ckpt", default=None)
    p.add_argument("--encode_batch", type=int, default=512)
    p.add_argument("--num_iterations", type=int, default=10)
    p.add_argument("--training_steps_per_iteration", type=int, default=100)
    p.add_argument("--eval_steps_per_iteration", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_dir", default=None)
    opt = p.parse_args(argv)

    from encdiff_tpu.evalx.abstract_reasoning import reason
    from encdiff_tpu.evalx.ground_truth import named_data

    representation_fn = None
    if opt.ckpt:
        # trained-representation protocol: encode the config's dataset once
        # into (N, latent_unit) concept scalars, then PGM panels (integer
        # indices from the index-backed dataset) look up rows.
        import jax
        import jax.numpy as jnp
        import numpy as np

        from encdiff_tpu.core.config import instantiate_from_config, to_plain
        from encdiff_tpu.core.yamlcfg import OmegaConf
        from encdiff_tpu.train.checkpoint_io import load_model_variables

        if not opt.base:
            raise SystemExit("--ckpt requires -b/--base")
        config = OmegaConf.load(opt.base)
        model_cfg = to_plain(config["model"])
        model = instantiate_from_config(
            {"target": model_cfg["target"], "params": model_cfg["params"]})
        variables, _ = load_model_variables(model, opt.ckpt)
        cond_vars = {"params": variables["cond"]["params"],
                     "batch_stats": variables["cond"].get("batch_stats", {})}

        dm = instantiate_from_config(to_plain(config["data"]))
        dm.setup()
        ds = dm._raw("train")

        @jax.jit
        def encode(x):
            x = x.astype(jnp.float32) / 127.5 - 1.0
            return model.cond_encoding(cond_vars, x)

        n = len(ds)
        reps = []
        for i in range(0, n, opt.encode_batch):
            idx = np.arange(i, min(i + opt.encode_batch, n))
            reps.append(np.asarray(encode(jnp.asarray(ds.batch_uint8(idx)))))
            if (i // opt.encode_batch) % 50 == 0:
                print(f"encoded {i + len(idx)}/{n}")
        reps = np.concatenate(reps, axis=0)
        print(f"representations: {reps.shape}")

        def representation_fn(panels):
            return reps[np.asarray(panels, np.int64)]

    data = named_data.get_named_ground_truth_data(opt.dataset)
    results = reason(
        data, opt.output_dir, pgm_type=opt.pgm_type,
        embedding=opt.embedding, num_iterations=opt.num_iterations,
        training_steps_per_iteration=opt.training_steps_per_iteration,
        eval_steps_per_iteration=opt.eval_steps_per_iteration,
        random_seed=opt.seed, batch_size=opt.batch_size,
        learning_rate=opt.learning_rate,
        representation_fn=representation_fn)
    print(json.dumps({k: v for k, v in results.items() if k != "history"},
                     indent=2))
    return results


if __name__ == "__main__":
    main()
