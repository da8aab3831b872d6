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

    data = named_data.get_named_ground_truth_data(opt.dataset)
    results = reason(
        data, opt.output_dir, pgm_type=opt.pgm_type,
        embedding=opt.embedding, num_iterations=opt.num_iterations,
        training_steps_per_iteration=opt.training_steps_per_iteration,
        eval_steps_per_iteration=opt.eval_steps_per_iteration,
        random_seed=opt.seed, batch_size=opt.batch_size,
        learning_rate=opt.learning_rate)
    print(json.dumps({k: v for k, v in results.items() if k != "history"},
                     indent=2))
    return results


if __name__ == "__main__":
    main()
