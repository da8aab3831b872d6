"""Abstract-reasoning training protocol.

Rebuild of ``evaluation/abstract_reasoning/reason.py`` (reason:66-199): train
a TwoStageModel on PGMs sampled from a GroundTruthData, measuring train/val
accuracy per iteration, and write a results JSON. The TF1 TPUEstimator
machinery is replaced by one jitted optax step; evaluation batches reuse the
generator with a different fixed seed.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

from encdiff_tpu.evalx.abstract_reasoning import models as ar_models
from encdiff_tpu.evalx.abstract_reasoning.pgm_data import get_pgm_dataset


def reason(ground_truth_data, output_dir=None, *, pgm_type="easy_mixed",
           embedding="onehot", num_iterations=10,
           training_steps_per_iteration=100, eval_steps_per_iteration=10,
           random_seed=0, batch_size=32, learning_rate=1e-3,
           edge_mlp=(512, 512, 512, 512), graph_mlp=(256, 256),
           quantize=True, representation_fn=None):
    """Train + evaluate a WildRelNet on PGMs over ``ground_truth_data``.

    Returns the results dict (and writes ``results.json`` under
    ``output_dir`` when given) — the counterpart of the reference's
    TPUEstimator train/eval loop (reason.py:100-199).

    ``representation_fn`` enables the trained-representation protocol (the
    reference's HubEmbedding case): it maps raw panel observations
    ``(B, N, *obs)`` to embeddings ``(B, N, D)`` — typically a lookup into
    precomputed model representations when ``ground_truth_data`` is an
    index-backed dataset. Panels are fed to the WildRelNet through the
    'values' input slot; the ``embedding`` argument is ignored.
    """
    dataset = get_pgm_dataset(ground_truth_data, pgm_type, quantize=quantize)
    train_iter = dataset.batch_iterator(batch_size, seed=random_seed)
    val_iter = dataset.batch_iterator(batch_size, seed=random_seed + 1)

    if representation_fn is not None:
        embedding = "values"

        def _embed(it):
            for feats, labels in it:
                feats = dict(feats)
                feats["context_factor_values"] = np.asarray(
                    representation_fn(feats["context"]), np.float32)
                feats["answers_factor_values"] = np.asarray(
                    representation_fn(feats["answers"]), np.float32)
                yield feats, labels

        train_iter = _embed(train_iter)
        val_iter = _embed(val_iter)

    model = ar_models.TwoStageModel(
        embedding=embedding, edge_mlp=tuple(edge_mlp),
        graph_mlp=tuple(graph_mlp))
    feats0, _ = next(train_iter)
    rng = jax.random.PRNGKey(random_seed)
    state, tx = ar_models.build_train_state(model, feats0, rng,
                                            learning_rate)
    train_step = ar_models.build_train_step(model, tx)
    eval_step = ar_models.build_eval_step(model)

    history = []
    t0 = time.time()
    for it in range(num_iterations):
        accs = []
        for _ in range(training_steps_per_iteration):
            feats, labels = next(train_iter)
            rng, srng = jax.random.split(rng)
            state, metrics = train_step(state, feats, labels, srng)
            accs.append(metrics["accuracy"])
        val_accs = [eval_step(state, *next(val_iter))
                    for _ in range(eval_steps_per_iteration)]
        row = {
            "iteration": it,
            "steps": (it + 1) * training_steps_per_iteration,
            "train_accuracy": float(np.mean(jax.device_get(accs))),
            "val_accuracy": float(np.mean(jax.device_get(val_accs))),
            "elapsed_s": round(time.time() - t0, 2),
        }
        history.append(row)

    results = {
        "pgm_type": pgm_type,
        "embedding": ("representation" if representation_fn is not None
                      else embedding),
        "batch_size": batch_size,
        "final_train_accuracy": history[-1]["train_accuracy"],
        "final_val_accuracy": history[-1]["val_accuracy"],
        "history": history,
    }
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "results.json"), "w") as fh:
            json.dump(results, fh, indent=2)
    return results
