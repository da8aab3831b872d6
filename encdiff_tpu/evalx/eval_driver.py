"""In-training disentanglement metric driver.

Parity with ``main_val.py:38-96`` (eval_func): given the ground-truth index
dataset and an (N, latent_unit) representation array — or (N, U, D) token
array, reduced to one scalar per token via per-token PCA(1) — run the
in-training metric battery (β-VAE, DCI, MIG, FactorVAE with the reference's
gin-bound sampling sizes) and write ``<step>.json``.

The representation function is pure index lookup (``reps[indices]``), so the
battery runs off a tiny (N, U) float array with no image IO (SURVEY.md §3.2).
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

from encdiff_tpu.evalx.metrics import (
    compute_beta_vae_sklearn, compute_dci, compute_factor_vae, compute_mig)


def reduce_tokens_pca1(reps: np.ndarray) -> np.ndarray:
    """(N, U, D) token reps -> (N, U) scalars via per-token PCA(1)
    (main_val.py:41-48)."""
    from sklearn.decomposition import PCA

    n, u, d = reps.shape
    out = np.zeros((n, u), dtype=np.float64)
    for i in range(u):
        out[:, i] = PCA(n_components=1).fit_transform(reps[:, i, :])[:, 0]
    return out


def eval_func(label_dataset, reps: np.ndarray, save_path: str | None,
              step: int, preflix: str = "", seed: int = 0,
              dci_predictor: str = "gradient_boosting",
              metrics=("beta_VAE", "dci", "MIG", "factor_VAE"),
              budget: str = "full") -> dict:
    """Run the in-training metric battery and persist <step>.json.

    ``budget="fast"`` is the epoch-monitoring tier: DCI drops to 2.5k/1.25k
    probes and 20 boosting rounds (~20x cheaper on a 1-core host — the GBT
    is the battery's hog). The reference protocol (10k/5k, sklearn GBT
    defaults; main_val.py:57-94) stays the default and is what the post-fit
    test pass reports; fast-budget JSONs are tagged ``dci_budget``.
    """
    reps = np.asarray(reps)
    if reps.ndim == 3:
        reps = reduce_tokens_pca1(reps)
    assert reps.ndim == 2

    def representation_function(obs):
        # observations are integer indices (the index-lookup trick)
        return reps[np.asarray(obs, dtype=np.int64)]

    fast = budget == "fast"
    value_dict: dict[str, Any] = {}
    if "beta_VAE" in metrics:
        value_dict["beta_VAE"] = compute_beta_vae_sklearn(
            label_dataset, representation_function,
            np.random.RandomState(seed), batch_size=64, num_train=10000,
            num_eval=5000)
    if "dci" in metrics:
        if fast and dci_predictor == "gradient_boosting":
            dci_predictor = "gradient_boosting_fast"
        value_dict["dci"] = compute_dci(
            label_dataset, representation_function,
            np.random.RandomState(seed),
            num_train=2500 if fast else 10000,
            num_test=1250 if fast else 5000,
            predictor=dci_predictor)
        if fast:
            value_dict["dci"]["dci_budget"] = "fast"
    if "MIG" in metrics:
        value_dict["MIG"] = compute_mig(
            label_dataset, representation_function,
            np.random.RandomState(seed), num_train=10000, num_bins=20)
    if "factor_VAE" in metrics:
        value_dict["factor_VAE"] = compute_factor_vae(
            label_dataset, representation_function,
            np.random.RandomState(seed), batch_size=64, num_train=10000,
            num_eval=5000, num_variance_estimate=10000, prune_threshold=0.05)

    if save_path is not None:
        os.makedirs(save_path, exist_ok=True)
        with open(os.path.join(save_path, f"{preflix}{step}.json"), "w") as f:
            json.dump(_to_jsonable(value_dict), f, indent=2)
    return value_dict


def _to_jsonable(obj):
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj
