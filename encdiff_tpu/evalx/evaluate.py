"""Generic representation-evaluation entry point (metric registry).

The reference inherits disentanglement_lib's gin-driven ``evaluation/
evaluate.py`` (vestigial there — imports TF1). This is the working
equivalent: a name->metric registry over the ported suite, evaluating any
representation function (or precomputed (N, D) representation array via the
index-lookup trick) against a named ground-truth dataset.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from encdiff_tpu.evalx.ground_truth import named_data


def _registry() -> dict[str, Callable]:
    from encdiff_tpu.evalx import metrics as M

    return {
        "dci": M.compute_dci,
        "factor_vae": M.compute_factor_vae,
        "beta_vae": M.compute_beta_vae_sklearn,
        "mig": M.compute_mig,
        "sap": M.compute_sap,
        "irs": M.compute_irs,
        "modularity": M.compute_modularity_explicitness,
        "fairness": M.compute_fairness,
        "unsupervised": M.unsupervised_metrics,
        "downstream": M.compute_downstream_task,
        "reduced_downstream": M.compute_reduced_downstream_task,
        "med": M.compute_med,
    }


def available_metrics() -> list[str]:
    return sorted(_registry())


def evaluate_representation(
    metric: str,
    dataset_name: str,
    representation: Callable | np.ndarray,
    seed: int = 0,
    **metric_kwargs: Any,
) -> dict:
    """Run one metric on a representation over a named ground-truth dataset.

    ``representation`` is either a callable ``obs -> (B, D)`` or a
    precomputed ``(N, D)`` array indexed by the dataset's observation
    indices (the ddpm_enc.py:122-130 trick).
    """
    reg = _registry()
    if metric not in reg:
        raise ValueError(f"unknown metric {metric!r}; "
                         f"available: {available_metrics()}")
    ds = named_data.get_index_dataset(dataset_name)
    if callable(representation):
        rep_fn = representation
    else:
        table = np.asarray(representation)

        def rep_fn(obs):
            return table[np.asarray(obs, dtype=np.int64)]

    rng = np.random.RandomState(seed)
    return reg[metric](ds, rep_fn, rng, **metric_kwargs)
