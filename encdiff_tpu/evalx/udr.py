"""UDR: Unsupervised Disentanglement Ranking across model seeds.

Rebuild of ``evaluation/udr/metrics/udr.py:36-258`` (compute_udr_sklearn,
lasso/spearman correlation matrices, relative-strength disentanglement)
and the driver in ``evaluation/udr/evaluate.py``. Representation functions
follow the same protocol as the rest of the suite: callables mapping
observations (integer indices for the index-lookup datasets) to (B, D)
codes, optionally returning (codes, kl_vector).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


def relative_strength_disentanglement(corr_matrix: np.ndarray) -> float:
    """(max^2 / sum) down both axes, averaged (udr.py:36-47)."""
    with np.errstate(invalid="ignore", divide="ignore"):
        score_x = np.nanmean(np.nan_to_num(
            np.power(corr_matrix.max(axis=0), 2) / corr_matrix.sum(axis=0),
            nan=0.0))
        score_y = np.nanmean(np.nan_to_num(
            np.power(corr_matrix.max(axis=1), 2) / corr_matrix.sum(axis=1),
            nan=0.0))
    return (score_x + score_y) / 2


def spearman_correlation_matrix(vec1: np.ndarray,
                                vec2: np.ndarray) -> np.ndarray:
    """|spearman| between all latent pairs, vectorized over columns
    (replaces the reference's O(D^2) scipy loop, udr.py:49-72)."""
    assert vec1.shape == vec2.shape

    def rank(x):
        order = np.argsort(x, axis=0)
        ranks = np.empty_like(order, dtype=np.float64)
        np.put_along_axis(ranks, order,
                          np.arange(x.shape[0], dtype=np.float64)[:, None],
                          axis=0)
        return ranks

    r1, r2 = rank(vec1), rank(vec2)
    r1 = (r1 - r1.mean(axis=0)) / (r1.std(axis=0) + 1e-12)
    r2 = (r2 - r2.mean(axis=0)) / (r2.std(axis=0) + 1e-12)
    corr = r1.T @ r2 / vec1.shape[0]
    return np.abs(corr)


def lasso_correlation_matrix(vec1, vec2, random_state=None) -> np.ndarray:
    """|Lasso(alpha=0.1) coefficients| (udr.py:74-92)."""
    from sklearn import linear_model

    model = linear_model.Lasso(random_state=random_state, alpha=0.1)
    model.fit(vec1, vec2)
    return np.transpose(np.absolute(model.coef_))


def compute_udr(ground_truth_data,
                representation_functions: Sequence[Callable],
                random_state: np.random.RandomState,
                batch_size: int = 64,
                num_data_points: int = 1000,
                correlation_matrix: str = "lasso",
                filter_low_kl: bool = True,
                include_raw_correlations: bool = True,
                kl_filter_threshold: float = 0.01) -> dict:
    """compute_udr_sklearn parity (udr.py:162-258)."""
    assert num_data_points % batch_size == 0
    reps: list[list] = [[] for _ in representation_functions]
    kls: list[list] = [[] for _ in representation_functions]
    for _ in range(num_data_points // batch_size):
        obs = ground_truth_data.sample_observations(batch_size, random_state)
        for j, fn in enumerate(representation_functions):
            out = fn(obs)
            if isinstance(out, tuple):
                r, kl = out
            else:
                r, kl = out, np.ones(np.asarray(out).shape[1])
            reps[j].append(np.asarray(r))
            kls[j].append(np.asarray(kl))
    model_reps = [np.concatenate(r, axis=0) for r in reps]
    kl = [np.mean(np.stack(k), axis=0) for k in kls]

    num_models = len(model_reps)
    latent_dim = model_reps[0].shape[1]
    corr_all = np.zeros((num_models, num_models, latent_dim, latent_dim))
    kl_mask = []
    for i in range(num_models):
        mu = model_reps[i].mean(axis=0)
        sd = model_reps[i].std(axis=0) + 1e-12
        model_reps[i] = (model_reps[i] - mu) / sd
        model_reps[i] = model_reps[i] * np.greater(kl[i],
                                                   kl_filter_threshold)
        kl_mask.append(kl[i] > kl_filter_threshold)

    disentanglement = np.zeros((num_models, num_models, 1))
    for i in range(num_models):
        for j in range(num_models):
            if i == j:
                continue
            if correlation_matrix == "lasso":
                cm = lasso_correlation_matrix(model_reps[i], model_reps[j],
                                              random_state=0)
            else:
                cm = spearman_correlation_matrix(model_reps[i], model_reps[j])
            corr_all[i, j] = cm
            if filter_low_kl:
                cm = cm[kl_mask[i], ...][..., kl_mask[j]]
            disentanglement[i, j] = relative_strength_disentanglement(cm)

    scores: dict = {}
    if include_raw_correlations:
        scores["raw_correlations"] = corr_all.tolist()
    scores["pairwise_disentanglement_scores"] = disentanglement.tolist()
    scores["model_scores"] = [
        float(np.median(np.delete(disentanglement[:, i], i)))
        for i in range(num_models)]
    return scores
