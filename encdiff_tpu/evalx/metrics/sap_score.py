"""SAP score (Kumar et al. 2018). Parity with
``evaluation/metrics/sap_score.py:36-130``: per (code, factor) predictability
matrix (R² for continuous, balanced linear SVC accuracy for discrete), score
= mean gap between top-2 codes per factor. The continuous R² path is
vectorized over all (code, factor) pairs."""

from __future__ import annotations

import numpy as np
from sklearn import svm

from encdiff_tpu.evalx.metrics import utils


def compute_sap(ground_truth_data, representation_function, random_state,
                artifact_dir=None, num_train=10000, num_test=5000,
                batch_size=16, continuous_factors=True):
    del artifact_dir
    mus, ys = utils.generate_batch_factor_code(
        ground_truth_data, representation_function, num_train, random_state,
        batch_size)
    mus_test, ys_test = utils.generate_batch_factor_code(
        ground_truth_data, representation_function, num_test, random_state,
        batch_size)
    return _compute_sap(mus, ys, mus_test, ys_test, continuous_factors)


def _compute_sap(mus, ys, mus_test, ys_test, continuous_factors):
    score_matrix = compute_score_matrix(mus, ys, mus_test, ys_test,
                                        continuous_factors)
    assert score_matrix.shape == (mus.shape[0], ys.shape[0])
    return {"SAP_score": compute_avg_diff_top_two(score_matrix)}


def compute_score_matrix(mus, ys, mus_test, ys_test, continuous_factors):
    num_latents, num_factors = mus.shape[0], ys.shape[0]
    if continuous_factors:
        # vectorized R^2: cov(mu_i, y_j)^2 / (var mu_i * var y_j)
        mu_c = mus - mus.mean(axis=1, keepdims=True)
        y_c = ys - ys.mean(axis=1, keepdims=True)
        n = mus.shape[1]
        cov = (mu_c @ y_c.T) / (n - 1)                     # (D, F)
        var_mu = mu_c.var(axis=1, ddof=1)[:, None]
        var_y = y_c.var(axis=1, ddof=1)[None, :]
        score = np.where(var_mu > 1e-12, cov**2 / (var_mu * var_y), 0.0)
        return score
    score = np.zeros([num_latents, num_factors])
    for i in range(num_latents):
        for j in range(num_factors):
            classifier = svm.LinearSVC(C=0.01, class_weight="balanced")
            classifier.fit(mus[i, :, np.newaxis], ys[j, :])
            pred = classifier.predict(mus_test[i, :, np.newaxis])
            score[i, j] = np.mean(pred == ys_test[j, :])
    return score


def compute_avg_diff_top_two(matrix):
    sorted_matrix = np.sort(matrix, axis=0)
    return np.mean(sorted_matrix[-1, :] - sorted_matrix[-2, :])
