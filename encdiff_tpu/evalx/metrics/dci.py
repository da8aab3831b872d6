"""DCI: Disentanglement / Completeness / Informativeness (Eastwood &
Williams 2018).

Semantics match ``evaluation/metrics/dci.py:35-135``: per-factor gradient
boosted trees give a (codes x factors) importance matrix; D and C are
1 - entropy of normalized importances, importance-weighted.

The GBT fit is inherently host/sklearn (SURVEY.md §3.2 note); a faster
``predictor="random_forest"`` backend is offered for quick in-training
evals, with GBT the parity default.
"""

from __future__ import annotations

import numpy as np
import scipy.stats
from sklearn.ensemble import GradientBoostingClassifier, RandomForestClassifier

from encdiff_tpu.evalx.metrics import utils


def compute_dci(ground_truth_data, representation_function, random_state,
                artifact_dir=None, num_train=10000, num_test=5000,
                batch_size=16, predictor="gradient_boosting"):
    del artifact_dir
    mus_train, ys_train = utils.generate_batch_factor_code(
        ground_truth_data, representation_function, num_train, random_state,
        batch_size)
    mus_test, ys_test = utils.generate_batch_factor_code(
        ground_truth_data, representation_function, num_test, random_state,
        batch_size)
    return _compute_dci(mus_train, ys_train, mus_test, ys_test,
                        predictor=predictor)


def _compute_dci(mus_train, ys_train, mus_test, ys_test,
                 predictor="gradient_boosting"):
    importance_matrix, train_err, test_err = compute_importance_gbt(
        mus_train, ys_train, mus_test, ys_test, predictor=predictor)
    return {
        "informativeness_train": train_err,
        "informativeness_test": test_err,
        "disentanglement": disentanglement(importance_matrix),
        "completeness": completeness(importance_matrix),
        # (codes x factors) diagnostic: which latents carry which factor —
        # lets a plateau be read off the eval JSON (factor split across
        # latents vs latent polluted by several factors) without rerunning
        "importance_matrix": np.round(importance_matrix, 4).tolist(),
    }


def compute_importance_gbt(x_train, y_train, x_test, y_test,
                           predictor="gradient_boosting"):
    """Per-factor tree ensembles -> |feature importance| matrix."""
    num_factors = y_train.shape[0]
    num_codes = x_train.shape[0]
    importance_matrix = np.zeros([num_codes, num_factors], dtype=np.float64)
    train_acc, test_acc = [], []
    for i in range(num_factors):
        if predictor == "gradient_boosting":
            model = GradientBoostingClassifier()
        elif predictor == "gradient_boosting_fast":
            # in-training monitoring budget: 5x fewer boosting rounds. The
            # protocol number (disentanglement_lib defaults, 100 rounds)
            # comes from the post-fit test() pass; sklearn GBT fits
            # n_classes one-vs-rest ensembles per factor, which makes the
            # default ~18 min/val on a 1-core host for Shapes3D.
            model = GradientBoostingClassifier(n_estimators=20)
        elif predictor == "random_forest":
            # max_features=None so importances concentrate like GBT's
            # (sqrt-subsampling smears importance onto noise features)
            model = RandomForestClassifier(n_estimators=100,
                                           max_features=None, n_jobs=-1)
        else:
            raise ValueError(predictor)
        model.fit(x_train.T, y_train[i, :])
        importance_matrix[:, i] = np.abs(model.feature_importances_)
        train_acc.append(np.mean(model.predict(x_train.T) == y_train[i, :]))
        test_acc.append(np.mean(model.predict(x_test.T) == y_test[i, :]))
    return importance_matrix, np.mean(train_acc), np.mean(test_acc)


def disentanglement_per_code(importance_matrix):
    return 1.0 - scipy.stats.entropy(importance_matrix.T + 1e-11,
                                     base=importance_matrix.shape[1])


def disentanglement(importance_matrix):
    per_code = disentanglement_per_code(importance_matrix)
    if importance_matrix.sum() == 0.0:
        importance_matrix = np.ones_like(importance_matrix)
    code_importance = importance_matrix.sum(axis=1) / importance_matrix.sum()
    return np.sum(per_code * code_importance)


def completeness_per_factor(importance_matrix):
    return 1.0 - scipy.stats.entropy(importance_matrix + 1e-11,
                                     base=importance_matrix.shape[0])


def completeness(importance_matrix):
    per_factor = completeness_per_factor(importance_matrix)
    if importance_matrix.sum() == 0.0:
        importance_matrix = np.ones_like(importance_matrix)
    factor_importance = importance_matrix.sum(axis=0) / importance_matrix.sum()
    return np.sum(per_factor * factor_importance)
