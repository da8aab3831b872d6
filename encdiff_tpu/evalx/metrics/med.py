"""MED / Top-k MED: DCI-style scores with an MI-based importance matrix and
logistic-regression informativeness. Parity with
``evaluation/metrics/med.py:37-171``."""

from __future__ import annotations

import numpy as np
from sklearn import linear_model, preprocessing

from encdiff_tpu.evalx.metrics import utils
from encdiff_tpu.evalx.metrics.dci import (
    completeness, disentanglement, disentanglement_per_code)


def compute_med(ground_truth_data, representation_function, random_state,
                artifact_dir=None, num_train=10000, num_test=5000,
                batch_size=16, topk=-1, num_bins=20):
    del artifact_dir
    mus_train, ys_train = utils.generate_batch_factor_code(
        ground_truth_data, representation_function, num_train, random_state,
        batch_size)
    mus_test, ys_test = utils.generate_batch_factor_code(
        ground_truth_data, representation_function, num_test, random_state,
        batch_size)
    return _compute_med(mus_train, ys_train, mus_test, ys_test, topk,
                        num_bins=num_bins)


def _compute_med(mus_train, ys_train, mus_test, ys_test, topk, num_bins=20):
    importance, train_err, test_err = compute_importance_mi(
        mus_train, ys_train, mus_test, ys_test, num_bins=num_bins)
    scores = {
        "informativeness_train": train_err,
        "informativeness_test": test_err,
        "disentanglement": disentanglement(importance),
        "completeness": completeness(importance),
    }
    if topk > 0:
        pick = pick_by_dis_per_factor(importance, topk)
        reduced = importance[pick, :]
        scores[f"top{topk}_disentanglement"] = disentanglement(reduced)
        scores[f"top{topk}_completeness"] = completeness(reduced)
    return scores


def compute_importance_mi(x_train, y_train, x_test, y_test, num_bins=20):
    """MI-normalized importance + logistic informativeness (med.py:96-120)."""
    discretized = utils.make_discretizer(x_train, num_bins=num_bins)
    m = utils.discrete_mutual_info(discretized, y_train)
    importance = np.divide(m, m.sum(axis=0))

    scaler = preprocessing.StandardScaler().fit(x_train.T)
    x_train_s = scaler.transform(x_train.T)
    x_test_s = scaler.transform(x_test.T)
    train_acc, test_acc = [], []
    for i in range(y_train.shape[0]):
        model = linear_model.LogisticRegression()
        model.fit(x_train_s, y_train[i, :])
        train_acc.append(np.mean(model.predict(x_train_s) == y_train[i, :]))
        test_acc.append(np.mean(model.predict(x_test_s) == y_test[i, :]))
    return importance, np.mean(train_acc), np.mean(test_acc)


def pick_by_dis_per_factor(importance_matrix, k):
    """Per-factor top-k most-disentangled code dims (med.py:122-144)."""
    latent_num, factor_num = importance_matrix.shape
    dis_per_code = disentanglement_per_code(importance_matrix)
    sort_index = np.argsort(-dis_per_code)
    factor_per_code = np.argmax(importance_matrix, axis=1)
    factor_dim = [[] for _ in range(factor_num)]
    is_full = [False] * factor_num
    for dim in sort_index:
        cur = factor_per_code[dim]
        if len(factor_dim[cur]) < k:
            factor_dim[cur].append(dim)
        else:
            is_full[cur] = True
        if all(is_full):
            break
    select = []
    for dims in factor_dim:
        select.extend(dims)
    return sorted(set(select))
