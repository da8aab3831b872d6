"""Downstream-task and reduced-downstream-task accuracies. Parity with
``evaluation/metrics/downstream_task.py:30-120`` and
``evaluation/metrics/reduced_downstream_task.py:36-170``."""

from __future__ import annotations

import numpy as np

from encdiff_tpu.evalx.metrics import utils


def compute_downstream_task(ground_truth_data, representation_function,
                            random_state, artifact_dir=None,
                            num_train=(10000,), num_test=5000, batch_size=16,
                            predictor="gradient_boosting"):
    del artifact_dir
    scores = {}
    predictor_fn = utils.make_predictor_fn(predictor)
    for train_size in num_train:
        mus_train, ys_train = utils.generate_batch_factor_code(
            ground_truth_data, representation_function, train_size,
            random_state, batch_size)
        mus_test, ys_test = utils.generate_batch_factor_code(
            ground_truth_data, representation_function, num_test,
            random_state, batch_size)
        train_acc, test_acc = _compute_loss(
            mus_train.T, ys_train, mus_test.T, ys_test, predictor_fn)
        s = str(train_size)
        scores[s + ":mean_train_accuracy"] = np.mean(train_acc)
        scores[s + ":mean_test_accuracy"] = np.mean(test_acc)
        scores[s + ":min_train_accuracy"] = np.min(train_acc)
        scores[s + ":min_test_accuracy"] = np.min(test_acc)
        for i, (tr, te) in enumerate(zip(train_acc, test_acc)):
            scores[s + f":train_accuracy_factor_{i}"] = tr
            scores[s + f":test_accuracy_factor_{i}"] = te
    return scores


def _compute_loss(x_train, y_train, x_test, y_test, predictor_fn):
    train_acc, test_acc = [], []
    for i in range(y_train.shape[0]):
        model = predictor_fn()
        model.fit(x_train, y_train[i, :])
        train_acc.append(np.mean(model.predict(x_train) == y_train[i, :]))
        test_acc.append(np.mean(model.predict(x_test) == y_test[i, :]))
    return train_acc, test_acc


def compute_reduced_downstream_task(ground_truth_data,
                                    representation_function, random_state,
                                    artifact_dir=None,
                                    num_factors_to_remove=1,
                                    num_train=(10000,), num_test=5000,
                                    batch_size=16,
                                    predictor="gradient_boosting"):
    """Remove the k most-informative code dims per factor, retrain, measure
    leakage (reduced_downstream_task.py:36-170)."""
    del artifact_dir
    scores = {}
    predictor_fn = utils.make_predictor_fn(predictor)
    for train_size in num_train:
        s = str(train_size)
        mus_train, ys_train = utils.generate_batch_factor_code(
            ground_truth_data, representation_function, train_size,
            random_state, batch_size)
        mus_test, ys_test = utils.generate_batch_factor_code(
            ground_truth_data, representation_function, num_test,
            random_state, batch_size)
        reduced_train_scores, other_train_scores = [], []
        reduced_test_scores, other_test_scores = [], []
        for factor in range(ground_truth_data.num_factors):
            red_train, red_test = mus_train.copy(), mus_test.copy()
            for _ in range(num_factors_to_remove):
                red_train, red_test = compute_reduced_representation(
                    red_train, ys_train, red_test, ys_test, factor,
                    predictor_fn)
            train_acc, test_acc = _compute_loss(
                red_train.T, ys_train, red_test.T, ys_test, predictor_fn)
            scores[s + f":reduced_factor_{factor}"
                   ":mean_train_accuracy_reduced_factor"] = train_acc[factor]
            scores[s + f":reduced_factor_{factor}"
                   ":mean_test_accuracy_reduced_factor"] = test_acc[factor]
            reduced_train_scores.append(train_acc[factor])
            reduced_test_scores.append(test_acc[factor])
            others_tr = [a for i, a in enumerate(train_acc) if i != factor]
            others_te = [a for i, a in enumerate(test_acc) if i != factor]
            other_train_scores.append(np.mean(others_tr))
            other_test_scores.append(np.mean(others_te))
        scores[s + ":mean_train_accuracy_reduced_factor"] = np.mean(
            reduced_train_scores)
        scores[s + ":mean_test_accuracy_reduced_factor"] = np.mean(
            reduced_test_scores)
        scores[s + ":mean_train_accuracy_other_factors"] = np.mean(
            other_train_scores)
        scores[s + ":mean_test_accuracy_other_factors"] = np.mean(
            other_test_scores)
    return scores


def compute_reduced_representation(mus_train, ys_train, mus_test, ys_test,
                                   factor_of_interest, predictor_fn):
    """Drop the code dim most informative for factor_of_interest."""
    model = predictor_fn()
    model.fit(mus_train.T, ys_train[factor_of_interest, :])
    importance = np.abs(model.feature_importances_)
    drop = int(np.argmax(importance))
    keep = [i for i in range(mus_train.shape[0]) if i != drop]
    return mus_train[keep, :], mus_test[keep, :]
