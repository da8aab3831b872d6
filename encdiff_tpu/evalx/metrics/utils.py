"""Shared metric utilities.

Covers ``evaluation/metrics/utils.py:29-176`` of the reference: batched
factor/code generation, train/test splitting, histogram discretization,
discrete MI/entropy, data normalization and the predictor registry. The
reference threads hyperparameters through gin; here they are plain keyword
arguments with the reference's gin-bound defaults.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import sklearn.metrics
import sklearn.model_selection
from sklearn import ensemble, linear_model


def generate_batch_factor_code(ground_truth_data, representation_function,
                               num_points, random_state, batch_size):
    """Returns (codes (D, N), factors (F, N)) — transposed dlib convention."""
    reps, factors = [], []
    i = 0
    while i < num_points:
        n = min(num_points - i, batch_size)
        f, obs = ground_truth_data.sample(n, random_state)
        factors.append(f)
        reps.append(np.asarray(representation_function(obs)))
        i += n
    return np.vstack(reps).T, np.vstack(factors).T


def obtain_representation(observations, representation_function, batch_size):
    """(N, ...) observations -> (D, N) codes."""
    reps = []
    for i in range(0, observations.shape[0], batch_size):
        reps.append(np.asarray(
            representation_function(observations[i:i + batch_size])))
    return np.vstack(reps).T


def split_train_test(observations, train_percentage):
    n = observations.shape[1]
    n_train = int(np.ceil(n * train_percentage))
    return observations[:, :n_train], observations[:, n_train:]


def histogram_discretize(target, num_bins=20):
    """Per-row histogram discretization (utils.py _histogram_discretize)."""
    target = np.asarray(target)
    out = np.zeros_like(target, dtype=np.int64)
    for i in range(target.shape[0]):
        out[i, :] = np.digitize(
            target[i, :], np.histogram(target[i, :], num_bins)[1][:-1])
    return out


def make_discretizer(target, num_bins=20,
                     discretizer_fn: Callable = histogram_discretize):
    return discretizer_fn(target, num_bins)


def discrete_mutual_info(mus, ys):
    """Pairwise discrete MI matrix (num_codes, num_factors), in nats."""
    num_codes, num_factors = mus.shape[0], ys.shape[0]
    m = np.zeros([num_codes, num_factors])
    for i in range(num_codes):
        for j in range(num_factors):
            m[i, j] = sklearn.metrics.mutual_info_score(ys[j, :], mus[i, :])
    return m


def discrete_entropy(ys):
    num_factors = ys.shape[0]
    h = np.zeros(num_factors)
    for j in range(num_factors):
        h[j] = sklearn.metrics.mutual_info_score(ys[j, :], ys[j, :])
    return h


def normalize_data(data, mean=None, stddev=None):
    if mean is None:
        mean = np.mean(data, axis=1)
    if stddev is None:
        stddev = np.std(data, axis=1)
    return (data - mean[:, np.newaxis]) / stddev[:, np.newaxis], mean, stddev


def logistic_regression_cv():
    """dlib predictor: 10-fold CV over C grid."""
    return linear_model.LogisticRegressionCV(
        Cs=10, cv=sklearn.model_selection.KFold(n_splits=10))


def gradient_boosting_classifier():
    return ensemble.GradientBoostingClassifier()


def make_predictor_fn(predictor: str = "gradient_boosting"):
    """Predictor registry (reference binds gradient_boosting_classifier)."""
    if predictor == "gradient_boosting":
        return gradient_boosting_classifier
    if predictor == "logistic_regression_cv":
        return logistic_regression_cv
    raise ValueError(f"unknown predictor {predictor!r}")


# --------------------------------------------------------------------------
# Vectorized fast paths used by our implementations: sample P mini-batches of
# factors at once instead of a 10k-iteration Python loop (the representation
# function is array indexing with the index-lookup trick, so everything
# becomes a handful of fancy-indexing ops).
# --------------------------------------------------------------------------

def sample_factor_batches(ground_truth_data, num_points, batch_size,
                          random_state):
    """(P, B, F) latent factor batches in one shot — factors are iid across
    rows, so one flat sample_factors call reshapes into P minibatches."""
    P, B = num_points, batch_size
    flat = ground_truth_data.sample_factors(P * B, random_state)
    return flat.reshape(P, B, flat.shape[-1])


def observations_from_factor_batches(ground_truth_data, factors,
                                     random_state):
    """factors (P, B, F) -> observations (P, B, ...)."""
    P, B, F = factors.shape
    obs = ground_truth_data.sample_observations_from_factors(
        factors.reshape(P * B, F), random_state)
    return obs.reshape(P, B, *np.shape(obs)[1:])
