"""Metric unit tests in the reference's canonical fixture style
(SURVEY.md §4.1): synthetic representations with known structure ->
analytically known scores (e.g. identity representation => perfect
disentanglement; diagonal importance matrix => disentanglement 1.0).
"""

import numpy as np
import pytest

from encdiff_tpu.evalx.ground_truth.datasets import (
    IdentityObservationsData, Shapes3D)
from encdiff_tpu.evalx.metrics import (
    compute_beta_vae_sklearn, compute_factor_vae, compute_mig, compute_sap,
    compute_irs, compute_modularity_explicitness, unsupervised_metrics,
    compute_med)
from encdiff_tpu.evalx.metrics.dci import (
    _compute_dci, completeness, disentanglement)


def _identity_rep(obs):
    return np.asarray(obs, dtype=np.float64)


def test_dci_diagonal_importance_is_perfect():
    importance = np.diag(np.ones(5))
    assert disentanglement(importance) == pytest.approx(1.0)
    assert completeness(importance) == pytest.approx(1.0)


def test_dci_uniform_importance_is_zero():
    importance = np.ones((5, 5)) / 5
    assert disentanglement(importance) == pytest.approx(0.0, abs=1e-6)


def test_dci_on_identity_representation():
    data = IdentityObservationsData()
    rs = np.random.RandomState(0)
    mus, ys = [], []
    f, o = data.sample(1500, rs)
    scores = _compute_dci(o[:1000].T, f[:1000].T, o[1000:].T, f[1000:].T,
                          predictor="random_forest")
    assert scores["disentanglement"] > 0.9
    assert scores["informativeness_test"] > 0.9


def test_factor_vae_identity_representation_perfect():
    data = Shapes3D()  # index dataset
    # representation = the one-hot-ish factor coordinates themselves:
    # decode index back to factors => perfectly disentangled
    bases = data.factor_bases

    def rep_fn(idx):
        idx = np.asarray(idx, dtype=np.int64)
        out = np.zeros((idx.shape[0], len(data.factor_sizes)))
        rem = idx
        for i, b in enumerate(bases.astype(np.int64)):
            out[:, i] = rem // b
            rem = rem % b
        return out

    scores = compute_factor_vae(
        data, rep_fn, np.random.RandomState(0), batch_size=64,
        num_train=500, num_eval=300, num_variance_estimate=1000)
    assert scores["eval_accuracy"] > 0.95


def test_factor_vae_random_representation_chance():
    data = Shapes3D()
    noise_rs = np.random.RandomState(7)

    def rep_fn(idx):
        # pure noise, uncorrelated with factors -> votes are random
        return noise_rs.normal(size=(np.asarray(idx).shape[0], 10))

    scores = compute_factor_vae(
        data, rep_fn, np.random.RandomState(0), batch_size=16,
        num_train=300, num_eval=200, num_variance_estimate=500)
    assert scores["eval_accuracy"] < 0.9


def test_mig_identity_is_high_random_is_low():
    data = IdentityObservationsData()
    rs = np.random.RandomState(3)
    high = compute_mig(data, _identity_rep, rs, num_train=3000, num_bins=10)
    assert high["discrete_mig"] > 0.8

    rs = np.random.RandomState(3)
    low = compute_mig(
        data, lambda o: np.random.RandomState(1).normal(
            size=(np.asarray(o).shape[0], 10)),
        rs, num_train=3000, num_bins=10)
    assert low["discrete_mig"] < 0.2


def test_beta_vae_identity_perfect():
    data = IdentityObservationsData()
    scores = compute_beta_vae_sklearn(
        data, _identity_rep, np.random.RandomState(0), batch_size=16,
        num_train=500, num_eval=300)
    assert scores["eval_accuracy"] > 0.9


def test_sap_identity_perfect():
    data = IdentityObservationsData()
    scores = compute_sap(data, _identity_rep, np.random.RandomState(0),
                         num_train=2000, num_test=1000,
                         continuous_factors=True)
    assert scores["SAP_score"] > 0.9


def test_irs_identity_high():
    data = IdentityObservationsData()
    scores = compute_irs(data, _identity_rep, np.random.RandomState(0),
                         num_train=3000, num_bins=10)
    assert scores["IRS"] > 0.5


def test_modularity_identity_high():
    data = IdentityObservationsData()
    scores = compute_modularity_explicitness(
        data, _identity_rep, np.random.RandomState(0), num_train=3000,
        num_test=1500, num_bins=10)
    assert scores["modularity_score"] > 0.75


def test_unsupervised_metrics_independent_gaussian():
    data = IdentityObservationsData()
    noise_rs = np.random.RandomState(0)  # persistent: rows stay independent
    scores = unsupervised_metrics(
        data, lambda o: noise_rs.normal(size=(np.asarray(o).shape[0], 10)),
        np.random.RandomState(0), num_train=2000)
    # independent gaussian noise -> near-zero total correlation
    assert abs(scores["gaussian_total_correlation"]) < 0.5


def test_med_identity_high():
    data = IdentityObservationsData()
    scores = compute_med(data, _identity_rep, np.random.RandomState(0),
                         num_train=2000, num_test=1000, topk=2, num_bins=10)
    # finite-sample MI bias leaks ~0.02 nats to each off-diagonal cell, so
    # identity lands ~0.8 at 2k samples (exact for the estimator, not a bug)
    assert scores["disentanglement"] > 0.75
    assert "top2_disentanglement" in scores


def test_eval_driver_writes_json(tmp_path):
    from encdiff_tpu.evalx.eval_driver import eval_func

    data = Shapes3D()
    reps = np.random.RandomState(0).normal(size=(Shapes3D.N, 4))

    # tiny sizes: just exercise the plumbing
    import encdiff_tpu.evalx.eval_driver as drv
    vd = eval_func(data, reps, str(tmp_path), 123,
                   metrics=("MIG",))
    assert "MIG" in vd
    assert (tmp_path / "123.json").exists()


def test_eval_driver_fast_budget(tmp_path):
    """fast tier: 20-round GBT on 2.5k probes still scores an identity
    representation near-perfect, and the JSON is tagged with the budget."""
    import json

    from encdiff_tpu.evalx.eval_driver import eval_func

    data = Shapes3D()
    # identity representation: the decoded factor values as the codes
    reps = np.stack(np.unravel_index(np.arange(data.N), data.factor_sizes),
                    axis=1).astype(np.float64)
    vd = eval_func(data, reps, str(tmp_path), 7, metrics=("dci",),
                   budget="fast")
    assert vd["dci"]["dci_budget"] == "fast"
    assert vd["dci"]["disentanglement"] > 0.95
    saved = json.loads((tmp_path / "7.json").read_text())
    assert saved["dci"]["dci_budget"] == "fast"


def test_metric_registry_on_perfect_representation():
    """evaluate_representation: every fast metric near-perfect on the
    factors themselves (synthetic_shapes index dataset)."""
    import itertools

    import numpy as np

    from encdiff_tpu.evalx.evaluate import (available_metrics,
                                            evaluate_representation)

    sizes = [6, 6, 6, 4, 4, 8]
    grid = np.array(list(itertools.product(*[range(s) for s in sizes])),
                    np.float64)
    reps = grid + 0.01 * np.random.RandomState(0).randn(*grid.shape)
    assert "dci" in available_metrics() and "med" in available_metrics()
    mig = evaluate_representation("mig", "synthetic_shapes", reps,
                                  num_train=2000, num_bins=20)
    assert mig["discrete_mig"] > 0.95
    sap = evaluate_representation("sap", "synthetic_shapes", reps,
                                  num_train=2000, num_test=500)
    assert sap["SAP_score"] > 0.95
    irs = evaluate_representation("irs", "synthetic_shapes", reps,
                                  num_train=2000)
    assert irs["IRS"] > 0.9
