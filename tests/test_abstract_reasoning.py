"""Abstract-reasoning suite: PGM sampler invariants, relational-layer
primitives vs naive references, and an end-to-end reason() run that learns
above chance (reference test style: reason_test.py, relational_layers_test.py
— synthetic fixtures with analytically known structure)."""

import numpy as np
import pytest


def test_pairwise_edges_matches_naive():
    import jax.numpy as jnp

    from encdiff_tpu.evalx.abstract_reasoning.models import pairwise_edges

    rs = np.random.RandomState(0)
    x = rs.randn(2, 4, 3).astype(np.float32)
    out = np.asarray(pairwise_edges(jnp.asarray(x)))
    assert out.shape == (2, 4, 4, 6)
    for b in range(2):
        for i in range(4):
            for j in range(4):
                np.testing.assert_allclose(
                    out[b, i, j], np.concatenate([x[b, i], x[b, j]]))


def test_add_positional_encoding():
    import jax.numpy as jnp

    from encdiff_tpu.evalx.abstract_reasoning.models import (
        add_positional_encoding)

    x = np.random.RandomState(1).randn(2, 5, 3).astype(np.float32)
    out = np.asarray(add_positional_encoding(jnp.asarray(x)))
    assert out.shape == (2, 5, 8)
    np.testing.assert_allclose(out[..., :3], x)
    np.testing.assert_allclose(out[0, :, 3:], np.eye(5))


def test_stack_answers():
    import jax.numpy as jnp

    from encdiff_tpu.evalx.abstract_reasoning.models import stack_answers

    ctx = np.random.RandomState(2).randn(2, 8, 4).astype(np.float32)
    ans = np.random.RandomState(3).randn(2, 6, 4).astype(np.float32)
    out = np.asarray(stack_answers(jnp.asarray(ctx), jnp.asarray(ans)))
    assert out.shape == (2, 6, 9, 4)
    np.testing.assert_allclose(out[1, 3, :8], ctx[1])
    np.testing.assert_allclose(out[1, 3, 8], ans[1, 3])


@pytest.mark.parametrize("strategy", ["easy", "hard"])
def test_pgm_sampler_invariants(strategy):
    from encdiff_tpu.evalx.abstract_reasoning.pgm import PGM

    rs = np.random.RandomState(0)
    for _ in range(5):
        pgm = PGM(rs, num_relations=2, atom_counts=[5, 5, 4],
                  sampling_strategy=strategy)
        assert pgm.matrix.shape == (3, 3, 3)
        assert pgm.other_solutions.shape == (5, 3)
        # the true grid satisfies its own design
        assert pgm.design.is_consistent(pgm.matrix)
        # active relations are row-constant in the matrix
        for i in pgm.design.active_relations:
            rows = pgm.matrix[:, :, i]
            assert (rows == rows[:, :1]).all()
        # every alternative breaks the design when substituted in
        for alt in pgm.other_solutions:
            trial = np.copy(pgm.matrix)
            trial[-1, -1] = alt
            assert not pgm.design.is_consistent(trial)


def test_quantizer_maps_factor_ranges():
    from encdiff_tpu.evalx.abstract_reasoning.pgm_data import Quantizer
    from encdiff_tpu.evalx.ground_truth.datasets import IdentityObservationsData

    q = Quantizer(IdentityObservationsData(), [4] * 10)
    assert q.factors_num_values == [4] * 10
    rs = np.random.RandomState(0)
    factors = q.sample_factors(100, rs)
    assert factors.max() < 4
    obs = q.sample_observations_from_factors(factors, rs)
    # identity data: observations are the translated factors; quantized
    # value v maps to floor(v * 10/4) in the wrapped range
    np.testing.assert_array_equal(obs, np.floor(factors * 2.5))


def test_pgm_dataset_batches():
    from encdiff_tpu.evalx.abstract_reasoning.pgm_data import get_pgm_dataset
    from encdiff_tpu.evalx.ground_truth.datasets import DummyData

    ds = get_pgm_dataset(DummyData(), "easy_mixed", quantize=False)
    feats, labels = next(ds.batch_iterator(3, seed=0))
    assert feats["context"].shape == (3, 8, 64, 64, 1)
    assert feats["answers"].shape == (3, 6, 64, 64, 1)
    assert feats["context_factors_onehot"].shape == (3, 8, 50)
    assert feats["answers_factor_values"].shape == (3, 6, 10)
    assert labels.shape == (3,) and (labels >= 0).all() and (labels < 6).all()
    # factor embeddings live in [-0.5, 0.5]
    assert np.abs(feats["context_factor_values"]).max() <= 0.5 + 1e-6


def test_reason_learns_above_chance(tmp_path):
    """End-to-end: onehot WildRelNet on 3-relation easy PGMs over a
    3-factor identity dataset (all relations active — analytically
    solvable) must beat the 1/6 chance rate quickly (reason_test.py
    from-scratch pattern, sized for CI; measured val_acc 0.72 at 300
    steps)."""
    import json
    import os

    from encdiff_tpu.evalx.abstract_reasoning import reason
    from encdiff_tpu.evalx.ground_truth.core import GroundTruthData

    class Simple3(GroundTruthData):
        num_factors = property(lambda self: 3)
        factors_num_values = property(lambda self: [5, 5, 5])
        observation_shape = property(lambda self: 3)

        def sample_factors(self, num, rs):
            return rs.randint(5, size=(num, 3))

        def sample_observations_from_factors(self, f, rs):
            return f

    results = reason(
        Simple3(), str(tmp_path), pgm_type="easy_3",
        embedding="onehot", num_iterations=3,
        training_steps_per_iteration=100, eval_steps_per_iteration=5,
        batch_size=16, learning_rate=1e-3,
        edge_mlp=(64, 64), graph_mlp=(32,), quantize=False)
    assert os.path.exists(tmp_path / "results.json")
    with open(tmp_path / "results.json") as fh:
        saved = json.load(fh)
    assert saved["final_val_accuracy"] == results["final_val_accuracy"]
    assert results["final_val_accuracy"] > 0.4  # chance = 1/6


def test_reason_with_trained_representation_lookup(tmp_path):
    """The trained-representation protocol (reference HubEmbedding case):
    panels are integer indices into an index-backed dataset and
    ``representation_fn`` looks rows up in a precomputed representation
    table. With an ideal representation (the factors themselves) the
    WildRelNet must beat the 1/6 chance rate."""
    import numpy as np

    from encdiff_tpu.evalx.abstract_reasoning import reason
    from encdiff_tpu.evalx.ground_truth.core import IndexBackedDataset

    fs = [5, 5, 5]
    n = int(np.prod(fs))
    data = IndexBackedDataset(np.arange(n), fs)
    table = np.stack(np.unravel_index(np.arange(n), fs),
                     axis=1).astype(np.float32)
    table = (table - table.mean(0)) / table.std(0)

    def representation_fn(panels):
        return table[np.asarray(panels, np.int64)]

    results = reason(
        data, str(tmp_path), pgm_type="easy_3",
        representation_fn=representation_fn, num_iterations=3,
        training_steps_per_iteration=100, eval_steps_per_iteration=5,
        batch_size=16, learning_rate=1e-3,
        edge_mlp=(64, 64), graph_mlp=(32,), quantize=False)
    assert results["embedding"] == "representation"
    assert results["final_val_accuracy"] > 0.3, results
