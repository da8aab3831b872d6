"""PGM datasets over the GroundTruthData protocol.

Rebuild of ``evaluation/abstract_reasoning/pgm_data.py`` (get_pgm_dataset:
38-89, PGMDataset:92-181, PGMInstance:184-302, Quantizer:351-397) without
the tf.data/TPUEstimator machinery: sampling stays host-side numpy, and
``batch_iterator`` yields dense dict batches ready for ``jax.device_put``.
"""

from __future__ import annotations

import numpy as np

from encdiff_tpu.evalx.abstract_reasoning.pgm import PGM
from encdiff_tpu.evalx.ground_truth.core import GroundTruthData


class Quantizer(GroundTruthData):
    """Caps each factor's cardinality, mapping the reduced factor range
    back onto the wrapped data's range (pgm_data.py:351-397) — keeps PGM
    relations learnable on datasets with very fine factors."""

    def __init__(self, wrapped: GroundTruthData, max_factors):
        self.wrapped = wrapped
        self.true_num = list(wrapped.factors_num_values)
        self.fake_num = list(np.minimum(self.true_num, max_factors))

    @property
    def num_factors(self):
        return self.wrapped.num_factors

    @property
    def factors_num_values(self):
        return self.fake_num

    @property
    def observation_shape(self):
        return self.wrapped.observation_shape

    def sample_factors(self, num, random_state):
        return np.stack(
            [random_state.randint(n, size=num) for n in self.fake_num],
            axis=1).astype(np.int64)

    def sample_observations_from_factors(self, factors, random_state):
        translated = np.copy(factors)
        for i, (t, f) in enumerate(zip(self.true_num, self.fake_num)):
            if t != f:
                translated[..., i] = np.floor(factors[..., i] * (t / f))
        return self.wrapped.sample_observations_from_factors(
            translated, random_state)


def _onehot(indices, num):
    return np.eye(num, dtype=np.float32)[indices]


class PGMInstance:
    """One image-space PGM: 3x3 solution grid, alternative answers, and the
    position of the correct answer (pgm_data.py:184-302)."""

    def __init__(self, solution, alternatives, position,
                 solution_factors=None, alternatives_factors=None,
                 num_factor_values=None):
        self.solution = solution                  # (R, C, *obs)
        self.alternatives = alternatives          # (A-1, *obs)
        self.position = position
        self.solution_factors = solution_factors
        self.alternatives_factors = alternatives_factors
        self.num_factor_values = num_factor_values

    def get_context(self):
        """(R*C - 1, *obs): all grid cells but the bottom-right."""
        flat = self.solution.reshape((-1,) + self.solution.shape[2:])
        return np.asarray(flat[:-1], np.float32)

    def get_answers(self):
        """(A, *obs): alternatives with the truth inserted at position."""
        out = list(self.alternatives)
        out.insert(self.position, self.solution[-1, -1])
        return np.asarray(out, np.float32)

    def _context_factors(self):
        flat = self.solution_factors.reshape(-1,
                                             self.solution_factors.shape[-1])
        return flat[:-1]

    def _answers_factors(self):
        out = list(self.alternatives_factors)
        out.insert(self.position, self.solution_factors[-1, -1])
        return np.asarray(out)

    def range_embed_factors(self, factors):
        """Linear embedding to [-0.5, 0.5] (pgm_data.py:257-270)."""
        maxv = np.asarray(self.num_factor_values, np.float32) - 1.0
        return np.asarray(factors, np.float32) / maxv[None] - 0.5

    def onehot_embed_factors(self, factors):
        return np.concatenate(
            [_onehot(factors[:, i], n)
             for i, n in enumerate(self.num_factor_values)],
            axis=-1).astype(np.float32)

    def training_sample(self):
        sample = {"context": self.get_context(),
                  "answers": self.get_answers()}
        if self.solution_factors is not None:
            cf, af = self._context_factors(), self._answers_factors()
            sample["context_factor_values"] = self.range_embed_factors(cf)
            sample["answers_factor_values"] = self.range_embed_factors(af)
            sample["context_factors_onehot"] = self.onehot_embed_factors(cf)
            sample["answers_factors_onehot"] = self.onehot_embed_factors(af)
        return sample, self.position


class PGMDataset:
    """Sampler of PGMInstances over a GroundTruthData (pgm_data.py:92-181)."""

    def __init__(self, ground_truth_data: GroundTruthData,
                 sampling_strategy: str, relations_dist):
        self.ground_truth_data = ground_truth_data
        self.sampling_strategy = sampling_strategy
        self.relations_dist = list(relations_dist)

    def sample(self, random_state) -> PGMInstance:
        num_relations = 1 + random_state.choice(
            len(self.relations_dist), p=self.relations_dist)
        pgm = PGM(random_state, num_relations,
                  self.ground_truth_data.factors_num_values,
                  sampling_strategy=self.sampling_strategy)
        solution = np.stack([
            self.ground_truth_data.sample_observations_from_factors(
                row, random_state) for row in pgm.matrix])
        alternatives = self.ground_truth_data.sample_observations_from_factors(
            pgm.other_solutions, random_state)
        position = random_state.choice(len(alternatives) + 1)
        return PGMInstance(solution, alternatives, position, pgm.matrix,
                           pgm.other_solutions,
                           self.ground_truth_data.factors_num_values)

    def batch_iterator(self, batch_size: int, seed: int):
        """Infinite iterator of (features dict, labels) numpy batches — the
        tf.data.Dataset.from_generator equivalent (pgm_data.py:140-166)."""
        rs = np.random.RandomState(seed)
        while True:
            feats, labels = [], []
            for _ in range(batch_size):
                f, l = self.sample(rs).training_sample()
                feats.append(f)
                labels.append(l)
            batch = {k: np.stack([f[k] for f in feats]) for k in feats[0]}
            yield batch, np.asarray(labels, np.int32)


def get_pgm_dataset(ground_truth_data: GroundTruthData, pgm_type: str,
                    quantize: bool = True):
    """Named PGM dataset factory (pgm_data.py:38-89). ``pgm_type`` is
    '{easy|hard}_{1|2|3|mixed}'. Shapes3D-family data is quantized to
    [10,10,10,4,4,4] per the paper's protocol."""
    data = ground_truth_data
    if quantize:
        nv = list(data.factors_num_values)
        if len(nv) == 6:
            data = Quantizer(data, [10, 10, 10, 4, 4, 4])
    strategy, _, suffix = pgm_type.partition("_")
    if strategy not in ("easy", "hard"):
        raise ValueError("Invalid sampling strategy.")
    dist = {"1": [1.0, 0.0, 0.0], "2": [0.0, 1.0, 0.0],
            "3": [0.0, 0.0, 1.0],
            "mixed": [1 / 3, 1 / 3, 1 / 3]}.get(suffix)
    if dist is None:
        raise ValueError("Invalid number of relations.")
    return PGMDataset(data, strategy, dist)
