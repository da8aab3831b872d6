"""Procedurally generated matrices (PGMs) over discrete factor spaces.

Rebuild of the reference's ``evaluation/abstract_reasoning/pgm_utils.py``
(PGM:25-78, PGMDesign:80-177, relations:213-308) — the task generator of
"Are Disentangled Representations Helpful for Abstract Visual Reasoning?"
(arXiv 1905.12506). A PGM is a 3x3 grid of factor vectors where a random
subset of factors follows a row-constant relation and the rest are
relation-free; the task is to pick the bottom-right cell from a set of
alternatives.

Everything here is host-side numpy by design: the sampler is
rejection-based (data-dependent control flow), so it belongs on the host;
the learned models consume the resulting dense batches on device.
"""

from __future__ import annotations

import numpy as np


def _rows_constant(rows: np.ndarray) -> bool:
    return bool((rows == rows[:, :1]).all())


def _rows_distinct(rows: np.ndarray) -> bool:
    return all(len(np.unique(r)) == len(r) for r in rows)


class ConstantRelation:
    """Each row holds one repeated atom (pgm_utils.py:239-256)."""

    def __init__(self, num_atoms: int, num_rows: int = 3, num_cols: int = 3):
        if num_atoms < num_cols:
            raise ValueError("Cannot have less atoms than columns.")
        if num_atoms == 1:
            raise ValueError("Need more than one atom.")
        self.num_atoms = num_atoms
        self.num_rows = num_rows
        self.num_cols = num_cols

    @staticmethod
    def is_consistent(rows: np.ndarray) -> bool:
        return _rows_constant(rows)

    def sample(self, rs: np.random.RandomState) -> np.ndarray:
        atoms = rs.choice(self.num_atoms, size=self.num_rows)
        return np.repeat(atoms[:, None], self.num_cols, axis=1)


class DistinctRelation(ConstantRelation):
    """Row elements pairwise distinct (pgm_utils.py:263-281)."""

    @staticmethod
    def is_consistent(rows: np.ndarray) -> bool:
        return _rows_distinct(rows)

    def sample(self, rs: np.random.RandomState) -> np.ndarray:
        return np.stack([rs.permutation(self.num_atoms)[:self.num_cols]
                         for _ in range(self.num_rows)])


class NonActiveRelation(ConstantRelation):
    """Random values whose leading rows satisfy NO known relation
    (pgm_utils.py:284-308) — the distractor factors."""

    @staticmethod
    def is_consistent(rows: np.ndarray) -> bool:
        head = rows[:-1]
        return not (_rows_constant(head) or _rows_distinct(head))

    def sample(self, rs: np.random.RandomState) -> np.ndarray:
        for _ in range(1000):
            rows = rs.choice(self.num_atoms,
                             size=(self.num_rows, self.num_cols))
            if self.is_consistent(rows):
                return rows
        raise ValueError("Could not sample non-relational matrix.")


class PGMDesign:
    """The rules of one PGM: which factors carry an active (constant)
    relation (pgm_utils.py:80-177). Values are sampled separately so the
    same design can generate alternative (wrong) answers."""

    def __init__(self, random_state, num_relations: int, atom_counts,
                 num_rows: int = 3, num_cols: int = 3):
        self.random_state = random_state
        self.num_relations = num_relations
        self.atom_counts = list(atom_counts)
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.num_factors = len(self.atom_counts)
        if self.num_factors < num_relations:
            raise ValueError("Cannot have less factors than relations.")

        chosen = random_state.permutation(self.num_factors)[:num_relations]
        self.active_relations = [int(i) for i in chosen]
        self.relations = [
            (ConstantRelation if i in self.active_relations
             else NonActiveRelation)(n, num_rows, num_cols)
            for i, n in enumerate(self.atom_counts)]

    def sample(self) -> np.ndarray:
        """(num_rows, num_cols, num_factors) int64 factor grid."""
        return np.stack([r.sample(self.random_state)
                         for r in self.relations], axis=-1).astype(np.int64)

    def is_consistent(self, matrix: np.ndarray) -> bool:
        return all(r.is_consistent(matrix[:, :, i])
                   for i, r in enumerate(self.relations))

    def resample_design(self) -> "PGMDesign":
        return PGMDesign(self.random_state, self.num_relations,
                         self.atom_counts, self.num_rows, self.num_cols)

    def randomly_modify_solution(self, cell: np.ndarray) -> np.ndarray:
        """Perturb a single bottom-right factor vector: re-roll one active
        factor + all non-active factors (pgm_utils.py:137-158) — the 'hard'
        alternative generator."""
        out = np.copy(cell)
        i = self.random_state.choice(self.active_relations)
        out[i] = self.random_state.choice(self.relations[i].num_atoms)
        for j, rel in enumerate(self.relations):
            if j not in self.active_relations:
                out[j] = self.random_state.choice(rel.num_atoms)
        return out


def _sample_easy_alternative(design, matrix, already):
    """Wrong answer from an independently re-sampled design
    (pgm_utils.py:179-192)."""
    for _ in range(100):
        cand = design.resample_design().sample()[-1, -1]
        trial = np.copy(matrix)
        trial[-1, -1] = cand
        if design.is_consistent(trial):
            continue
        if any(np.array_equal(a, cand) for a in already):
            continue
        return cand
    raise ValueError("Could not sample alternative solutions.")


def _sample_hard_alternative(design, matrix, already):
    """Wrong answer as a minimal perturbation of the true answer
    (pgm_utils.py:195-210)."""
    cell = matrix[-1, -1]
    for _ in range(100):
        cell = design.randomly_modify_solution(cell)
        trial = np.copy(matrix)
        trial[-1, -1] = cell
        if design.is_consistent(trial):
            continue
        if any(np.array_equal(a, cell) for a in already):
            continue
        return cell
    raise ValueError("Could not sample hard alternative solutions.")


class PGM:
    """One sampled PGM instance in factor space (pgm_utils.py:25-78):
    ``matrix`` (rows, cols, factors) plus ``num_solutions-1`` wrong
    bottom-right cells."""

    def __init__(self, random_state, num_relations: int, atom_counts,
                 sampling_strategy: str = "easy", num_rows: int = 3,
                 num_cols: int = 3, num_solutions: int = 6):
        if sampling_strategy == "easy":
            sampler = _sample_easy_alternative
        elif sampling_strategy == "hard":
            sampler = _sample_hard_alternative
        else:
            raise ValueError("Only easy and hard sampling are supported.")
        self.design = PGMDesign(random_state, num_relations, atom_counts,
                                num_rows, num_cols)
        self.matrix = self.design.sample()
        alts = []
        for _ in range(num_solutions - 1):
            alts.append(sampler(self.design, self.matrix, alts))
        self.other_solutions = np.array(alts)
