"""Concrete ground-truth factor datasets.

Factor tables match the reference exactly (``data/ground_truth/*.py``):
  Shapes3D  [10,10,10,8,4,15]            N=480000   (shapes3d.py:44)
  MPI3D     [6,6,2,3,3,40,40]            N=1036800  (mpi3d.py:56-59)
  Cars3D    [4,24,183]                   N=17568    (cars3d.py:45-52)
  DSprites  [1,3,6,40,32,32], latents 1-5 N=737280  (dsprites.py:44-59)
  SmallNORB [5,10,9,18,6], latents 0,2,3,4          (norb.py:59-66)

All datasets here are index-backed: pass ``np.arange(N)`` (the default) for
the representation-lookup trick, or real image arrays for pixel-level eval.
``DummyData`` / ``IdentityObservationsData`` reproduce the test fixtures the
reference metric unit tests rely on (dummy_data.py:23-70).
"""

from __future__ import annotations

import numpy as np

from encdiff_tpu.evalx.ground_truth.core import (
    GroundTruthData, IndexBackedDataset, StateSpaceAtomIndex,
)


class Shapes3D(IndexBackedDataset):
    """floor hue / wall hue / object hue / scale / shape / azimuth."""

    N = 480_000

    def __init__(self, images=None):
        if images is None:
            images = np.arange(self.N)
        super().__init__(images, [10, 10, 10, 8, 4, 15],
                         observation_shape=(64, 64, 3))


class MPI3D(IndexBackedDataset):
    """object color/shape/size, camera height, bg color, DOF1, DOF2."""

    N = 1_036_800

    def __init__(self, images=None):
        if images is None:
            images = np.arange(self.N)
        super().__init__(images, [6, 6, 2, 3, 3, 40, 40],
                         observation_shape=(64, 64, 3))


class Cars3D(IndexBackedDataset):
    """elevation / azimuth / object type."""

    N = 17_568

    def __init__(self, images=None):
        if images is None:
            images = np.arange(self.N)
        super().__init__(images, [4, 24, 183], observation_shape=(64, 64, 3))


class DSprites(IndexBackedDataset):
    """color(1) / shape / scale / orientation / posX / posY; color excluded
    from the latents like the reference default."""

    N = 737_280

    def __init__(self, images=None, latent_factor_indices=(1, 2, 3, 4, 5)):
        if images is None:
            images = np.arange(self.N)
        super().__init__(images, [1, 3, 6, 40, 32, 32],
                         latent_factor_indices=list(latent_factor_indices),
                         observation_shape=(64, 64, 1))


class SmallNORB(IndexBackedDataset):
    """category / instance / elevation / azimuth / lighting; instance is a
    nuisance factor (norb.py:61)."""

    def __init__(self, images=None):
        sizes = [5, 10, 9, 18, 6]
        n = int(np.prod(sizes))
        if images is None:
            images = np.arange(n)
        super().__init__(images, sizes, latent_factor_indices=[0, 2, 3, 4],
                         observation_shape=(64, 64, 1))


class SyntheticShapes(IndexBackedDataset):
    """Procedural Shapes3D-style grid (encdiff_tpu/data/synthetic_shapes.py):
    floor/wall/object hue, scale, shape, orientation."""

    N = 27_648

    def __init__(self, images=None):
        if images is None:
            images = np.arange(self.N)
        super().__init__(images, [6, 6, 6, 4, 4, 8],
                         observation_shape=(64, 64, 3))


class SyntheticShapesFull(IndexBackedDataset):
    """Procedural grid with Shapes3D's EXACT factor sizes [10,10,10,8,4,15]
    (shapes3d.py:44) — 480,000 images; the quality-parity benchmark."""

    N = 480_000

    def __init__(self, images=None):
        if images is None:
            images = np.arange(self.N)
        super().__init__(images, [10, 10, 10, 8, 4, 15],
                         observation_shape=(64, 64, 3))


class DummyData(GroundTruthData):
    """Random-noise image dataset for metric tests (dummy_data.py:47-70)."""

    @property
    def num_factors(self):
        return 10

    @property
    def factors_num_values(self):
        return [5] * 10

    @property
    def observation_shape(self):
        return [64, 64, 1]

    def sample_factors(self, num, random_state):
        return random_state.randint(5, size=(num, self.num_factors))

    def sample_observations_from_factors(self, factors, random_state):
        return random_state.random_sample(size=(factors.shape[0], 64, 64, 1))


class IdentityObservationsData(GroundTruthData):
    """Observations ARE the factors — lets metrics be validated analytically
    (dummy_data.py:23-44)."""

    @property
    def num_factors(self):
        return 10

    @property
    def factors_num_values(self):
        return [10] * 10

    @property
    def observation_shape(self):
        return 10

    def sample_factors(self, num, random_state):
        return random_state.randint(1, 11, size=(num, self.num_factors))

    def sample_observations_from_factors(self, factors, random_state):
        return factors


# Back-compat aliases mirroring reference module layout (each reference
# data/ground_truth/<name>.py exposes a `Dataset` class).
Dataset = Shapes3D
