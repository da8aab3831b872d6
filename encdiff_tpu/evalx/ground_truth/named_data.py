"""Dataset-name registry (parity with data/ground_truth/named_data.py and
the eval_name dispatch in ddpm_enc.py:122-130)."""

from __future__ import annotations

import numpy as np

from encdiff_tpu.evalx.ground_truth import datasets


_REGISTRY = {
    "shapes3d": datasets.Shapes3D,
    "3dshapes": datasets.Shapes3D,
    "mpi3d": datasets.MPI3D,
    "cars3d": datasets.Cars3D,
    "dsprites": datasets.DSprites,
    "dsprites_full": datasets.DSprites,
    "smallnorb": datasets.SmallNORB,
    "synthetic_shapes": datasets.SyntheticShapes,
    "synthetic_shapes_full": datasets.SyntheticShapesFull,
    "dummy_data": datasets.DummyData,
}


def get_named_ground_truth_data(name: str, images=None):
    name = name.lower()
    if name not in _REGISTRY:
        raise ValueError(f"Unknown ground-truth dataset {name!r}; "
                         f"available: {sorted(_REGISTRY)}")
    cls = _REGISTRY[name]
    if name == "dummy_data":
        return cls()
    return cls(images)


def get_index_dataset(name: str):
    """Dataset over np.arange(N): observations are representation indices
    (the ddpm_enc.py:122-130 trick)."""
    return get_named_ground_truth_data(name, images=None)
