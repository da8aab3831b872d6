"""Tests for the MPI3D / Cars3D procedural stand-ins (VERDICT r3 next #3).

Small-grid fixtures: the renderers accept arbitrary factor_sizes, so the
assertions run on tiny grids (seconds on one core) while the shipped
classes use the real structures [6,6,2,3,3,40,40] and [4,24,183]."""

import numpy as np
import pytest


def _bases(fs):
    return np.concatenate([np.cumprod(fs[::-1])[::-1][1:], [1]]).astype(
        np.int64)


# ---------------------------------------------------------------- MPI3D ---

MPI_TINY = [2, 3, 2, 2, 2, 4, 4]


@pytest.fixture(scope="module")
def mpi_imgs():
    from encdiff_tpu.data.synthetic_mpi3d import render_mpi3d_all

    return render_mpi3d_all(64, factor_sizes=MPI_TINY)


def test_mpi3d_shape_dtype(mpi_imgs):
    assert mpi_imgs.shape == (int(np.prod(MPI_TINY)), 64, 64, 3)
    assert mpi_imgs.dtype == np.uint8


def test_mpi3d_every_factor_has_pixel_effect(mpi_imgs):
    """Flipping each factor alone (others at 0) must change pixels — the
    GroundTruthData contract that makes every factor learnable."""
    bases = _bases(MPI_TINY)
    base_img = mpi_imgs[0]
    for k, n in enumerate(MPI_TINY):
        other = mpi_imgs[bases[k] * (n - 1)]
        diff = np.abs(base_img.astype(int) - other.astype(int)).mean()
        assert diff > 0.05, f"factor {k} has no pixel effect"


def test_mpi3d_factors_affect_disjoint_aspects(mpi_imgs):
    """Background color must not move the object: images differing only in
    bg agree wherever the object+arm sit (object pixels identical)."""
    bases = _bases(MPI_TINY)
    a = mpi_imgs[0].astype(int)
    b = mpi_imgs[bases[4]].astype(int)  # bg color 0 -> 1
    diffmask = np.abs(a - b).sum(-1) > 0
    # the arm+object region is unchanged -> the differing region is large
    # (background) and the images are NOT identical
    assert 0.3 < diffmask.mean() <= 1.0


def test_mpi3d_dof_sweep_is_smooth():
    """The 40-level DOFs are near-continuous: adjacent horizontal-axis
    levels must differ far less than the full sweep (smooth arc motion).
    Needs a fine grid — one step of a 16-level sweep covers 1/15 of the
    arc."""
    from encdiff_tpu.data.synthetic_mpi3d import render_mpi3d_all

    fs = [1, 1, 1, 1, 1, 16, 1]
    imgs = render_mpi3d_all(64, factor_sizes=fs).astype(int)
    step = np.abs(imgs[0] - imgs[1]).mean()
    span = np.abs(imgs[0] - imgs[15]).mean()
    assert span > 3.0 * step, (span, step)


def test_mpi3d_size_is_area_cue(mpi_imgs):
    """Equal-area shading (v4 lesson): at fixed size the object's pixel
    area must be roughly shape-independent."""
    from encdiff_tpu.data.synthetic_mpi3d import render_mpi3d_all

    fs = [1, 6, 1, 1, 1, 1, 1]
    imgs = render_mpi3d_all(64, factor_sizes=fs)
    # object pixels: differ from the flat background tone
    areas = []
    for i in range(6):
        bgmask = np.abs(imgs[i].astype(int)
                        - imgs[i][0, 0].astype(int)).sum(-1) > 40
        areas.append(bgmask.sum())
    areas = np.array(areas, float)
    assert areas.max() / max(areas.min(), 1.0) < 1.6, areas


def test_mpi3d_dataset_class_tiny():
    from encdiff_tpu.data.synthetic_mpi3d import SyntheticMPI3DFull

    class Tiny(SyntheticMPI3DFull):
        factor_sizes = MPI_TINY

    ds = Tiny()
    assert len(ds) == int(np.prod(MPI_TINY))
    item = ds[5]
    assert item["image"].shape == (64, 64, 3)
    assert -1.0 <= item["image"].min() and item["image"].max() <= 1.0
    assert item["idx"] == 5
    np.testing.assert_array_equal(ds.batch_uint8(np.array([0, 3])),
                                  ds.images[[0, 3]])


def test_mpi3d_real_structure_constants():
    from encdiff_tpu.data import synthetic_mpi3d as m
    from encdiff_tpu.evalx.ground_truth import datasets as gt

    assert m.MPI3D_FACTOR_SIZES == [6, 6, 2, 3, 3, 40, 40]
    assert m.N_IMAGES_MPI3D == gt.MPI3D.N == 1_036_800


# --------------------------------------------------------------- Cars3D ---

CARS_TINY = [2, 8, 12]


@pytest.fixture(scope="module")
def car_imgs():
    from encdiff_tpu.data.synthetic_cars3d import render_cars3d_all

    return render_cars3d_all(64, factor_sizes=CARS_TINY)


def test_cars3d_shape_dtype(car_imgs):
    assert car_imgs.shape == (int(np.prod(CARS_TINY)), 64, 64, 3)
    assert car_imgs.dtype == np.uint8


def test_cars3d_every_factor_has_pixel_effect(car_imgs):
    bases = _bases(CARS_TINY)
    for k, n in enumerate(CARS_TINY):
        diff = np.abs(car_imgs[0].astype(int)
                      - car_imgs[bases[k] * (n - 1)].astype(int)).mean()
        assert diff > 0.05, f"factor {k} has no pixel effect"


def test_cars3d_objects_are_distinct(car_imgs):
    """Object identity must be recoverable from appearance: mean color over
    the car pixels separates the objects (the 183-way GBT's cue)."""
    sigs = []
    for o in range(CARS_TINY[2]):
        img = car_imgs[o].astype(float)
        car = (np.abs(img - 248.0).sum(-1) > 60)
        sigs.append(img[car].mean(0) if car.any() else np.zeros(3))
    sigs = np.stack(sigs)
    d = np.linalg.norm(sigs[:, None] - sigs[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 3.0  # every object pair separated in color space


def test_cars3d_azimuth_full_cycle_identifiable(car_imgs):
    """az and az+180deg must differ (windshield/tail asymmetry) — the real
    renders are not symmetric front/back."""
    bases = _bases(CARS_TINY)
    half = CARS_TINY[1] // 2
    a = car_imgs[0].astype(int)
    b = car_imgs[bases[1] * half].astype(int)
    assert np.abs(a - b).mean() > 0.5


def test_cars3d_train_repeat_semantics():
    """The x10 epoch repeat (disdata.py:336-440): len is 10x the grid,
    indexing wraps, batch_uint8 mods into the physical rows."""
    from encdiff_tpu.data.synthetic_cars3d import SyntheticCars3DFullTrain

    class Tiny(SyntheticCars3DFullTrain):
        factor_sizes = CARS_TINY

    ds = Tiny()
    n = int(np.prod(CARS_TINY))
    assert len(ds) == 10 * n
    np.testing.assert_array_equal(ds[0]["image"], ds[n]["image"])
    np.testing.assert_array_equal(
        ds.batch_uint8(np.array([1, n + 1, 3 * n + 1])),
        ds.images[[1, 1, 1]])


def test_cars3d_real_structure_constants():
    from encdiff_tpu.data import synthetic_cars3d as c
    from encdiff_tpu.evalx.ground_truth import datasets as gt

    assert c.CARS3D_FACTOR_SIZES == [4, 24, 183]
    assert c.N_IMAGES_CARS3D == gt.Cars3D.N == 17_568


def test_configs_instantiate():
    """The four shipped demo configs resolve their data targets."""
    from encdiff_tpu.core.config import instantiate_from_config
    from encdiff_tpu.core.yamlcfg import OmegaConf

    for path in ("configs/demo/synthetic-cars3d-encdiff.yaml",
                 "configs/demo/synthetic-mpi3d-encdiff.yaml"):
        cfg = OmegaConf.load(path)
        model = instantiate_from_config(cfg["model"])
        assert model.label_dataset is not None
        n = (17_568 if "cars3d" in path else 1_036_800)
        assert model.label_dataset.images.shape[0] == n


def test_mpi3d_train_subset_is_seeded_uniform(tmp_path, monkeypatch):
    """subset_frac draws a seeded uniform subset (not a strided slice that
    would alias the last 40-level DOF), shrinks length/images accordingly,
    and is reproducible across constructions."""
    monkeypatch.setenv("ENCDIFF_DATA_CACHE", str(tmp_path))
    from encdiff_tpu.data import synthetic_mpi3d as m

    m._CACHE.clear()
    a = m.SyntheticMPI3DFullTrain(image_size=32, factor_sizes=MPI_TINY,
                                  subset_frac=0.5, subset_seed=3)
    b = m.SyntheticMPI3DFullTrain(image_size=32, factor_sizes=MPI_TINY,
                                  subset_frac=0.5, subset_seed=3)
    full = m.SyntheticMPI3DFull(image_size=32, factor_sizes=MPI_TINY)
    n = int(np.prod(MPI_TINY))
    assert len(a) == n // 2 and len(full) == n
    assert np.array_equal(a.images, b.images)
    # uniform over the grid: both halves of the flattened index represented
    sel = np.sort(np.random.default_rng(3).choice(n, n // 2, replace=False))
    assert np.array_equal(a.images, np.asarray(full.images)[sel])
    assert a.images.flags["C_CONTIGUOUS"]
    m._CACHE.clear()
