"""Procedural Shapes3D-style dataset: a complete factor grid rendered on the
fly — real disentanglement training/eval without any downloaded files.

Factors (complete Cartesian grid, Shapes3D-like semantics — shapes3d.py:44):

    floor_hue(6) x wall_hue(6) x object_hue(6) x scale(4) x shape(4)
    x orientation(8)  ->  N = 27,648 images, 64x64x3 uint8 (~340 MB RAM)

Scenes: floor/wall color planes split by a horizon, one centered object
(square / circle / triangle / diamond) whose size tracks ``scale`` and whose
horizontal position tracks ``orientation`` (standing in for azimuth). Every
factor has a visible, independent pixel effect, so a disentangling model
reaches high DCI/FactorVAE on it — which is what makes it a faithful
stand-in benchmark for the Shapes3D protocol when the HDF5 file is absent
(zero-egress environments).

Index layout matches the GroundTruthData convention: index =
dot(factors, factor_bases), same as ``SplitDiscreteStateSpace``.
"""

from __future__ import annotations

import colorsys

import numpy as np

from encdiff_tpu.data.datasets import ArrayDataset

FACTOR_SIZES = [6, 6, 6, 4, 4, 8]
FACTOR_NAMES = ["floor_hue", "wall_hue", "object_hue", "scale", "shape",
                "orientation"]
N_IMAGES = int(np.prod(FACTOR_SIZES))  # 27648


def _hue_rgb(i: int, n: int, s: float = 0.85, v: float = 0.95) -> np.ndarray:
    r, g, b = colorsys.hsv_to_rgb(i / n, s, v)
    return np.array([r, g, b], np.float32) * 255.0


def _shape_mask(shape_idx: int, scale_idx: int, orient_idx: int,
                size: int = 64) -> np.ndarray:
    """Boolean mask of the object for one geometry combination."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    radius = 8.0 + 3.0 * scale_idx                     # 8..17 px
    cx = size / 2 + (orient_idx - (FACTOR_SIZES[5] - 1) / 2) * 3.2
    cy = size * 0.62
    dx, dy = xx - cx, yy - cy
    if shape_idx == 0:      # square
        return (np.abs(dx) < radius) & (np.abs(dy) < radius)
    if shape_idx == 1:      # circle
        return dx**2 + dy**2 < radius**2
    if shape_idx == 2:      # triangle (pointing up)
        return (dy < radius) & (dy > -radius) & \
               (np.abs(dx) < (dy + radius) / 2)
    # diamond
    return np.abs(dx) + np.abs(dy) < radius * 1.3


def render_all(size: int = 64, horizon: float = 0.55) -> np.ndarray:
    """The full factor grid as one uint8 array (N, size, size, 3)."""
    f_floor, f_wall, f_obj, f_scale, f_shape, f_orient = FACTOR_SIZES
    floor_colors = np.stack([_hue_rgb(i, f_floor) for i in range(f_floor)])
    wall_colors = np.stack([_hue_rgb(i, f_wall, s=0.6, v=0.8)
                            for i in range(f_wall)])
    obj_colors = np.stack([_hue_rgb(i, f_obj, s=1.0, v=1.0)
                           for i in range(f_obj)])

    hy = int(size * horizon)
    # geometry masks: (scale, shape, orientation) -> (size, size)
    masks = np.zeros((f_scale, f_shape, f_orient, size, size), bool)
    for sc in range(f_scale):
        for sh in range(f_shape):
            for orient in range(f_orient):
                masks[sc, sh, orient] = _shape_mask(sh, sc, orient, size)

    out = np.empty((N_IMAGES, size, size, 3), np.uint8)
    bases = np.concatenate(
        [np.cumprod(FACTOR_SIZES[::-1])[::-1][1:], [1]]).astype(np.int64)
    bg = np.empty((size, size, 3), np.float32)
    for fl in range(f_floor):
        for wa in range(f_wall):
            bg[:hy] = wall_colors[wa]
            bg[hy:] = floor_colors[fl]
            for ob in range(f_obj):
                for sc in range(f_scale):
                    for sh in range(f_shape):
                        for orient in range(f_orient):
                            idx = int(np.dot(
                                [fl, wa, ob, sc, sh, orient], bases))
                            img = bg.copy()
                            img[masks[sc, sh, orient]] = obj_colors[ob]
                            out[idx] = img.astype(np.uint8)
    return out


_CACHE: dict[int, np.ndarray] = {}


def get_images(size: int = 64) -> np.ndarray:
    if size not in _CACHE:
        _CACHE[size] = render_all(size)
    return _CACHE[size]


class SyntheticShapes3D(ArrayDataset):
    """Training dataset over the procedural grid (drop-in for Shapes3DTrain
    in configs; pair with ``eval_name: synthetic_shapes``)."""

    def __init__(self, image_size: int = 64, **kwargs):
        del kwargs
        super().__init__(get_images(image_size), with_idx=True)


class SyntheticShapes3DTrain(SyntheticShapes3D):
    pass
