"""Procedural MPI3D stand-in: the EXACT real factor structure rendered on
the fly — cross-dataset generality evidence without the 12 GB download.

Real MPI3D (`mpi3d_toy.npz`; reference loader ``ldm/data/disdata.py:244-283``,
eval table ``data/ground_truth/mpi3d.py:55-58``) is a robot arm photographed
on a stage; its seven factors, in index order, are

    object_color(6) x object_shape(6) x object_size(2) x camera_height(3)
    x background_color(3) x horizontal_axis(40) x vertical_axis(40)
    ->  N = 1,036,800 images, 64x64x3

The two 40-level axes are the arm's two rotational DOFs — near-continuous
factors that stress exactly what the Shapes3D grid (max 15 levels) never
does (VERDICT r3 next #3). This stand-in keeps every structural property
that matters for the disentanglement protocol:

- the full Cartesian grid in the same index order (index = dot(factors,
  bases)), so ``eval_name: mpi3d`` (evalx/ground_truth/datasets.py MPI3D,
  N=1,036,800) scores it with the unmodified reference protocol;
- an articulated arm whose tip position is a smooth function of the two
  40-level DOFs (horizontal -> azimuth arc, vertical -> elevation arc), the
  object riding the tip — so the DOFs have the same smooth, spatially
  entangled pixel signature the real arm has (the arm pixels themselves
  couple both DOFs, as in the real data);
- 6 object shapes with shape-specific interior shading and equal-area
  radii (the v4-renderer lesson: silhouette area must be a pure size cue);
- camera_height moving the horizon and the whole arm assembly vertically;
- muted background tones like the real stage.

Rendering is vectorized over the 1600-image (hor x vert) innermost block:
~36 geometry iterations + 648 composition blocks, ~2-4 min and 12.7 GB RAM
on this box; disk-cached under $ENCDIFF_DATA_CACHE like the v2-v4 Shapes3D
renderers.
"""

from __future__ import annotations

import os

import numpy as np

from encdiff_tpu.data.datasets import ArrayDataset
from encdiff_tpu.data.synthetic_shapes import _hue_rgb

#: real MPI3D factor sizes in the real index order (mpi3d.py:55-58)
MPI3D_FACTOR_SIZES = [6, 6, 2, 3, 3, 40, 40]
MPI3D_FACTOR_NAMES = ["object_color", "object_shape", "object_size",
                      "camera_height", "background_color",
                      "horizontal_axis", "vertical_axis"]
N_IMAGES_MPI3D = int(np.prod(MPI3D_FACTOR_SIZES))  # 1,036,800


def _shape_sdf_and_shade(sh: int, rx, ry, r):
    """Signed distance + interior shading for shape family ``sh`` on
    rotated-frame coords (rx, ry), radius r. Equal-area radii and
    mean-normalized shade follow render_all_v4 (synthetic_shapes.py:318):
    area is a pure size cue, interior pattern a pure shape cue."""
    if sh == 0:      # square, two flat facets
        d = np.maximum(np.abs(rx), np.abs(ry)) - r * 0.886
        s = 0.84 + 0.16 * np.clip(rx / 1.2 + 0.5, 0.0, 1.0)
    elif sh == 1:    # circle (sphere): offset radial falloff
        d = np.sqrt(rx * rx + ry * ry) - r
        rr = np.sqrt((rx + 0.35 * r) ** 2 + (ry + 0.35 * r) ** 2) / max(r, 1.0)
        s = 1.05 - 0.28 * np.clip(rr, 0.0, 1.6)
    elif sh == 2:    # triangle (cone): apex-to-base ramp
        k = r * 1.253
        d = 0.5 * np.maximum(np.abs(rx) * 2.0 - (ry + k), np.abs(ry) - k)
        s = 1.04 - 0.26 * np.clip((ry + k) / (2.0 * k), 0.0, 1.0)
    elif sh == 3:    # diamond: diagonal ramp
        d = (np.abs(rx) + np.abs(ry) - r * 1.253) * 0.7071
        s = 0.82 + 0.26 * np.clip((rx + ry) / (2.6 * r) + 0.5, 0.0, 1.0)
    elif sh == 4:    # hexagon: concentric ring shading
        ax, ay = np.abs(rx), np.abs(ry)
        k = r * 1.05
        d = np.maximum(ax * 0.866 + ay * 0.5, ay) - k
        s = 0.85 + 0.24 * np.clip(np.maximum(ax, ay) / k, 0.0, 1.0)
    else:            # cross/plus: checker-free two-arm shading
        k = r * 1.35
        bar = np.minimum(np.maximum(np.abs(rx) - 0.4 * k, np.abs(ry) - k),
                         np.maximum(np.abs(rx) - k, np.abs(ry) - 0.4 * k))
        d = bar
        s = 0.88 + 0.22 * np.clip((np.abs(rx) - np.abs(ry)) / k + 0.5,
                                  0.0, 1.0)
    return d, s


def render_mpi3d_all(size: int = 64, factor_sizes=None) -> np.ndarray:
    """Render the complete grid. Returns (N, size, size, 3) uint8 with
    index = dot(factors, bases) in MPI3D's factor order."""
    fs = list(MPI3D_FACTOR_SIZES if factor_sizes is None else factor_sizes)
    f_col, f_shp, f_siz, f_cam, f_bg, f_hor, f_ver = fs
    n_images = int(np.prod(fs))
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    edge = 1.2

    obj_colors = np.stack([_hue_rgb(i, f_col, s=0.95, v=0.95)
                           for i in range(f_col)])
    # muted stage backgrounds (real mpi3d: gray-green/gray-blue tones)
    bg_tones = [np.array([168, 168, 168], np.float32),
                np.array([150, 168, 150], np.float32),
                np.array([150, 158, 172], np.float32)][:f_bg]

    # arm geometry: pivot at bottom-center; tip sweeps an arc
    th_h = np.deg2rad(-55.0 + 110.0 * (np.arange(f_hor) /
                                       max(f_hor - 1, 1))).astype(np.float32)
    th_v = (np.arange(f_ver) / max(f_ver - 1, 1)).astype(np.float32)

    # (hor, ver) tip positions for each camera height
    n_hv = f_hor * f_ver
    radii_obj = [5.0, 8.0][:f_siz] if f_siz <= 2 else [
        4.0 + 5.0 * i / max(f_siz - 1, 1) for i in range(f_siz)]

    out = np.empty((n_images, size, size, 3), np.uint8)

    # geometry pass: alpha+shade blocks per (shape, size, cam), vectorized
    # over the 1600 (hor, ver) combinations
    geo_alpha = {}
    geo_shade = {}
    arm_alpha = {}
    for cam in range(f_cam):
        pivot_y = size * (0.97 - 0.06 * cam)
        pivot_x = size * 0.5
        arm_len = size * (0.62 - 0.05 * cam)
        # tip position: horizontal axis sets azimuth (x), vertical axis sets
        # how far up the arc the arm reaches (y + slight x foreshortening)
        reach = 0.35 + 0.62 * th_v                       # (V,)
        tx = (pivot_x + arm_len * np.sin(th_h)[:, None]
              * (0.75 + 0.25 * reach[None, :]))          # (H, V)
        ty = pivot_y - arm_len * reach[None, :] * np.cos(
            0.5 * th_h)[:, None]                         # (H, V)
        tx = tx.reshape(-1)                              # (HV,)
        ty = ty.reshape(-1)

        # arm: distance from each pixel to the pivot->tip segment (vectorized
        # over the HV block), 1.6 px half-width, dark gray
        px = xx[None] - pivot_x                          # (1, S, S)
        py = yy[None] - pivot_y
        vx = (tx - pivot_x)[:, None, None]               # (HV, 1, 1)
        vy = (ty - pivot_y)[:, None, None]
        vv = vx * vx + vy * vy
        t = np.clip((px * vx + py * vy) / np.maximum(vv, 1e-6), 0.0, 1.0)
        dist = np.sqrt((px - t * vx) ** 2 + (py - t * vy) ** 2)
        arm_alpha[cam] = np.clip(0.5 - (dist - 1.6) / edge,
                                 0.0, 1.0)[..., None].astype(np.float32)
        del px, py, vx, vy, vv, t, dist

        for sh in range(f_shp):
            for sz in range(f_siz):
                r = radii_obj[sz]
                dx = xx[None] - tx[:, None, None]        # (HV, S, S)
                dy = yy[None] - ty[:, None, None]
                # slight in-plane rotation with the horizontal DOF (the
                # object turns as the arm swings, like the real rig)
                ang = 0.3 * np.repeat(th_h, f_ver)[:, None, None]
                ca, sa = np.cos(ang), np.sin(ang)
                rx, ry = ca * dx + sa * dy, -sa * dx + ca * dy
                d, s = _shape_sdf_and_shade(sh % 6, rx, ry, r)
                a = np.clip(0.5 - d / edge, 0.0, 1.0)
                # mean-normalize shading inside each mask so brightness
                # leaks neither size nor shape (v4 lesson)
                m = a > 0.5
                cnt = np.maximum(m.sum(axis=(1, 2)), 1)
                mean_s = (s * m).sum(axis=(1, 2)) / cnt
                s = s * (0.92 / np.maximum(mean_s, 1e-6))[:, None, None]
                geo_alpha[(sh, sz, cam)] = a[..., None].astype(np.float32)
                geo_shade[(sh, sz, cam)] = s[..., None].astype(np.float32)
                del dx, dy, ang, ca, sa, rx, ry, d, s, a, m

    arm_color = np.array([70, 70, 74], np.float32)
    # composition pass in index order: col, shp, siz, cam, bg | hor, ver
    idx = 0
    for col in range(f_col):
        for sh in range(f_shp):
            for sz in range(f_siz):
                for cam in range(f_cam):
                    a_obj = geo_alpha[(sh, sz, cam)]
                    col_obj = obj_colors[col] * geo_shade[(sh, sz, cam)]
                    a_arm = arm_alpha[cam]
                    for bg in range(f_bg):
                        blk = np.empty((n_hv, size, size, 3), np.float32)
                        blk[:] = bg_tones[bg]
                        # floor line tracks camera height
                        hy = int(size * (0.80 - 0.05 * cam))
                        blk[:, hy:] *= 0.82
                        blk = (1.0 - a_arm) * blk + a_arm * arm_color
                        blk = (1.0 - a_obj) * blk + a_obj * col_obj
                        np.copyto(out[idx:idx + n_hv],
                                  np.clip(blk, 0, 255).astype(np.uint8))
                        idx += n_hv
    assert idx == n_images
    return out


_CACHE: dict[tuple, np.ndarray] = {}


def get_mpi3d_images(size: int = 64, factor_sizes=None) -> np.ndarray:
    fs = tuple(MPI3D_FACTOR_SIZES if factor_sizes is None else factor_sizes)
    key = (size, fs)
    if key not in _CACHE:
        cache_dir = os.environ.get("ENCDIFF_DATA_CACHE", "/tmp/encdiff_cache")
        tag = "x".join(map(str, fs))
        path = os.path.join(cache_dir, f"mpi3d_{size}_{tag}.npy")
        if os.path.exists(path):
            _CACHE[key] = np.load(path, mmap_mode="r")
        else:
            arr = render_mpi3d_all(size, factor_sizes=list(fs))
            os.makedirs(cache_dir, exist_ok=True)
            np.save(path, arr)
            _CACHE[key] = arr
    return _CACHE[key]


class SyntheticMPI3DFull(ArrayDataset):
    """The full 1,036,800-image grid (pair with ``eval_name: mpi3d``).
    12.7 GB uint8 — above the 8 GB device-resident input threshold, so the
    harness streams batches from host RAM (mmap-backed)."""

    factor_sizes = MPI3D_FACTOR_SIZES

    def __init__(self, image_size: int = 64, factor_sizes=None, **kwargs):
        del kwargs
        if factor_sizes is not None:
            self.factor_sizes = list(factor_sizes)
        super().__init__(get_mpi3d_images(image_size, self.factor_sizes),
                         with_idx=True)


class SyntheticMPI3DFullTrain(SyntheticMPI3DFull):
    """Training view of the grid. ``subset_frac`` draws a seeded uniform
    random subset of the 1,036,800 combinations (materialized contiguous,
    so a 0.25 subset is 3.2 GB — under the harness's 8 GB device-resident
    gate and trainable at full cached-latent step rate on one chip, where
    the 12.7 GB full grid would fall back to host streaming on this box's
    single CPU). Uniform sampling keeps every factor level represented
    (unlike a strided slice, which aliases the last 40-level DOF). The
    reference trains on the full grid (``ldm/data/disdata.py:244-283``);
    evals here always use the full ground-truth table, so only the
    training-set size changes."""

    def __init__(self, image_size: int = 64, factor_sizes=None,
                 subset_frac: float = 1.0, subset_seed: int = 0, **kwargs):
        super().__init__(image_size, factor_sizes, **kwargs)
        if subset_frac < 1.0:
            n = len(self.images)
            k = int(n * subset_frac)
            sel = np.sort(np.random.default_rng(subset_seed).choice(
                n, size=k, replace=False))
            self.images = np.ascontiguousarray(self.images[sel])
            self.length = k
