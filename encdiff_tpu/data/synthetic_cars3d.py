"""Procedural Cars3D stand-in: the EXACT real factor structure rendered on
the fly.

Real Cars3D (183 `.mat` car meshes re-rendered at 64x64; reference loader
``ldm/data/disdata.py:336-440``, eval table ``data/ground_truth/cars3d.py:45``)
has three factors in index order

    elevation(4) x azimuth(24) x object(183)  ->  N = 17,568 images

and the reference training loader repeats the tiny grid x10 per epoch
(disdata.py Cars3D). What it stresses that Shapes3D never does
(VERDICT r3 next #3): a 183-way near-nominal factor (object identity) with
only 96 views per object, plus a cyclic 24-level azimuth.

The stand-in draws a parameterized car on the real white background:

- **object(183)**: per-object deterministic parameters (body RGB from a
  183-step hue/value lattice plus hashed jitter, body length/height,
  cabin proportion/offset, wheel radius) — identity is recoverable from
  appearance across all views, like the real meshes;
- **azimuth(24)**: profile width follows |cos az| foreshortening with a
  minimum frontal width, the car flips heading with sign(cos az), and a
  dark windshield patch rides the heading side while a red tail patch
  rides the rear (so az is identifiable over the full cycle, not just
  mod 180 deg);
- **elevation(4)**: camera pitch — vertical squash of the body, upward
  shift, and a growing visible roof ellipse.

Index = dot(factors, bases) in the real order, so ``eval_name: cars3d``
(evalx/ground_truth/datasets.py Cars3D, N=17,568) runs the unmodified
reference protocol. The full render is ~17.5k images (fast, ~20 s);
disk-cached like the other procedural grids.
"""

from __future__ import annotations

import os

import numpy as np

from encdiff_tpu.data.datasets import ArrayDataset

#: real Cars3D factor sizes in the real index order (cars3d.py:45)
CARS3D_FACTOR_SIZES = [4, 24, 183]
CARS3D_FACTOR_NAMES = ["elevation", "azimuth", "object"]
N_IMAGES_CARS3D = int(np.prod(CARS3D_FACTOR_SIZES))  # 17,568


def _object_params(n_obj: int = 183):
    """Deterministic per-object appearance parameters. A 183-point lattice
    over (hue-ish RGB mix, body proportions) + hashed jitter: every object
    distinct, appearance stable across views."""
    rng = np.random.RandomState(1830)
    i = np.arange(n_obj)
    # color lattice: 3 coarse value bands x 61 hue steps, plus jitter
    h = (i % 61) / 61.0
    v = 0.45 + 0.25 * (i // 61)
    import colorsys

    body_rgb = np.stack([
        np.array(colorsys.hsv_to_rgb(h[k], 0.75 + 0.2 * rng.rand(), v[k]),
                 np.float32) * 255.0 for k in range(n_obj)])
    length = 0.66 + 0.18 * rng.rand(n_obj)        # body half-length (x r_ref)
    height = 0.16 + 0.08 * rng.rand(n_obj)        # body half-height
    cabin_h = 0.10 + 0.07 * rng.rand(n_obj)       # cabin extra height
    cabin_w = 0.45 + 0.20 * rng.rand(n_obj)       # cabin length fraction
    cabin_off = -0.08 + 0.16 * rng.rand(n_obj)    # cabin center offset
    wheel_r = 0.07 + 0.05 * rng.rand(n_obj)
    return {"rgb": body_rgb, "length": length, "height": height,
            "cabin_h": cabin_h, "cabin_w": cabin_w, "cabin_off": cabin_off,
            "wheel_r": wheel_r}


def render_cars3d_all(size: int = 64, factor_sizes=None) -> np.ndarray:
    fs = list(CARS3D_FACTOR_SIZES if factor_sizes is None else factor_sizes)
    f_el, f_az, f_ob = fs
    n_images = int(np.prod(fs))
    p = _object_params(f_ob)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    edge = 1.1
    r_ref = size * 0.62                      # reference half-extent in px

    az = 2.0 * np.pi * np.arange(f_az) / f_az
    elev_frac = np.arange(f_el) / max(f_el - 1, 1)

    out = np.empty((n_images, size, size, 3), np.uint8)
    white = 248.0

    idx = 0
    for el in range(f_el):
        vsq = 1.0 - 0.35 * elev_frac[el]     # vertical squash with pitch
        cy = size * (0.56 - 0.06 * elev_frac[el])
        roof_vis = 0.12 + 0.55 * elev_frac[el]
        for a in range(f_az):
            c = np.cos(az[a])
            s_az = np.sin(az[a])
            w_frac = 0.30 + 0.70 * abs(c)    # foreshortened length
            heading = 1.0 if c >= 0 else -1.0
            # vectorize over all 183 objects at once
            L = (p["length"] * w_frac * r_ref)[:, None, None]   # (O,1,1)
            H = (p["height"] * vsq * r_ref)[:, None, None]
            cx = size * 0.5
            dx = xx[None] - cx                                   # (O,S,S)
            dy = yy[None] - cy

            # body: rounded box
            d_body = np.maximum(np.abs(dx) - L, np.abs(dy) - H) - 1.5
            a_body = np.clip(0.5 - d_body / edge, 0.0, 1.0)

            # cabin: narrower box on top, offset toward heading
            Lc = L * p["cabin_w"][:, None, None]
            Hc = (p["cabin_h"] * vsq * r_ref)[:, None, None]
            ox = heading * (p["cabin_off"] * w_frac * r_ref)[:, None, None]
            d_cab = np.maximum(np.abs(dx - ox) - Lc,
                               np.abs(dy + H + Hc * 0.9) - Hc)
            a_cab = np.clip(0.5 - d_cab / edge, 0.0, 1.0)

            # wheels: two dark ellipses under the body, squashed by |cos|
            Wr = (p["wheel_r"] * r_ref)[:, None, None]
            wx = 0.62 * L
            wy = H + 0.35 * Wr
            d_w1 = (np.sqrt(((dx - wx) / np.maximum(0.35 + 0.65 * abs(c),
                                                    1e-3)) ** 2
                            + (dy - wy) ** 2) - Wr)
            d_w2 = (np.sqrt(((dx + wx) / np.maximum(0.35 + 0.65 * abs(c),
                                                    1e-3)) ** 2
                            + (dy - wy) ** 2) - Wr)
            a_wh = np.clip(0.5 - np.minimum(d_w1, d_w2) / edge, 0.0, 1.0)

            # windshield (dark, heading side of cabin) / tail light (red,
            # rear end of body) — break the az ~ az+180 ambiguity
            d_ws = np.maximum(np.abs(dx - ox - heading * Lc * 0.8)
                              - Lc * 0.28,
                              np.abs(dy + H + Hc * 0.9) - Hc * 0.8)
            a_ws = np.clip(0.5 - d_ws / edge, 0.0, 1.0) * a_cab
            d_tl = np.maximum(np.abs(dx + heading * L) - 2.2,
                              np.abs(dy + H * 0.3) - 2.2)
            a_tl = np.clip(0.5 - d_tl / edge, 0.0, 1.0) * a_body

            # roof ellipse (visible with elevation): slightly darker body
            d_rf = (np.sqrt((dx / np.maximum(L, 1e-3)) ** 2
                            + ((dy + H) / np.maximum(
                                roof_vis * H + 2.0, 1e-3)) ** 2) - 1.0)
            a_rf = np.clip(0.5 - d_rf / 0.08, 0.0, 1.0)

            rgb = p["rgb"][:, None, None, :]                    # (O,1,1,3)
            img = np.full((f_ob, size, size, 3), white, np.float32)
            a_car = np.maximum(a_body, a_cab)
            img = (1 - a_car[..., None]) * img + a_car[..., None] * rgb
            img = (1 - a_rf[..., None]) * img + a_rf[..., None] * rgb * 0.8
            img = (1 - a_wh[..., None]) * img + a_wh[..., None] * np.array(
                [45, 45, 48], np.float32)
            img = ((1 - a_ws[..., None]) * img + a_ws[..., None] * np.array(
                [60, 80, 105], np.float32))
            img = ((1 - a_tl[..., None]) * img + a_tl[..., None] * np.array(
                [200, 40, 40], np.float32))
            # shadow under the car grounds it (as the real renders have)
            d_sh = (np.sqrt((dx / np.maximum(L * 1.1, 1e-3)) ** 2
                            + ((dy - H - 3.0) / 3.5) ** 2) - 1.0)
            a_sh = np.clip(0.5 - d_sh / 0.15, 0.0, 1.0) * 0.25
            img = (1 - a_sh[..., None]) * img

            # interleave into index order: index = (el*24 + az)*183 + obj
            np.copyto(out[idx:idx + f_ob], np.clip(img, 0, 255).astype(
                np.uint8))
            idx += f_ob
    assert idx == n_images
    return out


_CACHE: dict[tuple, np.ndarray] = {}


def get_cars3d_images(size: int = 64, factor_sizes=None) -> np.ndarray:
    fs = tuple(CARS3D_FACTOR_SIZES if factor_sizes is None else factor_sizes)
    key = (size, fs)
    if key not in _CACHE:
        cache_dir = os.environ.get("ENCDIFF_DATA_CACHE", "/tmp/encdiff_cache")
        tag = "x".join(map(str, fs))
        path = os.path.join(cache_dir, f"cars3d_{size}_{tag}.npy")
        if os.path.exists(path):
            _CACHE[key] = np.load(path, mmap_mode="r")
        else:
            arr = render_cars3d_all(size, factor_sizes=list(fs))
            os.makedirs(cache_dir, exist_ok=True)
            np.save(path, arr)
            _CACHE[key] = arr
    return _CACHE[key]


class SyntheticCars3DFull(ArrayDataset):
    """The full 17,568-image grid in real index order (pair with
    ``eval_name: cars3d``). Use as the *validation* dataset so the
    representation sweep aligns with the eval index table."""

    factor_sizes = CARS3D_FACTOR_SIZES

    def __init__(self, image_size: int = 64, factor_sizes=None, **kwargs):
        del kwargs
        if factor_sizes is not None:
            self.factor_sizes = list(factor_sizes)
        super().__init__(get_cars3d_images(image_size, self.factor_sizes),
                         with_idx=True)


class SyntheticCars3DFullTrain(SyntheticCars3DFull):
    """Training view with the reference's x10 epoch repeat
    (disdata.py:336-440): the grid is tiny, so one 'epoch' cycles it ten
    times — keeps the epoch-based LR/eval cadence comparable."""

    repeat = 10

    def __init__(self, image_size: int = 64, **kwargs):
        super().__init__(image_size=image_size, **kwargs)
        self.length = len(self.images) * self.repeat

    def __getitem__(self, index: int):
        return super().__getitem__(index % len(self.images))

    def batch_uint8(self, indices: np.ndarray) -> np.ndarray:
        return super().batch_uint8(
            np.asarray(indices) % len(self.images))
