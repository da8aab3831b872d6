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
#: the EXACT Shapes3D factor grid (shapes3d.py:44): 480,000 images — the
#: full-fidelity stand-in benchmark for the BASELINE DCI/FactorVAE rows.
FULL_FACTOR_SIZES = [10, 10, 10, 8, 4, 15]
FACTOR_NAMES = ["floor_hue", "wall_hue", "object_hue", "scale", "shape",
                "orientation"]
N_IMAGES = int(np.prod(FACTOR_SIZES))  # 27648
N_IMAGES_FULL = int(np.prod(FULL_FACTOR_SIZES))  # 480000


def _hue_rgb(i: int, n: int, s: float = 0.85, v: float = 0.95) -> np.ndarray:
    r, g, b = colorsys.hsv_to_rgb(i / n, s, v)
    return np.array([r, g, b], np.float32) * 255.0


def _shape_mask(shape_idx: int, scale_idx: int, orient_idx: int,
                size: int = 64,
                factor_sizes=None) -> np.ndarray:
    """Boolean mask of the object for one geometry combination.

    Geometry is parameterized by the *fraction* along each factor axis so a
    denser grid (e.g. the full 8-scale / 15-orientation Shapes3D grid)
    interpolates the same 8..17 px radius and +-11.2 px position ranges the
    6-factor demo grid uses (identical pixels for the old [.,.,.,4,.,8]
    grid)."""
    fs = FACTOR_SIZES if factor_sizes is None else factor_sizes
    n_scale, n_orient = fs[3], fs[5]
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    radius = 8.0 + 9.0 * (scale_idx / max(n_scale - 1, 1))     # 8..17 px
    cx = size / 2 + (orient_idx - (n_orient - 1) / 2) * (
        22.4 / max(n_orient - 1, 1))
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


def render_all(size: int = 64, horizon: float = 0.55,
               factor_sizes=None) -> np.ndarray:
    """The full factor grid as one uint8 array (N, size, size, 3).

    Vectorized over the (scale, shape, orientation) geometry block: one
    ``np.where`` per (floor, wall, object-hue) background fills the whole
    contiguous index block, so the 480k-image full grid renders in seconds
    on one host core."""
    fs = list(FACTOR_SIZES if factor_sizes is None else factor_sizes)
    f_floor, f_wall, f_obj, f_scale, f_shape, f_orient = fs
    n_images = int(np.prod(fs))
    floor_colors = np.stack([_hue_rgb(i, f_floor) for i in range(f_floor)])
    wall_colors = np.stack([_hue_rgb(i, f_wall, s=0.6, v=0.8)
                            for i in range(f_wall)])
    obj_colors = np.stack([_hue_rgb(i, f_obj, s=1.0, v=1.0)
                           for i in range(f_obj)])

    hy = int(size * horizon)
    # geometry masks, flattened row-major over (scale, shape, orientation) —
    # exactly the layout of the trailing 3 index digits
    n_geo = f_scale * f_shape * f_orient
    masks = np.zeros((n_geo, size, size, 1), bool)
    g = 0
    for sc in range(f_scale):
        for sh in range(f_shape):
            for orient in range(f_orient):
                masks[g, :, :, 0] = _shape_mask(sh, sc, orient, size, fs)
                g += 1

    out = np.empty((n_images, size, size, 3), np.uint8)
    bg = np.empty((size, size, 3), np.uint8)
    idx = 0
    for fl in range(f_floor):
        for wa in range(f_wall):
            bg[:hy] = wall_colors[wa].astype(np.uint8)
            bg[hy:] = floor_colors[fl].astype(np.uint8)
            for ob in range(f_obj):
                np.copyto(out[idx:idx + n_geo],
                          np.where(masks, obj_colors[ob].astype(np.uint8),
                                   bg))
                idx += n_geo
    assert idx == n_images
    return out


def render_all_v2(size: int = 64, horizon: float = 0.55,
                  factor_sizes=None) -> np.ndarray:
    """Shapes3D-faithful renderer, second generation.

    Differences from :func:`render_all`, each motivated by the physics of
    the real ray-traced Shapes3D scenes (shapes3d.py:44 semantics) and by
    the round-2 DCI plateau diagnosis (VERDICT r2, missing #1):

    - **orientation = camera azimuth**, not object position: it slides the
      wall-corner line and rotates the object silhouette in place, while
      the object stays centered — so ``orientation`` and ``scale`` no
      longer deform the same silhouette degrees of freedom, and
      orientation no longer modulates which floor/wall pixels the object
      occludes (the main factor-pixel interaction of the v1 renderer).
    - **anti-aliased signed-distance masks**: scale/orientation become
      smooth, sub-pixel-codable signals like the real renders, instead of
      jagged integer-pixel mask flips.
    - **shading**: two-tone wall corner, floor vertical gradient, radial
      object highlight — within-region gradients as in lit 3D scenes.
    """
    fs = list(FACTOR_SIZES if factor_sizes is None else factor_sizes)
    f_floor, f_wall, f_obj, f_scale, f_shape, f_orient = fs
    n_images = int(np.prod(fs))
    hy = int(size * horizon)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)

    floor_colors = np.stack([_hue_rgb(i, f_floor) for i in range(f_floor)])
    wall_colors = np.stack([_hue_rgb(i, f_wall, s=0.6, v=0.8)
                            for i in range(f_wall)])
    obj_colors = np.stack([_hue_rgb(i, f_obj, s=1.0, v=1.0)
                           for i in range(f_obj)])

    # ---- backgrounds: (wall_hue, orientation) wall + floor_hue floor ----
    # camera azimuth slides the wall-corner line across the image; the two
    # wall faces get different lambertian shades.
    corner_x = np.array([
        size * (0.2 + 0.6 * (o / max(f_orient - 1, 1)))
        for o in range(f_orient)], np.float32)              # (f_orient,)
    edge = 1.2  # px soft edge (anti-aliasing width)
    # wall face blend per orientation: (f_orient, hy, size) in [0,1]
    wall_blend = np.clip(
        (xx[None, :hy, :] - corner_x[:, None, None]) / edge + 0.5, 0.0, 1.0)
    # floor shading: subtle depth gradient
    floor_shade = (0.82 + 0.18 * (yy[hy:, :] - hy) / max(size - hy, 1))
    wall_shade_l, wall_shade_r = 0.78, 1.0

    # ---- object geometry: (scale, shape, orientation) alpha+shade -------
    cx, cy = size / 2.0, size * 0.62
    dx, dy = xx - cx, yy - cy
    n_geo = f_scale * f_shape * f_orient
    alpha = np.empty((n_geo, size, size, 1), np.float32)
    shade_obj = np.empty((n_geo, size, size, 1), np.float32)
    g = 0
    for sc in range(f_scale):
        radius = 8.0 + 9.0 * (sc / max(f_scale - 1, 1))
        for sh in range(f_shape):
            for o in range(f_orient):
                # in-place rotation by azimuth (object stays centered)
                ang = 0.5 * np.pi * (o / max(f_orient, 1))
                ca, sa = np.cos(ang), np.sin(ang)
                rx, ry = ca * dx + sa * dy, -sa * dx + ca * dy
                if sh == 0:      # square: Chebyshev signed distance
                    d = np.maximum(np.abs(rx), np.abs(ry)) - radius
                elif sh == 1:    # circle (rotation-invariant, like spheres)
                    d = np.sqrt(dx * dx + dy * dy) - radius
                elif sh == 2:    # triangle (pointing up), approximate sdf
                    d = np.maximum(np.abs(rx) * 2.0 - (ry + radius),
                                   np.abs(ry) - radius)
                    d = d * 0.5
                else:            # diamond (L1 ball)
                    d = (np.abs(rx) + np.abs(ry) - radius * 1.3) * 0.7071
                alpha[g, :, :, 0] = np.clip(0.5 - d / edge, 0.0, 1.0)
                # radial highlight toward upper-left, fixed light direction
                rr = np.sqrt((dx + 0.35 * radius) ** 2 +
                             (dy + 0.35 * radius) ** 2) / max(radius, 1.0)
                shade_obj[g, :, :, 0] = 1.05 - 0.25 * np.clip(rr, 0, 1.6)
                g += 1

    geo_orient = (np.arange(n_geo) % f_orient)  # orientation of each geo idx

    out = np.empty((n_images, size, size, 3), np.uint8)
    idx = 0
    obj_cols = obj_colors[:, None, None, :]  # (f_obj,1,1,3)
    # wall-face blend is orientation- but not hue-dependent; precompute once
    wall_mix = (wall_shade_l + (wall_shade_r - wall_shade_l)
                * wall_blend)[..., None]      # (f_orient, hy, size, 1)
    for fl in range(f_floor):
        floor_rgb = floor_shade[..., None] * floor_colors[fl]
        for wa in range(f_wall):
            # per-orientation wall strips: (f_orient, hy, size, 3)
            wall_rgb = wall_mix * wall_colors[wa]
            for ob in range(f_obj):
                col = obj_cols[ob] * shade_obj  # (n_geo,size,size,3)
                blk = np.empty((n_geo, size, size, 3), np.float32)
                blk[:, :hy] = wall_rgb[geo_orient]
                blk[:, hy:] = floor_rgb
                blk = alpha * col + (1.0 - alpha) * blk
                np.copyto(out[idx:idx + n_geo],
                          np.clip(blk, 0, 255).astype(np.uint8))
                idx += n_geo
    assert idx == n_images
    return out


def render_all_v3(size: int = 64, horizon: float = 0.55,
                  factor_sizes=None) -> np.ndarray:
    """Shapes3D-faithful renderer, third generation.

    The round-3 three-cell control (bands 0.9913 / v1 0.907 / v2 0.848,
    demo_artifacts/round3) showed that the couplings v2 *added* in the name
    of faithfulness — wall shading multiplied into wall hue, and in-place
    silhouette rotation strong enough to confound square↔diamond — hurt
    DCI, while real Shapes3D scenes are flat-lit with rotation-distinct
    shapes (cube/sphere/cylinder/capsule never map onto each other under
    the ±30° camera orbit).  v3 keeps ONLY the factor→pixel couplings the
    real renders have (shapes3d.py:44 semantics):

    - **flat-colored regions** (v1-style): floor and object are a single
      flat hue fill; the wall keeps a fixed two-tone corner (the one
      lighting cue real rooms show) whose *position* tracks azimuth.
    - **orientation = camera azimuth ±30°**: slides the wall-corner line,
      shifts the object horizontally by parallax (real camera orbits do
      exactly this), and rotates the silhouette mildly (0.35·az ≤ 10.5°,
      far from the 45° that would alias square into diamond).
    - **anti-aliased SDF masks** (v2-style): scale/orientation stay
      smooth, sub-pixel-codable signals.
    """
    fs = list(FACTOR_SIZES if factor_sizes is None else factor_sizes)
    f_floor, f_wall, f_obj, f_scale, f_shape, f_orient = fs
    n_images = int(np.prod(fs))
    hy = int(size * horizon)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)

    floor_colors = np.stack([_hue_rgb(i, f_floor) for i in range(f_floor)])
    wall_colors = np.stack([_hue_rgb(i, f_wall, s=0.6, v=0.8)
                            for i in range(f_wall)])
    obj_colors = np.stack([_hue_rgb(i, f_obj, s=1.0, v=1.0)
                           for i in range(f_obj)])

    # camera azimuth per orientation value: ±30° like the real orbit
    az = np.array([np.deg2rad(-30.0 + 60.0 * (o / max(f_orient - 1, 1)))
                   for o in range(f_orient)], np.float32)
    edge = 1.2  # px anti-aliasing width

    # ---- wall: two-tone corner whose x position tracks azimuth ---------
    corner_x = size * (0.5 + 0.55 * np.sin(az))          # (f_orient,)
    wall_blend = np.clip(
        (xx[None, :hy, :] - corner_x[:, None, None]) / edge + 0.5, 0.0, 1.0)
    wall_shade_l, wall_shade_r = 0.8, 1.0                # fixed lighting
    wall_mix = (wall_shade_l + (wall_shade_r - wall_shade_l)
                * wall_blend)[..., None]                 # (f_orient,hy,size,1)

    # ---- object: AA SDF alpha, parallax x-shift + mild rotation --------
    cy = size * 0.62
    n_geo = f_scale * f_shape * f_orient
    alpha = np.empty((n_geo, size, size, 1), np.float32)
    g = 0
    for sc in range(f_scale):
        radius = 8.0 + 9.0 * (sc / max(f_scale - 1, 1))
        for sh in range(f_shape):
            for o in range(f_orient):
                cx = size / 2.0 + size * 0.16 * np.sin(az[o])  # parallax
                dx, dy = xx - cx, yy - cy
                ang = 0.35 * az[o]                  # ≤ 10.5°, no aliasing
                ca, sa = np.cos(ang), np.sin(ang)
                rx, ry = ca * dx + sa * dy, -sa * dx + ca * dy
                if sh == 0:      # square: Chebyshev signed distance
                    d = np.maximum(np.abs(rx), np.abs(ry)) - radius
                elif sh == 1:    # circle (rotation-invariant, like spheres)
                    d = np.sqrt(dx * dx + dy * dy) - radius
                elif sh == 2:    # triangle (pointing up), approximate sdf
                    d = np.maximum(np.abs(rx) * 2.0 - (ry + radius),
                                   np.abs(ry) - radius)
                    d = d * 0.5
                else:            # diamond (L1 ball)
                    d = (np.abs(rx) + np.abs(ry) - radius * 1.3) * 0.7071
                alpha[g, :, :, 0] = np.clip(0.5 - d / edge, 0.0, 1.0)
                g += 1

    geo_orient = (np.arange(n_geo) % f_orient)

    out = np.empty((n_images, size, size, 3), np.uint8)
    idx = 0
    for fl in range(f_floor):
        floor_rgb = np.broadcast_to(floor_colors[fl],
                                    (size - hy, size, 3)).astype(np.float32)
        for wa in range(f_wall):
            wall_rgb = wall_mix * wall_colors[wa]    # (f_orient,hy,size,3)
            for ob in range(f_obj):
                blk = np.empty((n_geo, size, size, 3), np.float32)
                blk[:, :hy] = wall_rgb[geo_orient]
                blk[:, hy:] = floor_rgb
                blk = alpha * obj_colors[ob] + (1.0 - alpha) * blk
                np.copyto(out[idx:idx + n_geo],
                          np.clip(blk, 0, 255).astype(np.uint8))
                idx += n_geo
    assert idx == n_images
    return out


def render_all_v4(size: int = 64, horizon: float = 0.55,
                  factor_sizes=None) -> np.ndarray:
    """Shapes3D-faithful renderer, fourth generation: v3 + scale/shape
    decoupling inside the object region.

    The v3 480k run's DCI importance matrix (demo_artifacts/round3/v3_run)
    shows the ONLY residually entangled codes are scale<->shape mixtures
    (codes at 0.86/0.12, 0.90/0.10, 0.66/0.33 splits; every other code is
    >=0.98 pure). Cause: with flat-filled silhouettes, the single most
    informative object statistic — covered area — depends on *both* scale
    (radius) and shape (square 4r^2 vs triangle 2r^2 ...), so codes that
    track area are inherently mixed. Real ray-traced Shapes3D separates the
    pair with interior shading: a sphere's radial falloff looks nothing like
    a cube's flat facets at any size. v4 adds exactly the two object-local
    cues, touching no floor/wall/orientation pixels:

    - **equal-area shape family**: per-shape radius rescale so every shape
      covers the same pixel area at the same scale value — area becomes a
      pure scale cue, boundary form a pure shape cue.
    - **shape-specific interior shading** (rotates with the silhouette,
      mean-normalized per mask so average brightness leaks neither factor):
      square -> two flat facets, circle -> offset radial falloff (sphere),
      triangle -> apex-to-base gradient (cone), diamond -> diagonal ramp.
      Multiplicative on the object hue, so channel ratios (hue) stay exact.
    """
    fs = list(FACTOR_SIZES if factor_sizes is None else factor_sizes)
    f_floor, f_wall, f_obj, f_scale, f_shape, f_orient = fs
    n_images = int(np.prod(fs))
    hy = int(size * horizon)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)

    floor_colors = np.stack([_hue_rgb(i, f_floor) for i in range(f_floor)])
    wall_colors = np.stack([_hue_rgb(i, f_wall, s=0.6, v=0.8)
                            for i in range(f_wall)])
    obj_colors = np.stack([_hue_rgb(i, f_obj, s=1.0, v=1.0)
                           for i in range(f_obj)])

    az = np.array([np.deg2rad(-30.0 + 60.0 * (o / max(f_orient - 1, 1)))
                   for o in range(f_orient)], np.float32)
    edge = 1.2  # px anti-aliasing width

    # wall: two-tone corner whose x position tracks azimuth (as v3)
    corner_x = size * (0.5 + 0.55 * np.sin(az))
    wall_blend = np.clip(
        (xx[None, :hy, :] - corner_x[:, None, None]) / edge + 0.5, 0.0, 1.0)
    wall_shade_l, wall_shade_r = 0.8, 1.0
    wall_mix = (wall_shade_l + (wall_shade_r - wall_shade_l)
                * wall_blend)[..., None]

    # equal-area radius multipliers: area(shape, k*r) == area(circle, r)
    #   square (2kr)^2 = pi r^2, triangle 2(kr)^2 = pi r^2,
    #   diamond 2(1.3kr)^2 = pi r^2
    k_shape = [np.sqrt(np.pi) / 2.0,          # square  0.886
               1.0,                            # circle
               np.sqrt(np.pi / 2.0),           # triangle 1.253
               np.sqrt(np.pi / 3.38)]          # diamond 0.964

    # 0.57 vs v3's 0.62: the equal-area triangle is taller, and its rotated
    # base corner plus the AA skirt must clear the bottom row even at max
    # scale — y_max = cy + (cos+sin)(10.5deg)*k_tri*R + AA ~= cy + 1.46*R,
    # which needs cy < 62.5 - 1.46*16.5 = 38.4 with margin.
    cy = size * 0.57
    n_geo = f_scale * f_shape * f_orient
    alpha = np.empty((n_geo, size, size, 1), np.float32)
    shade = np.empty((n_geo, size, size, 1), np.float32)
    g = 0
    for sc in range(f_scale):
        # 8..16.5 px (vs v3's 8..17) and parallax 0.13 (vs 0.16): the
        # equal-area rescale makes the triangle ~25% wider than v3's, and
        # the extreme (max scale, triangle, |az|=30°) must stay fully inside
        # the frame — a clipped silhouette would couple orientation into
        # scale/shape, the exact interaction v4 removes.
        base_r = 8.0 + 8.5 * (sc / max(f_scale - 1, 1))
        for sh in range(f_shape):
            r = base_r * k_shape[sh % 4]
            for o in range(f_orient):
                cx = size / 2.0 + size * 0.13 * np.sin(az[o])  # parallax
                dx, dy = xx - cx, yy - cy
                ang = 0.35 * az[o]
                ca, sa = np.cos(ang), np.sin(ang)
                rx, ry = ca * dx + sa * dy, -sa * dx + ca * dy
                if sh % 4 == 0:    # square: Chebyshev signed distance
                    d = np.maximum(np.abs(rx), np.abs(ry)) - r
                    # cube facets: flat two-tone split along the (rotated)
                    # vertical axis, AA seam
                    s = 0.84 + 0.16 * np.clip(rx / edge + 0.5, 0.0, 1.0)
                elif sh % 4 == 1:  # circle (sphere)
                    d = np.sqrt(dx * dx + dy * dy) - r
                    rr = np.sqrt((dx + 0.35 * r) ** 2
                                 + (dy + 0.35 * r) ** 2) / max(r, 1.0)
                    s = 1.05 - 0.28 * np.clip(rr, 0.0, 1.6)
                elif sh % 4 == 2:  # triangle (cone): apex-to-base ramp
                    d = 0.5 * np.maximum(np.abs(rx) * 2.0 - (ry + r),
                                         np.abs(ry) - r)
                    s = 1.04 - 0.26 * np.clip((ry + r) / (2.0 * r), 0.0, 1.0)
                else:              # diamond: diagonal ramp
                    d = (np.abs(rx) + np.abs(ry) - r * 1.3) * 0.7071
                    s = 0.82 + 0.26 * np.clip(
                        (rx + ry) / (2.6 * r) + 0.5, 0.0, 1.0)
                a = np.clip(0.5 - d / edge, 0.0, 1.0)
                alpha[g, :, :, 0] = a
                # normalize mean interior brightness so neither scale nor
                # shape leaks through average intensity
                m = a > 0.5
                mean_s = float(s[m].mean()) if m.any() else 1.0
                shade[g, :, :, 0] = s * (0.92 / max(mean_s, 1e-6))
                g += 1

    geo_orient = (np.arange(n_geo) % f_orient)

    out = np.empty((n_images, size, size, 3), np.uint8)
    idx = 0
    for fl in range(f_floor):
        floor_rgb = np.broadcast_to(floor_colors[fl],
                                    (size - hy, size, 3)).astype(np.float32)
        for wa in range(f_wall):
            wall_rgb = wall_mix * wall_colors[wa]
            for ob in range(f_obj):
                col = obj_colors[ob] * shade   # (n_geo, size, size, 3)
                blk = np.empty((n_geo, size, size, 3), np.float32)
                blk[:, :hy] = wall_rgb[geo_orient]
                blk[:, hy:] = floor_rgb
                blk = alpha * col + (1.0 - alpha) * blk
                np.copyto(out[idx:idx + n_geo],
                          np.clip(blk, 0, 255).astype(np.uint8))
                idx += n_geo
    assert idx == n_images
    return out


_CACHE: dict[tuple, np.ndarray] = {}


def get_images(size: int = 64, factor_sizes=None) -> np.ndarray:
    key = (size, tuple(FACTOR_SIZES if factor_sizes is None
                       else factor_sizes))
    if key not in _CACHE:
        _CACHE[key] = render_all(size, factor_sizes=factor_sizes)
    return _CACHE[key]


#: fixed base hue per factor band for the independence-control renderer
_BAND_HUES = [0.0, 0.33, 0.62, 0.12, 0.5, 0.83]


def render_bands(size: int = 64, factor_sizes=None) -> np.ndarray:
    """Independence-control renderer: 6 disjoint horizontal bands, band *i*
    colored solely by factor *i* (fixed hue, brightness ramps monotonically
    with the factor value). Zero pixel interaction between factors by
    construction — the diagnostic counterpart of :func:`render_all` for the
    DCI renderer-vs-model experiment (VERDICT round 2, missing #1): if the
    flagship model reaches DCI ~1.0 here, the plateau on the occluded-scene
    renderer is the data's physics, not the model or eval stack.
    """
    fs = list(FACTOR_SIZES if factor_sizes is None else factor_sizes)
    n_images = int(np.prod(fs))
    bases = np.concatenate([np.cumprod(fs[::-1])[::-1][1:], [1]]).astype(
        np.int64)
    idx = np.arange(n_images, dtype=np.int64)
    bounds = [round(size * i / len(fs)) for i in range(len(fs) + 1)]
    out = np.empty((n_images, size, size, 3), np.uint8)
    for i, n in enumerate(fs):
        vals = (idx // bases[i]) % n
        ramp = 0.15 + 0.80 * (np.arange(n) / max(n - 1, 1))
        colors = np.stack([
            np.array(colorsys.hsv_to_rgb(_BAND_HUES[i], 0.85, v),
                     np.float32) * 255.0 for v in ramp
        ]).astype(np.uint8)                                   # (n, 3)
        out[:, bounds[i]:bounds[i + 1]] = \
            colors[vals][:, None, None, :]
    return out


class SyntheticShapes3D(ArrayDataset):
    """Training dataset over the procedural grid (drop-in for Shapes3DTrain
    in configs; pair with ``eval_name: synthetic_shapes``)."""

    factor_sizes = FACTOR_SIZES

    def __init__(self, image_size: int = 64, **kwargs):
        del kwargs
        super().__init__(get_images(image_size, self.factor_sizes),
                         with_idx=True)


class SyntheticShapes3DTrain(SyntheticShapes3D):
    pass


class SyntheticShapes3DFull(SyntheticShapes3D):
    """The full 480,000-image grid with Shapes3D's exact factor sizes
    [10,10,10,8,4,15] (shapes3d.py:44) — the quality-parity benchmark for
    the BASELINE FactorVAE/DCI rows (pair with
    ``eval_name: synthetic_shapes_full``). ~5.9 GB uint8: fits the
    device-resident (<8 GB) input path."""

    factor_sizes = FULL_FACTOR_SIZES


class SyntheticShapes3DFullTrain(SyntheticShapes3DFull):
    pass


class SyntheticShapes3DV2Full(ArrayDataset):
    """The 480,000-image grid rendered by :func:`render_all_v2`
    (camera-azimuth orientation, anti-aliased SDF masks, shaded scenes).
    Same factor structure as :class:`SyntheticShapes3DFull`; pairs with
    ``eval_name: synthetic_shapes_full``. The render (~4 min on one core)
    is disk-cached under ``$ENCDIFF_DATA_CACHE`` (default
    ``/tmp/encdiff_cache``)."""

    factor_sizes = FULL_FACTOR_SIZES

    def __init__(self, image_size: int = 64, **kwargs):
        del kwargs
        key = ("v2", image_size, tuple(self.factor_sizes))
        if key not in _CACHE:
            import os

            cache_dir = os.environ.get("ENCDIFF_DATA_CACHE",
                                       "/tmp/encdiff_cache")
            tag = "x".join(map(str, self.factor_sizes))
            path = os.path.join(cache_dir, f"shapes3d_v2_{image_size}_"
                                           f"{tag}.npy")
            if os.path.exists(path):
                _CACHE[key] = np.load(path, mmap_mode="r")
            else:
                arr = render_all_v2(image_size,
                                    factor_sizes=self.factor_sizes)
                os.makedirs(cache_dir, exist_ok=True)
                np.save(path, arr)
                _CACHE[key] = arr
        super().__init__(_CACHE[key], with_idx=True)


class SyntheticShapes3DV2FullTrain(SyntheticShapes3DV2Full):
    pass


class SyntheticShapes3DV3Full(ArrayDataset):
    """The 480,000-image grid rendered by :func:`render_all_v3` (flat-lit
    regions, camera-azimuth corner slide + object parallax, AA SDF masks —
    only the factor-pixel couplings real Shapes3D has). Same factor
    structure as :class:`SyntheticShapes3DFull`; pairs with
    ``eval_name: synthetic_shapes_full``. Disk-cached under
    ``$ENCDIFF_DATA_CACHE`` (default ``/tmp/encdiff_cache``)."""

    factor_sizes = FULL_FACTOR_SIZES

    def __init__(self, image_size: int = 64, **kwargs):
        del kwargs
        key = ("v3", image_size, tuple(self.factor_sizes))
        if key not in _CACHE:
            import os

            cache_dir = os.environ.get("ENCDIFF_DATA_CACHE",
                                       "/tmp/encdiff_cache")
            tag = "x".join(map(str, self.factor_sizes))
            path = os.path.join(cache_dir, f"shapes3d_v3_{image_size}_"
                                           f"{tag}.npy")
            if os.path.exists(path):
                _CACHE[key] = np.load(path, mmap_mode="r")
            else:
                arr = render_all_v3(image_size,
                                    factor_sizes=self.factor_sizes)
                os.makedirs(cache_dir, exist_ok=True)
                np.save(path, arr)
                _CACHE[key] = arr
        super().__init__(_CACHE[key], with_idx=True)


class SyntheticShapes3DV3FullTrain(SyntheticShapes3DV3Full):
    pass


class SyntheticShapes3DV4Full(ArrayDataset):
    """The 480,000-image grid rendered by :func:`render_all_v4` (v3 plus
    equal-area shapes and shape-specific interior shading — the targeted
    scale/shape decoupling cell of the round-3 renderer experiment). Same
    factor structure as :class:`SyntheticShapes3DFull`; pairs with
    ``eval_name: synthetic_shapes_full``. Disk-cached under
    ``$ENCDIFF_DATA_CACHE`` (default ``/tmp/encdiff_cache``)."""

    factor_sizes = FULL_FACTOR_SIZES

    def __init__(self, image_size: int = 64, **kwargs):
        del kwargs
        key = ("v4", image_size, tuple(self.factor_sizes))
        if key not in _CACHE:
            import os

            cache_dir = os.environ.get("ENCDIFF_DATA_CACHE",
                                       "/tmp/encdiff_cache")
            tag = "x".join(map(str, self.factor_sizes))
            path = os.path.join(cache_dir, f"shapes3d_v4_{image_size}_"
                                           f"{tag}.npy")
            if os.path.exists(path):
                _CACHE[key] = np.load(path, mmap_mode="r")
            else:
                arr = render_all_v4(image_size,
                                    factor_sizes=self.factor_sizes)
                os.makedirs(cache_dir, exist_ok=True)
                np.save(path, arr)
                _CACHE[key] = arr
        super().__init__(_CACHE[key], with_idx=True)


class SyntheticShapes3DV4FullTrain(SyntheticShapes3DV4Full):
    pass


class SyntheticBandsFull(ArrayDataset):
    """Independence-control dataset: same [10,10,10,8,4,15] factor grid and
    index layout as :class:`SyntheticShapes3DFull`, rendered by
    :func:`render_bands` (disjoint pixel region per factor). Pairs with
    ``eval_name: synthetic_shapes_full`` — the ground-truth factor structure
    is identical; only the pixels differ."""

    factor_sizes = FULL_FACTOR_SIZES

    def __init__(self, image_size: int = 64, **kwargs):
        del kwargs
        key = ("bands", image_size, tuple(self.factor_sizes))
        if key not in _CACHE:
            _CACHE[key] = render_bands(image_size, self.factor_sizes)
        super().__init__(_CACHE[key], with_idx=True)


class SyntheticBandsFullTrain(SyntheticBandsFull):
    pass


class SyntheticBands(ArrayDataset):
    """27k-image bands control on the demo [6,6,6,4,4,8] grid (pairs with
    ``eval_name: synthetic_shapes``) — the matched-scale counterpart of the
    round-1 v1-renderer cell (DCI 0.863 at 100 epochs) for fast
    renderer-vs-model controls when the full grid is impractical."""

    factor_sizes = FACTOR_SIZES

    def __init__(self, image_size: int = 64, **kwargs):
        del kwargs
        key = ("bands", image_size, tuple(self.factor_sizes))
        if key not in _CACHE:
            _CACHE[key] = render_bands(image_size, self.factor_sizes)
        super().__init__(_CACHE[key], with_idx=True)


class SyntheticBandsTrain(SyntheticBands):
    pass
