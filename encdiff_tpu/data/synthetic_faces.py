"""Procedural CelebA-stand-in: 256px face-like images with known binary
attributes — the zero-egress counterpart of the CelebA lmdb workflow
(``disdata.py:484-594`` loading, ``celeba_tad.py`` attributes,
``celeba_fid.py`` sample realism) so the CelebA-scale EncDiff config
(64x64 latents, 4096-token flash attention) can train and be evaluated
end-to-end without the real data files.

Factor grid (34,560 images, 256x256x3 uint8 ~ 6.8 GB, disk-cached):

    background(8) x skin(5) x hair_color(6) x hair_length(4)
    x face_width(4) x smile(3) x eye_size(3)

Each image: flat background, elliptical face with radial shading, hair cap
whose side length tracks ``hair_length``, two eyes with highlights, brows,
nose line, and a curvature-coded mouth. All masks are anti-aliased signed
distances. ``attributes()`` exposes CelebA-style binary labels derived
from the factors (Black_Hair, Blond_Hair, Smiling, ...), enabling the TAD
protocol (``ae_utils_exp.py:216-235``) against ground-truth attributes.
"""

from __future__ import annotations

import os

import numpy as np

from encdiff_tpu.data.datasets import ArrayDataset

FACE_FACTOR_SIZES = [8, 5, 6, 4, 4, 3, 3]
FACE_FACTOR_NAMES = ["background", "skin", "hair_color", "hair_length",
                     "face_width", "smile", "eye_size"]
N_FACES = int(np.prod(FACE_FACTOR_SIZES))  # 34560

_BG = np.array([[90, 120, 200], [200, 120, 90], [120, 200, 120],
                [200, 200, 120], [150, 90, 180], [90, 190, 200],
                [220, 160, 200], [140, 140, 140]], np.float32)
_SKIN = np.array([[255, 224, 196], [240, 200, 160], [210, 160, 120],
                  [170, 120, 80], [120, 80, 50]], np.float32)
_HAIR = np.array([[25, 20, 20],      # black
                  [110, 70, 40],     # brown
                  [220, 190, 120],   # blond
                  [170, 60, 40],     # red
                  [180, 180, 180],   # gray
                  [70, 60, 140]],    # dyed blue
                 np.float32)
_HAIR_NAMES = ["Black_Hair", "Brown_Hair", "Blond_Hair", "Red_Hair",
               "Gray_Hair", "Dyed_Hair"]


def _aa(d: np.ndarray, edge: float = 1.5) -> np.ndarray:
    """Signed distance -> anti-aliased coverage in [0, 1]."""
    return np.clip(0.5 - d / edge, 0.0, 1.0)


def render_faces(size: int = 256, factor_sizes=None) -> np.ndarray:
    fs = list(FACE_FACTOR_SIZES if factor_sizes is None else factor_sizes)
    n_bg, n_skin, n_hair, n_len, n_wid, n_smile, n_eye = fs
    n_images = int(np.prod(fs))
    s = size / 256.0
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cx, cy = size / 2.0, size * 0.54

    # ---- geometry block over (hair_length, face_width, smile, eye_size) --
    n_geo = n_len * n_wid * n_smile * n_eye
    face_a = np.empty((n_geo, size, size), np.float32)   # face coverage
    hair_a = np.empty_like(face_a)                       # hair behind face
    fringe_a = np.empty_like(face_a)                     # scalp hair on face
    feat_a = np.empty_like(face_a)                       # dark features
    white_a = np.empty_like(face_a)                      # eye whites
    g = 0
    for ln in range(n_len):
        for wd in range(n_wid):
            rx = (62 + 14 * wd / max(n_wid - 1, 1)) * s
            ry = 88 * s
            d_face = (np.sqrt(((xx - cx) / rx) ** 2 +
                              ((yy - cy) / ry) ** 2) - 1.0) * min(rx, ry)
            # hair: outer ellipse above the brow line, sides extend down
            # with hair_length
            hr = rx + 14 * s
            top = cy - ry * 0.55
            drop = cy + ry * (0.1 + 0.45 * ln / max(n_len - 1, 1))
            d_hair = (np.sqrt(((xx - cx) / hr) ** 2 +
                              ((yy - top) / (ry * 0.9)) ** 2) - 1.0) * hr
            hair_mask = _aa(d_hair, 2.0) * _aa(yy - drop, 8.0)
            # bald = hair_length 0: no hair at all
            if ln == 0:
                hair_mask *= 0.0
            face_mask = _aa(d_face, 2.0)
            # scalp fringe: hair drawn OVER the face only above the
            # hairline (the rest of the cap sits behind the face)
            hairline = cy - ry * 0.45
            fringe = hair_mask * face_mask * _aa(yy - hairline, 6.0)
            for sm in range(n_smile):
                curve = (sm / max(n_smile - 1, 1) - 0.5) * 2.0  # -1..1
                for ey in range(n_eye):
                    er = (7 + 4 * ey / max(n_eye - 1, 1)) * s
                    exo = rx * 0.42
                    eyy = cy - ry * 0.15
                    d_el = np.sqrt((xx - (cx - exo)) ** 2 +
                                   (yy - eyy) ** 2) - er
                    d_er = np.sqrt((xx - (cx + exo)) ** 2 +
                                   (yy - eyy) ** 2) - er
                    eyes = np.maximum(_aa(d_el), _aa(d_er))
                    pupil = np.maximum(_aa(d_el + er * 0.5),
                                       _aa(d_er + er * 0.5))
                    # brows: thin bars above the eyes
                    by = eyy - er - 8 * s
                    brows = (_aa(np.abs(yy - by) - 2.5 * s) *
                             np.maximum(
                                 _aa(np.abs(xx - (cx - exo)) - er * 1.3),
                                 _aa(np.abs(xx - (cx + exo)) - er * 1.3)))
                    # nose: vertical line
                    nose = (_aa(np.abs(xx - cx) - 1.8 * s) *
                            _aa(np.abs(yy - (cy + ry * 0.12)) - 14 * s))
                    # mouth: parabola, curvature = smile
                    my = cy + ry * 0.45
                    mx = (xx - cx) / (rx * 0.45)
                    arc = my - curve * 10.0 * s * (mx ** 2 - 0.5)
                    mouth = (_aa(np.abs(yy - arc) - 3.0 * s) *
                             _aa(np.abs(mx) - 1.0, 0.05))
                    feat_a[g] = np.clip(pupil + brows + 0.6 * nose + mouth,
                                        0, 1)
                    white_a[g] = np.clip(eyes - pupil, 0, 1)
                    face_a[g] = face_mask
                    hair_a[g] = hair_mask
                    fringe_a[g] = fringe
                    g += 1
    assert g == n_geo

    # face shading (fixed light from upper-left)
    shade = 1.04 - 0.22 * np.clip(
        np.sqrt((xx - cx + 30 * s) ** 2 + (yy - cy + 40 * s) ** 2)
        / (120.0 * s), 0, 1.4)

    face_a = face_a[..., None]
    hair_a = hair_a[..., None]
    fringe_a = fringe_a[..., None]
    feat_a = feat_a[..., None]
    white_a = white_a[..., None]
    shade = shade[..., None]

    out = np.empty((n_images, size, size, 3), np.uint8)
    idx = 0
    dark = np.array([30, 25, 25], np.float32)
    white = np.array([245, 245, 245], np.float32)
    for bg in range(n_bg):
        base = np.broadcast_to(_BG[bg], (size, size, 3))
        for sk in range(n_skin):
            face_rgb = _SKIN[sk] * shade
            for hc in range(n_hair):
                hair_rgb = _HAIR[hc] * shade
                img = (1.0 - hair_a) * base + hair_a * hair_rgb
                img = (1.0 - face_a) * img + face_a * face_rgb
                img = (1.0 - fringe_a) * img + fringe_a * hair_rgb
                img = (1.0 - white_a) * img + white_a * white
                img = (1.0 - feat_a) * img + feat_a * dark
                np.copyto(out[idx:idx + n_geo],
                          np.clip(img, 0, 255).astype(np.uint8))
                idx += n_geo
    assert idx == n_images
    return out


def face_factors(n: int | None = None, factor_sizes=None) -> np.ndarray:
    """(N, 7) integer factor values in index order."""
    fs = list(FACE_FACTOR_SIZES if factor_sizes is None else factor_sizes)
    n = n or int(np.prod(fs))
    bases = np.concatenate([np.cumprod(fs[::-1])[::-1][1:], [1]]).astype(
        np.int64)
    idx = np.arange(n, dtype=np.int64)
    return np.stack([(idx // bases[i]) % fs[i] for i in range(len(fs))],
                    axis=1)


#: binary attribute names (CelebA-style) derivable from the factor grid
FACE_ATTR_NAMES = _HAIR_NAMES + [
    "Bald", "Long_Hair", "Short_Hair", "Wide_Face", "Narrow_Face",
    "Smiling", "Frowning", "Big_Eyes", "Small_Eyes", "Pale_Skin",
    "Dark_Skin", "Cool_Background",
]


def face_attributes(n: int | None = None) -> np.ndarray:
    """(N, 18) binary attributes for the TAD protocol."""
    f = face_factors(n)
    bg, sk, hc, ln, wd, sm, ey = (f[:, i] for i in range(7))
    cols = [hc == i for i in range(6)]  # hair colors
    cols += [ln == 0, ln == 3, ln == 1, wd == 3, wd == 0,
             sm == 2, sm == 0, ey == 2, ey == 0, sk == 0, sk == 4,
             np.isin(bg, [0, 2, 5])]
    return np.stack(cols, axis=1).astype(np.float32)


_CACHE: dict[tuple, np.ndarray] = {}


class SyntheticFaces(ArrayDataset):
    """Training dataset over the procedural face grid (drop-in for
    CelebaTrain in the CelebA-scale configs)."""

    def __init__(self, image_size: int = 256, **kwargs):
        del kwargs
        key = (image_size,)
        if key not in _CACHE:
            cache_dir = os.environ.get("ENCDIFF_DATA_CACHE",
                                       "/tmp/encdiff_cache")
            path = os.path.join(cache_dir, f"faces_{image_size}.npy")
            if os.path.exists(path):
                _CACHE[key] = np.load(path, mmap_mode="r")
            else:
                arr = render_faces(image_size)
                os.makedirs(cache_dir, exist_ok=True)
                np.save(path, arr)
                _CACHE[key] = arr
        super().__init__(_CACHE[key], with_idx=True)


class SyntheticFacesTrain(SyntheticFaces):
    pass


#: continuous LFW-style attribute names derivable from the factor grid
FACE_LFW_ATTR_NAMES = [
    "Hair_Darkness", "Hair_Length", "Face_Width", "Smile_Intensity",
    "Eye_Size", "Skin_Tone", "Background_Warmth", "Blondness",
    "Hair_Redness", "Face_Roundness",
]


def face_lfw_attributes(n: int | None = None, factor_sizes=None) -> np.ndarray:
    """(N, 10) continuous attributes in LFW's z-scored-regressor style —
    the targets of the ``eval_lfw.py`` regression protocol
    (lfw_src/lfw_attribute.py exposes 73 continuous regressor outputs;
    these 10 are the factor-derived analogues for the procedural grid)."""
    f = face_factors(n, factor_sizes).astype(np.float32)
    bg, sk, hc, ln, wd, sm, ey = (f[:, i] for i in range(7))
    hair_lum = _HAIR.mean(axis=1) / 255.0       # luminance per hair color
    bg_warmth = (_BG[:, 0] - _BG[:, 2]) / 255.0  # red minus blue
    cols = [
        1.0 - hair_lum[hc.astype(int)],          # Hair_Darkness
        ln / 3.0,                                # Hair_Length
        wd / 3.0,                                # Face_Width
        sm / 2.0 * 2.0 - 1.0,                    # Smile_Intensity (frown<0)
        ey / 2.0,                                # Eye_Size
        sk / 4.0,                                # Skin_Tone (pale->dark)
        bg_warmth[bg.astype(int)],               # Background_Warmth
        (hc == 2).astype(np.float32),            # Blondness
        (hc == 3).astype(np.float32),            # Hair_Redness
        1.0 - wd / 3.0 * 0.5 - ey / 2.0 * 0.5,   # Face_Roundness (composite)
    ]
    a = np.stack(cols, axis=1)
    return ((a - a.mean(axis=0)) / (a.std(axis=0) + 1e-8)).astype(np.float32)


def write_lfw_format(root: str, image_size: int = 64, num: int = 4000,
                     seed: int = 0, factor_sizes=None) -> str:
    """Write a synthetic-faces subset in the on-disk layout
    ``evalx.lfw.LFWAttribute`` expects (``lfw_attributes.txt`` +
    ``lfw-deepfunneled/<Person>/<Person>_0001.jpg``), so
    ``scripts/eval_lfw.py`` runs end-to-end in this zero-egress
    environment. One synthetic 'person' per grid image, continuous
    attributes from :func:`face_lfw_attributes`. ``factor_sizes``
    shrinks the grid for tests (renders directly, skipping the cache)."""
    from PIL import Image

    rs = np.random.RandomState(seed)
    if factor_sizes is not None:
        images = render_faces(image_size, factor_sizes)
    else:
        images = SyntheticFaces(max(image_size, 64)).images
    sel = np.sort(rs.choice(len(images), size=min(num, len(images)),
                            replace=False))
    attrs = face_lfw_attributes(factor_sizes=factor_sizes)[sel]
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "lfw_attributes.txt"), "w") as f:
        f.write("# synthetic faces in LFW attribute format\n")
        f.write("person\timagenum\t" + "\t".join(FACE_LFW_ATTR_NAMES) + "\n")
        for row, (gi, a) in enumerate(zip(sel, attrs)):
            person = f"Synthetic Face {int(gi):05d}"
            p = person.replace(" ", "_")
            d = os.path.join(root, "lfw-deepfunneled", p)
            os.makedirs(d, exist_ok=True)
            img = np.asarray(images[gi])
            Image.fromarray(img).save(os.path.join(d, f"{p}_0001.jpg"),
                                      quality=95)
            f.write(person + "\t1\t"
                    + "\t".join(f"{v:.6f}" for v in a) + "\n")
    return root


def write_eval_npz(path: str, image_size: int = 256, num: int = 4096,
                   seed: int = 0) -> str:
    """Write a ``test_celeba.npz``-format eval file (``data`` images +
    ``targ`` binary attributes) from a random subset of the face grid —
    the input format of ``scripts/celeba_tad.py``."""
    rs = np.random.RandomState(seed)
    ds = SyntheticFaces(image_size)
    sel = rs.choice(len(ds.images), size=min(num, len(ds.images)),
                    replace=False)
    data = np.asarray(ds.images[np.sort(sel)])
    targ = face_attributes()[np.sort(sel)]
    np.savez(path, data=data, targ=targ,
             attr_names=np.array(FACE_ATTR_NAMES))
    return path
