"""Training datasets (surface parity with ``ldm/data/disdata.py``).

TPU-first design: every dataset materializes ONE contiguous host uint8 array
``images`` of shape (N, H, W, 3) — exactly what the reference does implicitly
via per-item PIL/ToTensor work in torch DataLoader workers, but here the
per-item transform pipeline is eliminated: batches are a single vectorized
``images[idx]`` gather and the [-1,1] normalization runs ON DEVICE inside the
jitted train step (uint8 crosses PCIe, 4x less host->HBM traffic than f32).

API parity kept:
- ``__getitem__`` returns ``{"image": HWC float32 in [-1,1], "idx": i}``
  (``disdata.py:91-97``, the ToTensor+Normalize+permute pipeline).
- ``*Train`` subclasses exist but read the data root from the
  ``ENCDIFF_DATA_ROOT`` env var instead of the reference's hard-coded user
  paths (``disdata.py:749-790``, flagged in SURVEY.md §2.5).
- File layouts match: ``shapes3d/3dshapes.h5`` (or .npz), ``mpi3d/mpi3d_toy.npz``,
  ``cars/*.mat``, CelebA LMDB (``disdata.py:60-61,257,407,545``).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def data_root(path: str | None = None) -> str:
    if path:
        return os.path.expanduser(path)
    return os.path.expanduser(os.environ.get("ENCDIFF_DATA_ROOT", "~/datasets"))


class ArrayDataset:
    """Base: a (N,H,W,3) uint8 host array with vectorized batch access."""

    #: uint8 images (N, H, W, 3)
    images: np.ndarray

    def __init__(self, images: np.ndarray, with_idx: bool = False):
        assert images.dtype == np.uint8 and images.ndim == 4
        self.images = images
        self.length = len(images)
        self.with_idx = with_idx
        self.offset = 0

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, index: int) -> dict[str, Any]:
        assert index < self.length
        index = index + self.offset
        img = self.images[index].astype(np.float32) / 127.5 - 1.0
        out = {"image": img}
        if self.with_idx:
            out["idx"] = index
        return out

    def batch_uint8(self, indices: np.ndarray) -> np.ndarray:
        """Vectorized uint8 gather — the host side of the input pipeline.
        Uses the threaded C++ row gather (encdiff_tpu.native) when built;
        numpy fancy indexing otherwise."""
        try:
            from encdiff_tpu.native import fast_gather

            return fast_gather(self.images, indices)
        except Exception:
            return self.images[indices]


def normalize_uint8(batch):
    """On-device uint8 -> [-1,1] float32 (replaces ToTensor+Normalize,
    ``disdata.py:80-86``). Works on jnp or np arrays."""
    return batch.astype("float32") / 127.5 - 1.0


class Shapes3D(ArrayDataset):
    """3dshapes: 480k 64x64 images, factors [10,10,10,8,4,15]
    (``disdata.py:45-97``)."""

    def __init__(self, path=None, original_resolution=64, split=None,
                 as_tensor=True, do_normalize=True, **kwargs):
        del original_resolution, as_tensor, do_normalize, kwargs
        root = data_root(path)
        h5_path = os.path.join(root, "shapes3d", "3dshapes.h5")
        npz_path = os.path.join(root, "shapes3d", "3dshapes.npz")
        if os.path.exists(h5_path):
            import h5py

            with h5py.File(h5_path, "r") as f:
                images = f["images"][()]
        elif os.path.exists(npz_path):
            images = np.load(npz_path)["images"]
        else:
            raise FileNotFoundError(
                f"Dataset not found at {h5_path} or {npz_path}")
        if split is not None:
            raise NotImplementedError()
        super().__init__(np.ascontiguousarray(images, dtype=np.uint8),
                         with_idx=True)


class MPI3D(ArrayDataset):
    """mpi3d_toy: 1.036M 64x64 images, 7 factors [6,6,2,3,3,40,40]
    (``disdata.py:244-283``)."""

    def __init__(self, path=None, original_resolution=64, split=None,
                 as_tensor=True, do_normalize=True, **kwargs):
        del original_resolution, as_tensor, do_normalize, kwargs
        root = data_root(path)
        data = np.load(os.path.join(root, "mpi3d", "mpi3d_toy.npz"), "r")
        if split is not None:
            raise NotImplementedError()
        super().__init__(np.ascontiguousarray(data["images"], dtype=np.uint8))


# --- Cars3D: 183 .mat meshes -> (4*24*183) 64x64 images ---------------------

_CARS3D_FACTOR_SIZES = [4, 24, 183]


def _features_to_state_space_index(features, factor_sizes):
    num_total = np.prod(factor_sizes)
    factor_bases = num_total / np.cumprod(factor_sizes)
    if (np.any(features > np.expand_dims(factor_sizes, 0))
            or np.any(features < 0)):
        raise ValueError("Feature indices must be within [0, size-1]")
    return np.array(np.dot(features, factor_bases), dtype=np.int64)


def features_to_index(features, factor_sizes=tuple(_CARS3D_FACTOR_SIZES)):
    """Factor configuration -> storage index (``disdata.py:336-361``)."""
    factor_sizes = list(factor_sizes)
    num_total = np.prod(factor_sizes)
    grids = np.meshgrid(*[np.arange(s) for s in factor_sizes], indexing="ij")
    global_features = np.stack([g.ravel() for g in grids], axis=1)
    lookup = np.zeros(num_total, dtype=np.int64)
    lookup[_features_to_state_space_index(global_features, factor_sizes)] = (
        np.arange(num_total))
    return lookup[_features_to_state_space_index(features, factor_sizes)]


def _load_cars_mesh(filename):
    """One .mat car: (4 elevations, 24 azimuths) frames -> 64x64 LANCZOS."""
    import scipy.io as sio
    from PIL import Image

    with open(filename, "rb") as f:
        mesh = np.einsum("abcde->deabc", sio.loadmat(f)["im"])
    flat = mesh.reshape((-1,) + mesh.shape[2:])
    out = np.zeros((flat.shape[0], 64, 64, 3))
    for i in range(flat.shape[0]):
        pic = Image.fromarray(flat[i])
        pic.thumbnail((64, 64), Image.LANCZOS)
        out[i] = np.array(pic)
    return out / 255.0


def load_cars3d_array(folder) -> np.ndarray:
    """All meshes assembled in disentanglement_lib factor order
    (``disdata.py:363-395``)."""
    dataset = np.zeros((24 * 4 * 183, 64, 64, 3))
    files = [x for x in os.listdir(folder) if ".mat" in x]
    for i, filename in enumerate(files):
        data_mesh = _load_cars_mesh(os.path.join(folder, filename))
        f1 = np.arange(4)
        f2 = np.arange(24)
        all_factors = np.transpose(
            [np.tile(f1, len(f2)), np.repeat(f2, len(f1)),
             np.full(len(f1) * len(f2), i)])
        dataset[features_to_index(all_factors)] = data_mesh
    return np.uint8(dataset * 255)


class Cars3D(ArrayDataset):
    """183-model car renders; train split repeats x10 (``disdata.py:397-440``)."""

    def __init__(self, path=None, original_resolution=64, split=None,
                 as_tensor=True, do_normalize=True, **kwargs):
        del original_resolution, as_tensor, do_normalize
        root = data_root(path)
        cache = os.path.join(root, "cars", "_cars3d_cache.npz")
        if os.path.exists(cache):
            data = np.load(cache)["images"]
        else:
            data = load_cars3d_array(os.path.join(root, "cars"))
            try:
                np.savez_compressed(cache, images=data)
            except OSError:
                pass
        if "test" not in kwargs:
            data = np.repeat(data, 10, axis=0)
        if split is not None:
            raise NotImplementedError()
        super().__init__(np.ascontiguousarray(data, dtype=np.uint8))


class Clevr(ArrayDataset):
    """CLEVR npz (``disdata.py:442-481``)."""

    def __init__(self, path=None, original_resolution=64, split=None,
                 as_tensor=True, do_normalize=True, **kwargs):
        del original_resolution, as_tensor, do_normalize, kwargs
        root = data_root(path)
        data = np.load(os.path.join(root, "clevr_npz", "data.npz"), "r")
        if split is not None:
            raise NotImplementedError()
        super().__init__(np.ascontiguousarray(data["images"], dtype=np.uint8))


class LSUNchurch(ArrayDataset):
    """LSUN church 64px pre-decoded npy (``disdata.py:597-626``)."""

    def __init__(self, path=None, original_resolution=64, **kwargs):
        del original_resolution, kwargs
        root = data_root(path)
        data = np.load(
            os.path.join(root, "church_outdoor_train_lmdb_color_64.npy"))
        super().__init__(np.ascontiguousarray(data, dtype=np.uint8))


def _load_image_folder(folder, size) -> np.ndarray:
    from PIL import Image

    files = sorted(
        f for f in os.listdir(folder)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp")))
    out = np.zeros((len(files), size, size, 3), np.uint8)
    for i, f in enumerate(files):
        img = Image.open(os.path.join(folder, f)).convert("RGB")
        img = img.resize((size, size), Image.LANCZOS)
        out[i] = np.array(img)
    return out


class Flower(ArrayDataset):
    """Oxford flowers image folder (``disdata.py:100-137``)."""

    def __init__(self, path=None, image_size=64, **kwargs):
        del kwargs
        root = data_root(path)
        super().__init__(_load_image_folder(
            os.path.join(root, "flowers"), image_size))


class AFHQ(ArrayDataset):
    """AFHQ image folder (``disdata.py:140-177``)."""

    def __init__(self, path=None, image_size=64, split="train", **kwargs):
        del kwargs
        root = data_root(path)
        super().__init__(_load_image_folder(
            os.path.join(root, "afhq", split), image_size))


# --- CelebA (LMDB with d2c crop, or pre-decoded npy fallback) ---------------


class Crop:
    """d2c-style fixed crop (``disdata.py:484-506``)."""

    def __init__(self, x1, x2, y1, y2):
        self.x1, self.x2, self.y1, self.y2 = x1, x2, y1, y2

    def __call__(self, img):
        # img: PIL Image
        return img.crop((self.y1, self.y2, self.x1, self.x2))


def d2c_crop():
    # the d2c crop for CelebA 178x218 -> 148x148 central face box
    cx, cy = 89, 121
    x1, y1 = cy - 64, cx - 64
    x2, y2 = cy + 64, cx + 64
    return (x1, x2, y1, y2)


class CelebAlmdb(ArrayDataset):
    """CelebA via LMDB (``disdata.py:541-594``). Decodes the whole LMDB once
    into the host uint8 array (with optional d2c crop); if ``lmdb`` is not
    installed, falls back to ``celeba/celeba_<size>.npy``."""

    def __init__(self, path=None, image_size=64, original_resolution=128,
                 split=None, as_tensor=True, do_normalize=True, crop_d2c=False,
                 **kwargs):
        del as_tensor, do_normalize, kwargs
        root = data_root(path)
        npy_path = os.path.join(root, "celeba", f"celeba_{image_size}.npy")
        lmdb_path = os.path.join(root, "celeba")
        if os.path.exists(npy_path):
            images = np.load(npy_path, mmap_mode="r")
            images = np.ascontiguousarray(images, dtype=np.uint8)
        else:
            images = self._decode_lmdb(lmdb_path, image_size,
                                       original_resolution, crop_d2c)
        if split is not None:
            raise NotImplementedError()
        super().__init__(images)

    @staticmethod
    def _decode_lmdb(path, image_size, original_resolution, crop_d2c):
        try:
            import lmdb  # noqa: F401
        except ImportError as e:
            raise FileNotFoundError(
                f"no pre-decoded celeba npy found and lmdb unavailable "
                f"under {path}") from e
        import io

        from PIL import Image

        env = lmdb.open(path, readonly=True, lock=False, readahead=False,
                        meminit=False, max_readers=32)
        with env.begin(write=False) as txn:
            length = int(txn.get(b"length").decode("utf-8"))
            out = np.zeros((length, image_size, image_size, 3), np.uint8)
            for index in range(length):
                key = (f"{original_resolution}-"
                       f"{str(index).zfill(5)}").encode("utf-8")
                img_bytes = txn.get(key)
                img = Image.open(io.BytesIO(img_bytes)).convert("RGB")
                if crop_d2c:
                    x1, x2, y1, y2 = d2c_crop()
                    img = img.crop((y1, x1, y2, x2))
                img = img.resize((image_size, image_size), Image.LANCZOS)
                out[index] = np.array(img)
        return out


class SyntheticData(ArrayDataset):
    """Deterministic synthetic images for tests/benchmarks (no data files)."""

    def __init__(self, length=512, image_size=64, seed=0, **kwargs):
        del kwargs
        rs = np.random.RandomState(seed)
        images = rs.randint(0, 256, size=(length, image_size, image_size, 3),
                            dtype=np.uint8)
        super().__init__(images, with_idx=True)


# --- paired low/high-res variants (``disdata.py:180-242,285-333``) ----------


class _SDPair:
    """Returns {'image': 64px, 'image_512': SD-res} pairs."""

    def __init__(self, base: ArrayDataset, sd_size: int = 512):
        self.base = base
        self.sd_size = sd_size
        self.length = len(base)

    def __len__(self):
        return self.length

    def __getitem__(self, index):
        from PIL import Image

        item = self.base[index]
        raw = self.base.images[index]
        big = Image.fromarray(raw).resize((self.sd_size, self.sd_size),
                                          Image.BICUBIC)
        item["image_512"] = np.asarray(big, np.float32) / 127.5 - 1.0
        return item


def Shapes3D_SD(sd_size=512, **kwargs):
    return _SDPair(Shapes3D(**kwargs), sd_size)


def MPI3D_SD(sd_size=512, **kwargs):
    return _SDPair(MPI3D(**kwargs), sd_size)


# --- *Train aliases (env-rooted instead of hard-coded user paths) -----------


class Shapes3DTrain(Shapes3D):
    def __init__(self, **kwargs):
        super().__init__(path=None, original_resolution=None, **kwargs)


class MPI3DTrain(MPI3D):
    def __init__(self, **kwargs):
        super().__init__(path=None, original_resolution=None, **kwargs)


class Cars3DTrain(Cars3D):
    def __init__(self, **kwargs):
        super().__init__(path=None, original_resolution=None, **kwargs)


class ClevrTrain(Clevr):
    def __init__(self, **kwargs):
        super().__init__(path=None, original_resolution=None, **kwargs)


class Celebarain(CelebAlmdb):
    def __init__(self, **kwargs):
        super().__init__(path=None, **kwargs)


class CelebaTrain(CelebAlmdb):
    def __init__(self, **kwargs):
        super().__init__(path=None, **kwargs)


def Shapes3DTrainSD(**kwargs):
    return Shapes3D_SD(path=None, original_resolution=None, **kwargs)


def MPI3DTrainSD(**kwargs):
    return MPI3D_SD(path=None, original_resolution=None, **kwargs)
