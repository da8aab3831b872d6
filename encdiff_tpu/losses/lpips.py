"""LPIPS perceptual loss (VGG16 variant) in flax.

Rebuild of the taming-transformers ``LPIPS`` module the reference's VQ loss
depends on (``vqperceptual.py:59`` via ``taming.modules.losses.lpips``):
a frozen VGG16 trunk tapped at relu{1_2,2_2,3_3,4_3,5_3}, per-layer channel
unit-normalization, squared diffs, learned 1x1 "lin" heads, spatial mean,
sum over layers.

Pretrained weights are NOT bundled (zero-egress build). ``load_torch_lpips``
ingests the standard torch checkpoints (torchvision ``vgg16`` state_dict +
taming ``vgg.pth`` lin weights) when the user supplies them (point
``ENCDIFF_LPIPS_VGG`` / ``ENCDIFF_LPIPS_LIN`` at the files, or call the
loader directly). Without them, ``init_variables`` falls back to a
**calibrated random-features** mode: fixed-seed random VGG trunk + lin heads
pinned to uniform positive 1/C — i.e. the mean unit-normalized feature
distance. Random conv features are an established perceptual metric (the
distance is nonnegative and structure-sensitive), so ``perceptual_weight > 0``
is sound in this mode, just not bit-comparable to taming's calibrated LPIPS.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from encdiff_tpu.nn.layers import Dtype, TorchConv

# channel widths of the five tapped VGG16 stages
VGG_CHANNELS = (64, 128, 256, 512, 512)
# convs per stage for VGG16: 2,2,3,3,3
_STAGE_CONVS = (2, 2, 3, 3, 3)

# input scaling layer constants (taming lpips.ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk emitting the five relu taps."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Sequence[Any]:
        taps = []
        conv_idx = 0
        for stage, n_convs in enumerate(_STAGE_CONVS):
            for i in range(n_convs):
                x = TorchConv(VGG_CHANNELS[stage], 3, padding=1,
                              dtype=self.dtype, name=f"conv_{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
            taps.append(x)
            if stage < 4:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def _unit_normalize(feat, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(feat**2, axis=-1, keepdims=True))
    return feat / (norm + eps)


class LPIPSModule(nn.Module):
    """lpips(x, y) per sample; inputs in [-1, 1], NHWC."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        xs = (x - shift) / scale
        ys = (y - shift) / scale
        trunk = VGG16Features(dtype=self.dtype, name="vgg")
        fx = trunk(xs)
        fy = trunk(ys)
        total = 0.0
        for k, (a, b) in enumerate(zip(fx, fy)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            lin = TorchConv(1, 1, use_bias=False, dtype=self.dtype,
                            name=f"lin{k}")(d)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total  # (B,)


def calibrate_random_features(variables):
    """Pin the five lin heads to uniform positive 1/C so lpips(x, y) is the
    nonnegative mean unit-normalized feature distance (random-features
    perceptual metric). Loaded torch weights overwrite this."""
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    for k, c in enumerate(VGG_CHANNELS):
        params[f"lin{k}"]["Conv_0"]["kernel"] = jnp.full(
            (1, 1, c, 1), 1.0 / c, jnp.float32)
    return {"params": params}


class LPIPS:
    """Orchestrator: init / torch-weight ingestion / pure apply."""

    def __init__(self, dtype=jnp.float32):
        self.module = LPIPSModule(dtype=dtype)

    def init_variables(self, rng, image_size: int = 64):
        import os

        x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        # fixed trunk seed: the random-features metric must be identical
        # across restarts/hosts regardless of the caller's rng
        variables = self.module.init(jax.random.PRNGKey(1830), x, x)
        vgg_path = os.environ.get("ENCDIFF_LPIPS_VGG")
        lin_path = os.environ.get("ENCDIFF_LPIPS_LIN")
        if vgg_path and lin_path:
            import torch

            vgg_state = torch.load(vgg_path, map_location="cpu")
            lin_state = torch.load(lin_path, map_location="cpu")
            return load_torch_lpips(variables, vgg_state, lin_state)
        return calibrate_random_features(variables)

    def __call__(self, variables, x, y):
        return self.module.apply(variables, x, y)


def load_torch_lpips(variables, vgg_state: dict, lin_state: dict):
    """Map torchvision vgg16 ``features.*`` + taming ``lin{k}.model.1.weight``
    tensors onto the flax tree. Tensors are numpy or torch arrays."""

    def _np(t):
        return np.asarray(getattr(t, "detach", lambda: t)()).astype(np.float32)

    params = jax.tree_util.tree_map(lambda x: x, variables["params"])  # copy
    # torchvision vgg16.features conv layer indices; TorchConv wraps an
    # inner flax Conv submodule, hence the trailing "Conv_0" path segment
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for k, tvi in enumerate(tv_idx):
        w = _np(vgg_state[f"features.{tvi}.weight"])  # (O,I,kh,kw)
        b = _np(vgg_state[f"features.{tvi}.bias"])
        params["vgg"][f"conv_{k}"]["Conv_0"]["kernel"] = jnp.asarray(
            w.transpose(2, 3, 1, 0))
        params["vgg"][f"conv_{k}"]["Conv_0"]["bias"] = jnp.asarray(b)
    for k in range(5):
        w = _np(lin_state[f"lin{k}.model.1.weight"])  # (1,C,1,1)
        params[f"lin{k}"]["Conv_0"]["kernel"] = jnp.asarray(
            w.transpose(2, 3, 1, 0))
    return {"params": params}
