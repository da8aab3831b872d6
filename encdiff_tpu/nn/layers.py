"""Shared NN primitives (flax.linen, NHWC, TPU-first).

Conventions that differ deliberately from the torch reference:

- **NHWC everywhere.** TPU convs tile onto the MXU in channels-last layout;
  the reference's NCHW (`ddpm_enc.py:351-353` rearranges to b c h w) is a
  GPU/cuDNN convention we do not replicate. Data loaders produce HWC and it
  stays HWC on device.
- **Explicit torch-style conv padding** so spatial shapes match the reference
  exactly (incl. the VAE's asymmetric (0,1,0,1) downsample pad,
  ``diffusionmodules/model.py:72-79``).
- Params are fp32; activations run in a configurable ``dtype`` (bf16 for
  training on TPU, fp32 for bit-comparable parity checks).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

__all__ = [
    "TorchConv", "GroupNorm", "timestep_embedding", "zero_init",
    "nonlinearity", "torch_linear_init", "TorchDense", "avg_pool_2x",
    "upsample_nearest_2x", "as_dtype",
]

_DTYPE_NAMES = {
    "float32": jnp.float32, "fp32": jnp.float32,
    "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
    "float16": jnp.float16, "fp16": jnp.float16,
}


def as_dtype(dtype):
    """Accept YAML string dtype names ('bfloat16') alongside jnp dtypes.

    Model __init__s take a ``dtype`` that bench.py passes as a jnp dtype
    object; configs can only carry strings, so normalize here.
    """
    if isinstance(dtype, str):
        return _DTYPE_NAMES[dtype]
    return dtype


def zero_init():
    """Init for reference `zero_module` layers (util.py:203-209)."""
    return nn.initializers.zeros_init()


def torch_linear_init(fan_in: int):
    """torch nn.Linear/Conv default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Matching the reference init family keeps early-training dynamics
    comparable; exact RNG streams are not reproduced.
    """
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchConv(nn.Module):
    """2D conv over NHWC with torch-integer padding semantics.

    out = floor((in + pad_lo + pad_hi - k) / stride) + 1, identical to torch's
    Conv2d so every spatial shape in the UNet/VAE matches the reference.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Any = 0  # int, or ((lo,hi),(lo,hi))
    use_bias: bool = True
    kernel_init: Callable | None = None
    bias_init: Callable | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        k = self.kernel_size
        in_feat = x.shape[-1]
        fan_in = in_feat * k * k
        kinit = self.kernel_init or torch_linear_init(fan_in)
        binit = self.bias_init or torch_linear_init(fan_in)
        return nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=binit,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class TorchDense(nn.Module):
    """Dense with torch nn.Linear default init."""

    features: int
    use_bias: bool = True
    kernel_init: Callable | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kinit = self.kernel_init or torch_linear_init(fan_in)
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=torch_linear_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class GroupNorm(nn.Module):
    """GroupNorm over the channel (last) axis, fp32 statistics.

    UNet `normalization()` = GroupNorm(32, eps=1e-5) (util.py:230-236 with
    torch default eps); VAE `Normalize()` = GroupNorm(32, eps=1e-6)
    (model.py:38-39). Stats are always computed in fp32 regardless of the
    activation dtype — required for bf16 training stability.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        y = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class _GNParams(nn.Module):
    """Bare GroupNorm affine params, declared under the same child-module
    path (``<name>/GroupNorm_0/{scale,bias}``) flax's nn.GroupNorm would
    use — keeps the fused module checkpoint-compatible with ``GroupNorm``."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return scale, bias


class GNSiLU(nn.Module):
    """GroupNorm (+ optional FiLM scale/shift) + SiLU with an optional fused
    Pallas path (``nn/pallas/groupnorm_silu.py``) — the GN-SiLU prologue of
    every ResBlock (openaimodel_enc.py:163-275, model.py:82-149) as one
    kernel when ``encdiff_tpu.nn.pallas.enabled()`` and the sample block
    fits VMEM; identical math (fp32 statistics) and an identical param tree
    to ``GroupNorm`` + ``nonlinearity`` otherwise."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale=None, shift=None):
        b, h, w, c = x.shape
        gamma, beta = _GNParams(c, name="GroupNorm_0")()

        from encdiff_tpu.nn import pallas as pallas_pkg
        from encdiff_tpu.nn.pallas.groupnorm_silu import (
            fits_vmem, gn_silu, reference_groupnorm_silu)

        if pallas_pkg.enabled("gn") and fits_vmem(h, w, c):
            sc = scale if scale is not None else jnp.zeros((b, c), x.dtype)
            sh = shift if shift is not None else jnp.zeros((b, c), x.dtype)
            return gn_silu(x, gamma, beta, sc, sh, self.num_groups,
                           self.epsilon, pallas_pkg.interpret())
        return reference_groupnorm_silu(
            x, gamma, beta, scale, shift,
            groups=self.num_groups, eps=self.epsilon)


def nonlinearity(x):
    """SiLU / swish (model.py:33-35)."""
    return jax.nn.silu(x)


def timestep_embedding(timesteps, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embedding, [cos | sin] order
    (diffusionmodules/util.py:179-199).

    timesteps: (B,) int or float -> (B, dim) float32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def avg_pool_2x(x):
    """2x2 average pool, stride 2, NHWC."""
    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))


def upsample_nearest_2x(x):
    """Nearest-neighbour 2x upsample, NHWC."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x
