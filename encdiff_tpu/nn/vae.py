"""VQ-VAE / KL-VAE conv backbone (CompVis-style Encoder/Decoder).

TPU-native rebuild of ``ldm/modules/diffusionmodules/model.py`` (Encoder:368,
Decoder:462, ResnetBlock:82, AttnBlock:150, Upsample:42, Downsample:60).
NHWC; GroupNorm eps 1e-6 (model.py:38-39); the Downsample keeps the
reference's asymmetric (0,1,0,1) pad + valid 3x3 stride-2 conv so latent
grids match the torch checkpoints exactly.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from encdiff_tpu.nn.layers import (
    Dtype, GNSiLU, GroupNorm, TorchConv, avg_pool_2x, nonlinearity,
    upsample_nearest_2x,
)


class ResnetBlock(nn.Module):
    """GN-SiLU-conv x2 with 1x1 (or 3x3) shortcut (model.py:82-141).
    temb path is omitted: the VAE configs all use temb_channels=0."""

    in_channels: int
    out_channels: int | None = None
    conv_shortcut: bool = False
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        out_ch = self.out_channels or self.in_channels
        h = GNSiLU(32, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = TorchConv(out_ch, 3, padding=1, dtype=self.dtype, name="conv1")(h)
        h = GNSiLU(32, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = TorchConv(out_ch, 3, padding=1, dtype=self.dtype, name="conv2")(h)
        if self.in_channels != out_ch:
            if self.conv_shortcut:
                x = TorchConv(out_ch, 3, padding=1, dtype=self.dtype,
                              name="conv_shortcut")(x)
            else:
                x = TorchConv(out_ch, 1, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over spatial positions
    (model.py:150-202); 1x1-conv q/k/v, fp32 softmax.

    Routed through the shared ``nn.attention.attention`` helper so the
    blockwise flash kernel takes over at large N: a 256px encoder has a
    64x64 bottleneck (4096 tokens) whose materialized fp32 scores are
    67 MB *per image* — one chunked dataset-encode at chunk=2048 tried to
    allocate f32[2048,4096,4096] = 137 GB and failed HBM planning (round-3
    faces pipeline). Flash keeps the score tiles in VMEM, O(N·C) HBM."""

    in_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from encdiff_tpu.nn.attention import attention

        b, hgt, wid, c = x.shape
        h = GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        q = TorchConv(c, 1, dtype=self.dtype, name="q")(h).reshape(b, hgt * wid, c)
        k = TorchConv(c, 1, dtype=self.dtype, name="k")(h).reshape(b, hgt * wid, c)
        v = TorchConv(c, 1, dtype=self.dtype, name="v")(h).reshape(b, hgt * wid, c)
        # single head: (B, N, C) -> (B, 1, N, C); identical math to the
        # reference einsum chain (fp32 softmax inside the helper)
        out, _ = attention(q[:, None], k[:, None], v[:, None],
                           scale=c ** -0.5)
        out = out[:, 0].reshape(b, hgt, wid, c).astype(x.dtype)
        out = TorchConv(c, 1, dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    """Asymmetric-pad stride-2 conv or avg-pool (model.py:60-79)."""

    with_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            return TorchConv(x.shape[-1], 3, stride=2,
                             padding=((0, 1), (0, 1)), dtype=self.dtype,
                             name="conv")(x)
        return avg_pool_2x(x)


class Upsample(nn.Module):
    """Nearest 2x + optional 3x3 conv (model.py:42-57)."""

    with_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = upsample_nearest_2x(x)
        if self.with_conv:
            x = TorchConv(x.shape[-1], 3, padding=1, dtype=self.dtype,
                          name="conv")(x)
        return x


def _use_attn(curr_res: int, attn_resolutions: Sequence[int]) -> bool:
    return curr_res in tuple(attn_resolutions or ())


class Encoder(nn.Module):
    """Image -> latent moments (model.py:368-459)."""

    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    in_channels: int
    resolution: int
    z_channels: int
    out_ch: int = 3              # unused by the encoder; kept for ddconfig parity
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    double_z: bool = True
    dtype: Dtype = jnp.float32
    attn_type: str = "vanilla"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        num_res = len(self.ch_mult)
        curr_res = self.resolution
        h = TorchConv(self.ch, 3, padding=1, dtype=self.dtype, name="conv_in")(
            x.astype(self.dtype))
        for i_level in range(num_res):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(h.shape[-1], block_out, dropout=self.dropout,
                                dtype=self.dtype,
                                name=f"down_{i_level}_block_{i_block}")(
                    h, deterministic=deterministic)
                if _use_attn(curr_res, self.attn_resolutions):
                    h = AttnBlock(block_out, dtype=self.dtype,
                                  name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_res - 1:
                h = Downsample(self.resamp_with_conv, dtype=self.dtype,
                               name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        h = ResnetBlock(h.shape[-1], dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_1")(h, deterministic=deterministic)
        h = AttnBlock(h.shape[-1], dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_2")(h, deterministic=deterministic)
        h = GNSiLU(32, epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        out_feat = 2 * self.z_channels if self.double_z else self.z_channels
        return TorchConv(out_feat, 3, padding=1, dtype=self.dtype,
                         name="conv_out")(h)


class Decoder(nn.Module):
    """Latent -> image (model.py:462-568)."""

    ch: int
    out_ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    in_channels: int
    resolution: int
    z_channels: int
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    give_pre_end: bool = False
    tanh_out: bool = False
    double_z: bool = True        # unused by decoder; ddconfig parity
    dtype: Dtype = jnp.float32
    attn_type: str = "vanilla"

    @nn.compact
    def __call__(self, z, *, deterministic: bool = True):
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_res - 1]
        curr_res = self.resolution // 2 ** (num_res - 1)
        h = TorchConv(block_in, 3, padding=1, dtype=self.dtype, name="conv_in")(
            z.astype(self.dtype))
        h = ResnetBlock(block_in, dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_1")(h, deterministic=deterministic)
        h = AttnBlock(block_in, dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_2")(h, deterministic=deterministic)
        for i_level in reversed(range(num_res)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(h.shape[-1], block_out, dropout=self.dropout,
                                dtype=self.dtype,
                                name=f"up_{i_level}_block_{i_block}")(
                    h, deterministic=deterministic)
                if _use_attn(curr_res, self.attn_resolutions):
                    h = AttnBlock(block_out, dtype=self.dtype,
                                  name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(self.resamp_with_conv, dtype=self.dtype,
                             name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        if self.give_pre_end:
            return h
        h = GNSiLU(32, epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        # sown for the GAN adaptive weight: grads of nll/g_loss wrt the
        # conv_out kernel only need (dL/dxrec, this activation) —
        # vqperceptual.py:86-94 without a second full backward
        self.sow("intermediates", "pre_conv_out", h)
        h = TorchConv(self.out_ch, 3, padding=1, dtype=self.dtype,
                      name="conv_out")(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h
