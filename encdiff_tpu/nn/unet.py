"""OpenAI-style UNet denoiser with FiLM time conditioning and concept-token
cross-attention.

TPU-native rebuild of ``ldm/modules/diffusionmodules/openaimodel_enc.py``
(UNetModel:413-748, ResBlock:163-275, Upsample:91, Downsample:134). NHWC
throughout; skip connections concatenate on the channel (last) axis; the
flat (B, latent_unit*context_dim) conditioning vector is reshaped to
(B, latent_unit, context_dim) tokens exactly like ``openaimodel_enc.py:729``.

Differences from the reference by design:
- functional flax module, jitted as a whole; with ``use_checkpoint`` the
  train step wraps the whole denoiser apply in ``jax.checkpoint``
  (``LatentDiffusion.loss_fn``) instead of torch's per-block custom
  autograd.Function (``util.py:116-176``).
- attention maps are captured correctly through flax ``sow`` (the reference's
  ``return_context`` plumbing is broken — SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from encdiff_tpu.nn.attention import SpatialTransformer
from encdiff_tpu.nn.layers import (
    Dtype, GNSiLU, GroupNorm, TorchConv, TorchDense, avg_pool_2x,
    nonlinearity,
    timestep_embedding, upsample_nearest_2x,
)


class ResBlock(nn.Module):
    """FiLM (scale-shift) residual block (openaimodel_enc.py:163-275).

    up/down variants apply the resample between the first norm-act and its
    conv, to both the residual branch and the skip, matching `:255-261`.
    """

    channels: int
    emb_channels: int
    out_channels: int | None = None
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, *, deterministic: bool = True):
        out_ch = self.out_channels or self.channels

        h = GNSiLU(32, epsilon=1e-5, dtype=self.dtype, name="in_norm")(x)
        if self.up:
            h = upsample_nearest_2x(h)
            x = upsample_nearest_2x(x)
        elif self.down:
            h = avg_pool_2x(h)
            x = avg_pool_2x(x)
        h = TorchConv(out_ch, 3, padding=1, dtype=self.dtype, name="in_conv")(h)

        emb_out = TorchDense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            dtype=self.dtype, name="emb_proj")(nonlinearity(emb))

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GNSiLU(32, epsilon=1e-5, dtype=self.dtype,
                       name="out_norm")(h, scale, shift)
        else:
            h = h + emb_out[:, None, None, :]
            h = GNSiLU(32, epsilon=1e-5, dtype=self.dtype, name="out_norm")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = TorchConv(out_ch, 3, padding=1,
                      kernel_init=nn.initializers.zeros_init(),
                      bias_init=nn.initializers.zeros_init(),
                      dtype=self.dtype, name="out_conv")(h)

        if out_ch == self.channels:
            skip = x
        else:
            skip = TorchConv(out_ch, 1, dtype=self.dtype, name="skip")(x)
        return skip + h


class Downsample(nn.Module):
    """Strided-conv or avg-pool downsample (openaimodel_enc.py:134-160)."""

    out_channels: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return TorchConv(self.out_channels, 3, stride=2, padding=1,
                             dtype=self.dtype, name="op")(x)
        return avg_pool_2x(x)


class Upsample(nn.Module):
    """Nearest 2x + optional conv (openaimodel_enc.py:91-119)."""

    out_channels: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = upsample_nearest_2x(x)
        if self.use_conv:
            x = TorchConv(self.out_channels, 3, padding=1,
                          dtype=self.dtype, name="conv")(x)
        return x


class UNetModel(nn.Module):
    """The denoiser ε_θ(x_t, t, concept tokens).

    Config parity with openaimodel_enc.py:443-470 for the fields the EncDiff
    configs exercise; unsupported legacy paths (class-conditioning,
    codebook-id prediction, fp16 torso conversion) are intentionally absent.
    """

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    latent_unit: int = 20
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_heads: int = 8
    num_head_channels: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    use_spatial_transformer: bool = True
    transformer_depth: int = 1
    context_dim: int | None = 16
    use_checkpoint: bool = False
    dtype: Dtype = jnp.float32
    # accepted-and-ignored reference config keys
    use_fp16: bool = False
    legacy: bool = True
    num_heads_upsample: int = -1
    use_new_attention_order: bool = False
    n_embed: int | None = None
    num_classes: int | None = None

    def _heads(self, ch: int) -> tuple[int, int]:
        if self.num_head_channels == -1:
            return self.num_heads, ch // self.num_heads
        return ch // self.num_head_channels, self.num_head_channels

    @nn.compact
    def __call__(self, x, timesteps, context, *, deterministic: bool = True,
                 capture_attn: bool = False):
        """x: (B,H,W,C) noisy latent; timesteps: (B,); context: (B, U*D) flat
        tokens or (B,U,D). Returns ε-prediction, (B,H,W,out_channels)."""
        b = x.shape[0]
        if context is not None and context.ndim == 2:
            # flat (B, latent_unit*context_dim) -> (B, U, D); parity with
            # openaimodel_enc.py:729
            context = context.reshape(b, -1, self.context_dim)
        if context is not None:
            context = context.astype(self.dtype)

        t_emb = timestep_embedding(timesteps, self.model_channels)
        emb = TorchDense(self.model_channels * 4, dtype=self.dtype,
                         name="time_embed_0")(t_emb.astype(self.dtype))
        emb = TorchDense(self.model_channels * 4, dtype=self.dtype,
                         name="time_embed_2")(nonlinearity(emb))

        def res(ch, out_ch, name, **kw):
            blk = ResBlock(ch, self.model_channels * 4, out_channels=out_ch,
                           use_scale_shift_norm=self.use_scale_shift_norm,
                           dropout=self.dropout, dtype=self.dtype, name=name, **kw)
            return blk

        def attn_layer(ch, name):
            heads, dim_head = self._heads(ch)
            return SpatialTransformer(
                ch, heads, dim_head, depth=self.transformer_depth,
                context_dim=self.context_dim, dtype=self.dtype, name=name)

        h = x.astype(self.dtype)
        h = TorchConv(self.model_channels, 3, padding=1, dtype=self.dtype,
                      name="conv_in")(h)
        hs = [h]
        ch = self.model_channels
        ds = 1
        # --- encoder ---
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = res(ch, mult * self.model_channels,
                        f"down_{level}_{i}_res")(h, emb,
                                                 deterministic=deterministic)
                ch = mult * self.model_channels
                if ds in self.attention_resolutions:
                    h = attn_layer(ch, f"down_{level}_{i}_attn")(
                        h, context=context, capture=capture_attn)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res(ch, ch, f"down_{level}_ds", down=True)(
                        h, emb, deterministic=deterministic)
                else:
                    h = Downsample(ch, self.conv_resample, dtype=self.dtype,
                                   name=f"down_{level}_ds")(h)
                hs.append(h)
                ds *= 2
        # --- middle ---
        h = res(ch, ch, "mid_res1")(h, emb, deterministic=deterministic)
        h = attn_layer(ch, "mid_attn")(h, context=context, capture=capture_attn)
        h = res(ch, ch, "mid_res2")(h, emb, deterministic=deterministic)
        # --- decoder ---
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = res(ch + skip.shape[-1], self.model_channels * mult,
                        f"up_{level}_{i}_res")(h, emb,
                                               deterministic=deterministic)
                ch = self.model_channels * mult
                if ds in self.attention_resolutions:
                    h = attn_layer(ch, f"up_{level}_{i}_attn")(
                        h, context=context, capture=capture_attn)
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res(ch, ch, f"up_{level}_us", up=True)(
                            h, emb, deterministic=deterministic)
                    else:
                        h = Upsample(ch, self.conv_resample, dtype=self.dtype,
                                     name=f"up_{level}_us")(h)
                    ds //= 2
        # --- head ---
        h = GNSiLU(32, epsilon=1e-5, dtype=self.dtype, name="out_norm")(h)
        h = TorchConv(self.out_channels, 3, padding=1,
                      kernel_init=nn.initializers.zeros_init(),
                      bias_init=nn.initializers.zeros_init(),
                      dtype=self.dtype, name="out_conv")(h)
        return h.astype(x.dtype)
