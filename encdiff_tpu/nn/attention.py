"""Cross-attention stack conditioning the UNet on concept tokens.

TPU-first rebuild of ``ldm/modules/attention.py:152-261`` (CrossAttention,
BasicTransformerBlock w/ GEGLU FF, SpatialTransformer). Sequence lengths here
are tiny — at most 256 spatial queries attending to 20 concept-token keys —
so the win on TPU is *fusion*, not flash-style tiling: the reference's
einsum→softmax→einsum chain is expressed so XLA fuses it into the
surrounding matmuls, with an optional Pallas fused kernel
(``encdiff_tpu.nn.pallas.cross_attn``) for the hot path.

Attention-map capture (an intended capability the reference half-implements
and breaks — ``SURVEY.md`` §2.5, ``openaimodel_enc.py:712``) is supported
properly here via flax's ``sow`` mechanism: run the module with
``capture_attn=True`` and collect the ``"attn_maps"`` collection.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from encdiff_tpu.nn.layers import Dtype, GroupNorm, TorchConv, TorchDense


def attention(q, k, v, scale: float, precision=None, use_pallas=None):
    """Multi-head scaled-dot-product attention on (B, H, N, D) tensors.

    Softmax in fp32 for bf16 stability; matmuls hit the MXU with
    preferred fp32 accumulation. On TPU the score/softmax/value chain runs
    as one Pallas kernel (``nn.pallas.attention.attention_core``); the XLA
    einsum path is kept for CPU, attention-map capture, and as the
    reference (ENCDIFF_NO_PALLAS=1 disables the kernel).
    """
    from encdiff_tpu.nn import pallas as pallas_pkg

    if use_pallas is None:
        flash_on = pallas_pkg.enabled("flash")
        core_on = pallas_pkg.enabled("attn")
    else:
        flash_on = core_on = bool(use_pallas)
    n, m = q.shape[2], k.shape[2]
    if flash_on and n == m and n >= 1024 and n % 512 == 0:
        # large-latent self-attention (e.g. CelebA 64x64 -> 4096 tokens):
        # blockwise flash kernel, O(N*D) HBM traffic
        from encdiff_tpu.nn.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, scale,
                               interpret=pallas_pkg.interpret()), None
    if core_on:
        from encdiff_tpu.nn.pallas.attention import attention_core

        return attention_core(q, k, v), None
    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out, attn


class CrossAttention(nn.Module):
    """Q from x, K/V from context (attention.py:152-193).

    context=None => self-attention. With ``capture=True``, sows the per-head
    attention probabilities into the "attn_maps" collection.
    """

    query_dim: int
    context_dim: int | None = None
    heads: int = 8
    dim_head: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, capture: bool = False):
        h = self.heads
        inner = self.dim_head * h
        scale = self.dim_head ** -0.5
        context = x if context is None else context

        q = TorchDense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = TorchDense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = TorchDense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, self.dim_head).transpose(0, 2, 1, 3)

        # capture requires the probability tensor -> force the XLA path
        out, attn = attention(split_heads(q), split_heads(k), split_heads(v),
                              scale, use_pallas=False if capture else None)
        if capture:
            self.sow("attn_maps", "attn", attn,
                     init_fn=lambda: (), reduce_fn=lambda xs, x: xs + (x,))
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return TorchDense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    """x,gate = proj(x).chunk(2); x * gelu(gate) (attention.py:36-44)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        proj = TorchDense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        val, gate = jnp.split(proj, 2, axis=-1)
        return val * jax.nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """GEGLU MLP with 4x expansion (attention.py:47-63)."""

    dim: int
    mult: int = 4
    glu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        if self.glu:
            x = GEGLU(inner, dtype=self.dtype, name="geglu")(x)
        else:
            x = TorchDense(inner, dtype=self.dtype, name="proj_in")(x)
            x = jax.nn.gelu(x, approximate=False)
        return TorchDense(self.dim, dtype=self.dtype, name="proj_out")(x)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn(context) -> GEGLU FF, pre-LN residuals
    (attention.py:196-215). Remat is applied at the UNet level with
    ``jax.checkpoint`` rather than per-block torch checkpointing."""

    dim: int
    n_heads: int
    d_head: int
    context_dim: int | None = None
    gated_ff: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, capture: bool = False):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       param_dtype=jnp.float32, name=name)
        x = CrossAttention(self.dim, None, self.n_heads, self.d_head,
                           dtype=self.dtype, name="attn1")(ln("norm1")(x).astype(x.dtype)) + x
        x = CrossAttention(self.dim, self.context_dim, self.n_heads, self.d_head,
                           dtype=self.dtype, name="attn2")(
            ln("norm2")(x).astype(x.dtype), context=context, capture=capture) + x
        x = FeedForward(self.dim, glu=self.gated_ff, dtype=self.dtype,
                        name="ff")(ln("norm3")(x).astype(x.dtype)) + x
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm -> 1x1 proj -> (B,HW,C) transformer blocks -> 1x1 zero proj
    + residual (attention.py:218-261). NHWC: the b c h w <-> b (hw) c
    rearranges of the reference collapse to a single reshape."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, capture: bool = False):
        b, hgt, wid, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        x = GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = TorchConv(inner, kernel_size=1, dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, hgt * wid, inner)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                inner, self.n_heads, self.d_head, context_dim=self.context_dim,
                dtype=self.dtype, name=f"block_{i}")(x, context=context,
                                                     capture=capture)
        x = x.reshape(b, hgt, wid, inner)
        x = TorchConv(self.in_channels, kernel_size=1,
                      kernel_init=nn.initializers.zeros_init(),
                      bias_init=nn.initializers.zeros_init(),
                      dtype=self.dtype, name="proj_out")(x)
        return x + x_in
