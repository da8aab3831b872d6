"""Full x_transformer encoder stack (lucidrains surface) in flax.

Complete rebuild of ``ldm/modules/x_transformer.py`` (the reference vendors
lucidrains' x-transformers for its legacy ``TransformerEmbedder`` /
``BERTEmbedder`` text conditioners): attention with memory key/values,
talking heads, sparse top-k, position-infused (shortformer) sinusoidal
embeddings and attention-on-attention (``x_transformer.py:215-369``); the
``AttentionLayers`` composition engine with custom/sandwich/PAR layer
layouts, ScaleNorm/RMSNorm/ReZero, macaron FFs, GRU-gated residuals and
residual attention (``:370-538``); and ``TransformerWrapper`` with absolute
positional embeddings, memory ([cls]-style) tokens, tied output embeddings
and shortformer ``mems`` (``:548-641``).

Notes vs the reference:
  - ``rel_pos`` is surfaced as a constructor arg for API parity but, as in
    the reference (``x_transformer.py:409-410`` hard-codes ``self.rel_pos =
    None``), no relative-position bias is ever applied.
  - Dropout layers are deterministic (inference/eval semantics) — the
    reference only uses this stack frozen, as a conditioning encoder.
  - Everything is static-shape / trace-friendly: layer layout is resolved
    at construction, masks are boolean arrays, the scan is over layers of
    identical shape only when layouts allow; otherwise a Python loop
    unrolls (depth is small for every shipped use).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from encdiff_tpu.nn.layers import Dtype, TorchDense

DEFAULT_DIM_HEAD = 64
_NEG = -0.7 * 3.4028235e38  # max_neg_value semantics for fp32 logits


def _fixed_pos_emb(dim: int, n: int, offset: int = 0) -> jnp.ndarray:
    """Shortformer sinusoidal embedding (FixedPositionalEmbedding:39-52)."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32)
                                / dim))
    t = jnp.arange(n, dtype=jnp.float32) + offset
    s = jnp.einsum("i,j->ij", t, inv_freq)
    return jnp.concatenate([jnp.sin(s), jnp.cos(s)], axis=-1)[None]


class ScaleNorm(nn.Module):
    """L2 scale norm with a single learned gain (ScaleNorm:139-148)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1,))
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True) * (
            x.shape[-1] ** -0.5)
        return x / jnp.maximum(norm, self.eps) * g


class RMSNorm(nn.Module):
    """RMS norm with per-dim gain (RMSNorm:151-160)."""

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (x.shape[-1],))
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True) * (
            x.shape[-1] ** -0.5)
        return x / jnp.maximum(norm, self.eps) * g


class GRUGating(nn.Module):
    """GRU-cell gated residual (GRUGating:168-181): out = GRU(x, residual)
    applied position-wise with torch GRUCell gate semantics."""

    dim: int

    @nn.compact
    def __call__(self, x, residual):
        shape = x.shape
        xf = x.reshape(-1, self.dim)
        hf = residual.reshape(-1, self.dim)
        # torch.nn.GRUCell: r = σ(W_ir x + b_ir + W_hr h + b_hr), same for z;
        # n = tanh(W_in x + b_in + r*(W_hn h + b_hn)); h' = (1-z)*n + z*h
        ih = TorchDense(3 * self.dim, name="ih")(xf)
        hh = TorchDense(3 * self.dim, name="hh")(hf)
        i_r, i_z, i_n = jnp.split(ih, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(hh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return ((1.0 - z) * n + z * hf).reshape(shape)


class GEGLU(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        x, gate = jnp.split(TorchDense(self.dim_out * 2, name="proj")(x),
                            2, axis=-1)
        return x * jax.nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """(FeedForward:194-211); ``glu`` selects GEGLU project-in."""

    dim: int
    dim_out: Optional[int] = None
    mult: int = 4
    glu: bool = False

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        if self.glu:
            h = GEGLU(inner, name="geglu")(x)
        else:
            h = jax.nn.gelu(TorchDense(inner, name="proj_in")(x),
                            approximate=False)
        return TorchDense(self.dim_out or self.dim, name="proj_out")(h)


class Attention(nn.Module):
    """(Attention:215-369). Returns (out, pre_softmax_attn,
    post_softmax_attn)."""

    dim: int
    dim_head: int = DEFAULT_DIM_HEAD
    heads: int = 8
    causal: bool = False
    talking_heads: bool = False
    sparse_topk: Optional[int] = None
    num_mem_kv: int = 0
    on_attn: bool = False

    @nn.compact
    def __call__(self, x, context=None, mask=None, context_mask=None,
                 sinusoidal_emb: bool = False, prev_attn=None, mem=None,
                 offset: int = 0):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        b, n = x.shape[0], x.shape[1]
        kv_input = context if context is not None else x
        q_input, k_input, v_input = x, kv_input, kv_input

        if mem is not None:
            k_input = jnp.concatenate([mem, k_input], axis=-2)
            v_input = jnp.concatenate([mem, v_input], axis=-2)
        if sinusoidal_emb:
            off = k_input.shape[-2] - q_input.shape[-2] + offset
            q_input = q_input + _fixed_pos_emb(self.dim, q_input.shape[1],
                                               off)
            k_input = k_input + _fixed_pos_emb(self.dim, k_input.shape[1],
                                               offset)

        q = TorchDense(inner, use_bias=False, name="to_q")(q_input)
        k = TorchDense(inner, use_bias=False, name="to_k")(k_input)
        v = TorchDense(inner, use_bias=False, name="to_v")(v_input)
        q, k, v = (t.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
                   for t in (q, k, v))

        input_mask = None
        if mask is not None or context_mask is not None:
            q_mask = mask if mask is not None else jnp.ones((b, n), bool)
            k_mask = q_mask if context is None else context_mask
            if k_mask is None:
                k_mask = jnp.ones((b, k.shape[-2]), bool)
            input_mask = q_mask[:, None, :, None] & k_mask[:, None, None, :]

        if self.num_mem_kv > 0:
            mem_k = self.param("mem_k", nn.initializers.normal(1.0),
                               (h, self.num_mem_kv, dh))
            mem_v = self.param("mem_v", nn.initializers.normal(1.0),
                               (h, self.num_mem_kv, dh))
            k = jnp.concatenate([jnp.broadcast_to(mem_k, (b,) + mem_k.shape),
                                 k], axis=-2)
            v = jnp.concatenate([jnp.broadcast_to(mem_v, (b,) + mem_v.shape),
                                 v], axis=-2)
            if input_mask is not None:
                input_mask = jnp.pad(
                    input_mask, ((0, 0), (0, 0), (0, 0),
                                 (self.num_mem_kv, 0)), constant_values=True)

        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * (dh ** -0.5)
        if prev_attn is not None:
            dots = dots + prev_attn
        pre_softmax_attn = dots

        if self.talking_heads:
            pre_proj = self.param("pre_softmax_proj",
                                  nn.initializers.normal(1.0), (h, h))
            dots = jnp.einsum("bhij,hk->bkij", dots, pre_proj)

        if input_mask is not None:
            dots = jnp.where(input_mask, dots, _NEG)
        if self.causal:
            i, j = dots.shape[-2:]
            r_i = jnp.arange(i)[:, None]
            r_j = jnp.arange(j)[None, :]
            causal_mask = r_i < (r_j - (j - i))
            dots = jnp.where(causal_mask[None, None], _NEG, dots)
        if self.sparse_topk is not None and self.sparse_topk < dots.shape[-1]:
            top = jax.lax.top_k(dots, self.sparse_topk)[0]
            vk = top[..., -1:]
            dots = jnp.where(dots < vk, _NEG, dots)

        attn = jax.nn.softmax(dots, axis=-1)
        post_softmax_attn = attn
        if self.talking_heads:
            post_proj = self.param("post_softmax_proj",
                                   nn.initializers.normal(1.0), (h, h))
            attn = jnp.einsum("bhij,hk->bkij", attn, post_proj)

        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, inner)
        if self.on_attn:
            o = TorchDense(self.dim * 2, name="to_out")(out)
            a, g = jnp.split(o, 2, axis=-1)
            out = a * jax.nn.sigmoid(g)  # nn.GLU
        else:
            out = TorchDense(self.dim, name="to_out")(out)
        return out, pre_softmax_attn, post_softmax_attn


def _resolve_layer_types(depth, cross_attend, only_cross, macaron,
                         custom_layers, par_ratio, sandwich_coef):
    """Layer-layout resolution (AttentionLayers:424-452)."""
    if cross_attend and not only_cross:
        default_block = ("a", "c", "f")
    elif cross_attend and only_cross:
        default_block = ("c", "f")
    else:
        default_block = ("a", "f")
    if macaron:
        default_block = ("f",) + default_block

    if custom_layers is not None:
        return tuple(custom_layers)
    if par_ratio is not None:
        par_depth = depth * len(default_block)
        assert 1 < par_ratio <= par_depth, "par ratio out of range"
        default_block = tuple(t for t in default_block if t != "f")
        par_attn = par_depth // par_ratio
        depth_cut = par_depth * 2 // 3
        par_width = (depth_cut + depth_cut // par_attn) // par_attn
        assert len(default_block) <= par_width, \
            "default block is too large for par_ratio"
        par_block = default_block + ("f",) * (par_width -
                                              len(default_block))
        par_head = par_block * par_attn
        return tuple(par_head) + ("f",) * (par_depth - len(par_head))
    if sandwich_coef is not None:
        assert 0 < sandwich_coef <= depth, \
            "sandwich coefficient should be less than the depth"
        sc = int(sandwich_coef)
        return (("a",) * sc + default_block * (depth - sc) + ("f",) * sc)
    return default_block * depth


class AttentionLayers(nn.Module):
    """(AttentionLayers:370-538)."""

    dim: int
    depth: int
    heads: int = 8
    causal: bool = False
    cross_attend: bool = False
    only_cross: bool = False
    use_scalenorm: bool = False
    use_rmsnorm: bool = False
    use_rezero: bool = False
    position_infused_attn: bool = False
    custom_layers: Optional[Sequence[str]] = None
    sandwich_coef: Optional[int] = None
    par_ratio: Optional[int] = None
    residual_attn: bool = False
    cross_residual_attn: bool = False
    macaron: bool = False
    pre_norm: bool = True
    gate_residual: bool = False
    attn_dim_head: int = DEFAULT_DIM_HEAD
    attn_talking_heads: bool = False
    attn_sparse_topk: Optional[int] = None
    attn_num_mem_kv: int = 0
    attn_on_attn: bool = False
    ff_mult: int = 4
    ff_glu: bool = False

    @property
    def has_pos_emb(self) -> bool:
        return self.position_infused_attn

    @property
    def layer_types(self) -> Tuple[str, ...]:
        return _resolve_layer_types(
            self.depth, self.cross_attend, self.only_cross, self.macaron,
            self.custom_layers, self.par_ratio, self.sandwich_coef)

    @nn.compact
    def __call__(self, x, context=None, mask=None, context_mask=None,
                 mems=None, return_hiddens: bool = False):
        types = self.layer_types
        num_attn = sum(1 for t in types if t == "a")
        mems = list(mems) if mems is not None else [None] * num_attn

        hiddens, intermediates = [], []
        prev_attn = prev_cross_attn = None

        def norm(i, y):
            if self.use_rezero:
                return y  # Identity (AttentionLayers:420)
            if self.use_rmsnorm:
                return RMSNorm(name=f"norm_{i}")(y)
            if self.use_scalenorm:
                return ScaleNorm(name=f"norm_{i}")(y)
            ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name=f"norm_{i}")
            return ln(y).astype(y.dtype)

        attn_idx = 0
        for i, lt in enumerate(types):
            is_last = i == len(types) - 1
            layer_mem = None
            if lt == "a":
                hiddens.append(x)
                layer_mem = mems[attn_idx] if attn_idx < len(mems) else None
                attn_idx += 1
            residual = x
            if self.pre_norm:
                x = norm(i, x)

            inter = None
            if lt == "a":
                out, pre_sm, post_sm = Attention(
                    dim=self.dim, dim_head=self.attn_dim_head,
                    heads=self.heads, causal=self.causal,
                    talking_heads=self.attn_talking_heads,
                    sparse_topk=self.attn_sparse_topk,
                    num_mem_kv=self.attn_num_mem_kv,
                    on_attn=self.attn_on_attn, name=f"attn_{i}")(
                        x, mask=mask,
                        sinusoidal_emb=self.position_infused_attn,
                        prev_attn=prev_attn, mem=layer_mem)
                inter = (pre_sm, post_sm)
            elif lt == "c":
                out, pre_sm, post_sm = Attention(
                    dim=self.dim, dim_head=self.attn_dim_head,
                    heads=self.heads,
                    talking_heads=self.attn_talking_heads,
                    sparse_topk=self.attn_sparse_topk,
                    num_mem_kv=self.attn_num_mem_kv,
                    on_attn=self.attn_on_attn, name=f"cross_{i}")(
                        x, context=context, mask=mask,
                        context_mask=context_mask,
                        prev_attn=prev_cross_attn)
                inter = (pre_sm, post_sm)
            else:
                out = FeedForward(dim=self.dim, mult=self.ff_mult,
                                  glu=self.ff_glu, name=f"ff_{i}")(x)
                if self.macaron:
                    out = out * 0.5  # Scale(0.5, ff) (AttentionLayers:463)

            if self.use_rezero and lt in ("a", "c"):
                g = self.param(f"rezero_g_{i}", nn.initializers.zeros, (1,))
                out = out * g

            if self.gate_residual:
                x = GRUGating(self.dim, name=f"gru_{i}")(out, residual)
            else:
                x = out + residual

            if inter is not None:
                intermediates.append(inter)
            if lt == "a" and self.residual_attn:
                prev_attn = inter[0]
            elif lt == "c" and self.cross_residual_attn:
                prev_cross_attn = inter[0]

            if not self.pre_norm and not is_last:
                x = norm(i, x)

        if return_hiddens:
            return x, (hiddens, intermediates)
        return x


class Encoder(AttentionLayers):
    """Non-causal AttentionLayers (Encoder:541-545)."""

    def __post_init__(self):
        assert not self.causal, "cannot set causality on encoder"
        super().__post_init__()


class TransformerWrapper(nn.Module):
    """(TransformerWrapper:548-641). ``attn_layers_config`` holds the
    Encoder kwargs (flax modules are frozen dataclasses, so the wrapper
    constructs its own AttentionLayers from a config dict rather than
    receiving a live submodule)."""

    num_tokens: int
    max_seq_len: int
    attn_layers_config: Any = None
    emb_dim: Optional[int] = None
    max_mem_len: int = 0
    num_memory_tokens: int = 0
    tie_embedding: bool = False
    use_pos_emb: bool = True

    @nn.compact
    def __call__(self, x, return_embeddings: bool = False, mask=None,
                 return_mems: bool = False, return_attn: bool = False,
                 mems=None, **kwargs):
        cfg = dict(self.attn_layers_config or {})
        dim = cfg.get("dim")
        emb_dim = self.emb_dim or dim
        b = x.shape[0]

        token_emb = nn.Embed(
            self.num_tokens, emb_dim,
            embedding_init=nn.initializers.normal(0.02), name="token_emb")
        x = token_emb(x)
        attn_layers = AttentionLayers(name="attn_layers", **cfg)
        if self.use_pos_emb and not attn_layers.has_pos_emb:
            pos = self.param("pos_emb", nn.initializers.normal(0.02),
                             (self.max_seq_len, emb_dim))
            x = x + pos[None, :x.shape[1]]
        if emb_dim != dim:
            x = TorchDense(dim, name="project_emb")(x)

        num_mem = self.num_memory_tokens
        if num_mem > 0:
            mem_tok = self.param("memory_tokens",
                                 nn.initializers.normal(1.0),
                                 (num_mem, dim))
            x = jnp.concatenate(
                [jnp.broadcast_to(mem_tok, (b,) + mem_tok.shape), x], axis=1)
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (num_mem, 0)),
                               constant_values=True)

        x, (hiddens, inters) = attn_layers(x, mask=mask, mems=mems,
                                           return_hiddens=True, **kwargs)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)

        mem_out, x = x[:, :num_mem], x[:, num_mem:]

        if return_embeddings:
            out = x
        elif self.tie_embedding:
            out = x @ token_emb.embedding.T
        else:
            out = TorchDense(self.num_tokens, name="to_logits")(x)

        if return_mems:
            new_mems = ([jnp.concatenate(pair, axis=-2)
                         for pair in zip(mems, hiddens)]
                        if mems is not None else hiddens)
            new_mems = [jax.lax.stop_gradient(t[..., -self.max_mem_len:, :])
                        for t in new_mems]
            return out, new_mems
        if return_attn:
            return out, [post for (_, post) in inters]
        return out
