"""CLIP text/vision towers in flax + OpenAI-checkpoint ingestion.

Backs the reference's legacy conditioning embedders
(``ldm/modules/encoders/modules.py:137-202`` FrozenCLIPTextEmbedder /
FrozenClipImageEmbedder, which call ``clip.load``): the full ViT-style
architecture (pre-LN transformer, QuickGELU MLP, causal text mask, EOT
pooling, class-token vision pooling, projection heads) is implemented
here so the embedders are functional; pretrained weights are ingested
from an OpenAI ``clip`` state_dict via ``load_torch_clip`` when the user
supplies one (zero-egress build — none are bundled; random init is
documented as uncalibrated).

The real CLIP BPE tokenizer needs the bundled vocab file; absent that,
``hash_tokenize`` provides a deterministic stand-in (NOT CLIP-BPE —
fine for shape/flow tests, meaningless against pretrained weights; pass
pre-tokenized int arrays for real use).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


@dataclass(frozen=True)
class CLIPConfig:
    """Architecture hyperparameters; defaults = ViT-L/14 (the reference's
    default ``version='ViT-L/14'``)."""

    embed_dim: int = 768
    # text tower
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 768
    text_heads: int = 12
    text_layers: int = 12
    # vision tower
    image_resolution: int = 224
    patch_size: int = 14
    vision_width: int = 1024
    vision_heads: int = 16
    vision_layers: int = 24


PRESETS = {
    "ViT-L/14": CLIPConfig(),
    "ViT-B/32": CLIPConfig(embed_dim=512, text_width=512, text_heads=8,
                           vision_width=768, vision_heads=12,
                           vision_layers=12, patch_size=32),
    "ViT-B/16": CLIPConfig(embed_dim=512, text_width=512, text_heads=8,
                           vision_width=768, vision_heads=12,
                           vision_layers=12, patch_size=16),
}


def quick_gelu(x):
    """OpenAI CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN block: LN -> MHA -> +res; LN -> QuickGELU MLP (4x) -> +res."""

    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.width,
            out_features=self.width, dtype=self.dtype,
            name="attn")(h, h, mask=mask)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="c_proj")(h)
        return x + h


class Transformer(nn.Module):
    width: int
    heads: int
    layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       dtype=self.dtype,
                                       name=f"resblock_{i}")(x, mask)
        return x


class CLIPTextTower(nn.Module):
    """token embedding + positions -> causal transformer -> ln_final ->
    EOT-token feature @ text_projection."""

    cfg: CLIPConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        c = self.cfg
        tok_emb = self.param("token_embedding",
                             nn.initializers.normal(0.02),
                             (c.vocab_size, c.text_width))
        pos_emb = self.param("positional_embedding",
                             nn.initializers.normal(0.01),
                             (c.context_length, c.text_width))
        x = tok_emb[tokens] + pos_emb[None, :tokens.shape[1]]
        n = tokens.shape[1]
        causal = jnp.tril(jnp.ones((n, n), bool))[None, None]
        x = Transformer(c.text_width, c.text_heads, c.text_layers,
                        dtype=self.dtype, name="transformer")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        # pool at the EOT token = the highest token id per row (clip/model.py)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (c.text_width, c.embed_dim))
        return pooled @ proj


class CLIPVisionTower(nn.Module):
    """conv patch embed + class token -> transformer -> ln_post(class) @
    proj."""

    cfg: CLIPConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        c = self.cfg
        x = nn.Conv(c.vision_width, (c.patch_size, c.patch_size),
                    strides=c.patch_size, use_bias=False, dtype=self.dtype,
                    name="conv1")(images)               # (B, H', W', W)
        b = x.shape[0]
        x = x.reshape(b, -1, c.vision_width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.vision_width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (b, 1, c.vision_width)), x],
            axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (x.shape[1], c.vision_width))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x)
        x = Transformer(c.vision_width, c.vision_heads, c.vision_layers,
                        dtype=self.dtype, name="transformer")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (c.vision_width, c.embed_dim))
        return x @ proj


def hash_tokenize(texts, context_length=77, vocab_size=49408):
    """Deterministic stand-in tokenizer (NOT CLIP BPE): whitespace words
    hashed into the vocab range, with start/end markers like
    clip.tokenize. For real use pass pre-tokenized int arrays."""
    sot, eot = vocab_size - 2, vocab_size - 1
    out = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        ids = [sot] + [
            (hash(w) % (vocab_size - 3)) + 1
            for w in str(text).lower().split()][: context_length - 2] + [eot]
        out[i, :len(ids)] = ids
    return out


def _attn_inproj_split(w, b, width):
    """torch MultiheadAttention packs qkv as (3W, W) in_proj; flax MHA wants
    per-head (W, H, dh) kernels."""
    wq, wk, wv = np.split(w, 3, axis=0)
    bq, bk, bv = np.split(b, 3, axis=0)
    return (wq.T, bq), (wk.T, bk), (wv.T, bv)


def load_torch_clip(variables, state_dict, cfg: CLIPConfig):
    """Map an OpenAI ``clip`` model state_dict (key layout of
    clip/model.py: ``transformer.resblocks.N.*``, ``visual.*``) onto the
    flax param tree of CLIPTextTower/CLIPVisionTower."""

    def _np(t):
        return np.asarray(getattr(t, "detach", lambda: t)()).astype(
            np.float32)

    sd = {k: _np(v) for k, v in state_dict.items()}
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])

    def fill_block(dst, prefix, width, heads):
        dh = width // heads
        (wq, bq), (wk, bk), (wv, bv) = _attn_inproj_split(
            sd[f"{prefix}.attn.in_proj_weight"],
            sd[f"{prefix}.attn.in_proj_bias"], width)
        attn = dst["attn"]
        for name, (w, b_) in (("query", (wq, bq)), ("key", (wk, bk)),
                              ("value", (wv, bv))):
            attn[name]["kernel"] = jnp.asarray(
                w.reshape(width, heads, dh))
            attn[name]["bias"] = jnp.asarray(b_.reshape(heads, dh))
        attn["out"]["kernel"] = jnp.asarray(
            sd[f"{prefix}.attn.out_proj.weight"].T.reshape(heads, dh, width))
        attn["out"]["bias"] = jnp.asarray(sd[f"{prefix}.attn.out_proj.bias"])
        for flax_name, torch_name in (("ln_1", "ln_1"), ("ln_2", "ln_2")):
            dst[flax_name]["scale"] = jnp.asarray(
                sd[f"{prefix}.{torch_name}.weight"])
            dst[flax_name]["bias"] = jnp.asarray(
                sd[f"{prefix}.{torch_name}.bias"])
        dst["c_fc"]["kernel"] = jnp.asarray(sd[f"{prefix}.mlp.c_fc.weight"].T)
        dst["c_fc"]["bias"] = jnp.asarray(sd[f"{prefix}.mlp.c_fc.bias"])
        dst["c_proj"]["kernel"] = jnp.asarray(
            sd[f"{prefix}.mlp.c_proj.weight"].T)
        dst["c_proj"]["bias"] = jnp.asarray(sd[f"{prefix}.mlp.c_proj.bias"])

    if "text" in params:
        text = params["text"]
        text["token_embedding"] = jnp.asarray(sd["token_embedding.weight"])
        text["positional_embedding"] = jnp.asarray(sd["positional_embedding"])
        text["text_projection"] = jnp.asarray(sd["text_projection"])
        text["ln_final"]["scale"] = jnp.asarray(sd["ln_final.weight"])
        text["ln_final"]["bias"] = jnp.asarray(sd["ln_final.bias"])
        for i in range(cfg.text_layers):
            fill_block(text["transformer"][f"resblock_{i}"],
                       f"transformer.resblocks.{i}", cfg.text_width,
                       cfg.text_heads)
    if "vision" in params:
        vis = params["vision"]
        # torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)
        vis["conv1"]["kernel"] = jnp.asarray(
            sd["visual.conv1.weight"].transpose(2, 3, 1, 0))
        vis["class_embedding"] = jnp.asarray(sd["visual.class_embedding"])
        vis["positional_embedding"] = jnp.asarray(
            sd["visual.positional_embedding"])
        vis["proj"] = jnp.asarray(sd["visual.proj"])
        for flax_name, torch_name in (("ln_pre", "visual.ln_pre"),
                                      ("ln_post", "visual.ln_post")):
            vis[flax_name]["scale"] = jnp.asarray(sd[f"{torch_name}.weight"])
            vis[flax_name]["bias"] = jnp.asarray(sd[f"{torch_name}.bias"])
        for i in range(cfg.vision_layers):
            fill_block(vis["transformer"][f"resblock_{i}"],
                       f"visual.transformer.resblocks.{i}",
                       cfg.vision_width, cfg.vision_heads)
    return {"params": params}


class _CLIPModules(nn.Module):
    """Both towers under one param tree ({text: ..., vision: ...})."""

    cfg: CLIPConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.text = CLIPTextTower(self.cfg, dtype=self.dtype)
        self.vision = CLIPVisionTower(self.cfg, dtype=self.dtype)

    def __call__(self, tokens, images):
        return self.text(tokens), self.vision(images)

    def encode_text(self, tokens):
        return self.text(tokens)

    def encode_image(self, images):
        return self.vision(images)


_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIP:
    """Orchestrator: init / torch ingestion / pure text+image encode."""

    def __init__(self, version_or_cfg="ViT-L/14", dtype=jnp.float32):
        self.cfg = (version_or_cfg if isinstance(version_or_cfg, CLIPConfig)
                    else PRESETS[version_or_cfg])
        self.module = _CLIPModules(self.cfg, dtype=dtype)

    def init_variables(self, rng):
        c = self.cfg
        tokens = jnp.zeros((1, c.context_length), jnp.int32)
        images = jnp.zeros((1, c.image_resolution, c.image_resolution, 3),
                           jnp.float32)
        return self.module.init(rng, tokens, images)

    def load_torch(self, variables, state_dict):
        return load_torch_clip(variables, state_dict, self.cfg)

    def encode_text(self, variables, tokens):
        return self.module.apply(variables, tokens,
                                 method=_CLIPModules.encode_text)

    def encode_image(self, variables, images):
        """images: (B, H, W, 3) in [-1, 1] at any square resolution —
        resized bicubically + CLIP-normalized (modules.py:190-198)."""
        r = self.cfg.image_resolution
        if images.shape[1] != r or images.shape[2] != r:
            images = jax.image.resize(
                images, (images.shape[0], r, r, 3), method="bicubic")
        x = (images + 1.0) / 2.0
        x = (x - _CLIP_MEAN) / _CLIP_STD
        return self.module.apply(variables, x,
                                 method=_CLIPModules.encode_image)
