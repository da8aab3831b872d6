"""Legacy conditioning-encoder zoo (API-parity stubs + functional ports).

Rebuild of ``ldm/modules/encoders/modules.py:12-202`` — none of these are
referenced by shipped EncDiff configs (SURVEY.md C16 "skip"), but the
constructor surface is kept so foreign LDM configs instantiate:

- ``ClassEmbedder``: class-id -> embedding (functional flax port).
- ``TransformerEmbedder`` / ``BERTEmbedder``: lucidrains x_transformer
  token encoder, backed by the complete flax port of the stack
  (``encdiff_tpu/nn/x_transformer.py``: memory kv/tokens, talking heads,
  sparse top-k, ScaleNorm/RMSNorm/ReZero, GRU-gated residuals, macaron /
  sandwich / PAR layouts, shortformer position-infused attention).
- ``SpatialRescaler``: interpolate + optional 1x1 channel map.
- ``FrozenCLIPTextEmbedder`` / ``FrozenClipImageEmbedder``: require CLIP
  weights, unavailable in this image — constructors raise with a clear
  message (documented non-goal).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from encdiff_tpu.nn.layers import Dtype, TorchConv, TorchDense


class ClassEmbedder(nn.Module):
    """(modules.py:21-33): label id -> (B, 1, embed_dim) context."""

    embed_dim: int
    n_classes: int = 1000
    key: str = "class"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, batch, key=None):
        key = key or self.key
        c = batch[key] if isinstance(batch, dict) else batch
        c = jnp.asarray(c).reshape(-1)
        emb = nn.Embed(self.n_classes, self.embed_dim, dtype=self.dtype)(c)
        return emb[:, None, :]


class TransformerEmbedder(nn.Module):
    """Token ids -> contextual embeddings (modules.py:36-50): the full
    x_transformer ``TransformerWrapper(Encoder(dim, depth))`` stack
    (``encdiff_tpu/nn/x_transformer.py``), ``return_embeddings=True``."""

    n_embed: int
    n_layer: int
    vocab_size: int
    max_seq_len: int = 77
    heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        from encdiff_tpu.nn.x_transformer import TransformerWrapper

        return TransformerWrapper(
            num_tokens=self.vocab_size, max_seq_len=self.max_seq_len,
            attn_layers_config={"dim": self.n_embed, "depth": self.n_layer,
                                "heads": self.heads},
            name="transformer")(tokens, return_embeddings=True)

    def encode(self, tokens):
        return self(tokens)


class BERTEmbedder(TransformerEmbedder):
    """modules.py:80-103 — same stack; tokenization is the caller's concern
    (the reference's BERTTokenizer needs huggingface, absent here)."""


class SpatialRescaler(nn.Module):
    """Interpolate by factor^n_stages + optional channel remap
    (modules.py:106-135)."""

    n_stages: int = 1
    method: str = "bilinear"
    multiplier: float = 0.5
    in_channels: int = 3
    out_channels: int | None = None
    bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert self.method in ("nearest", "linear", "bilinear", "trilinear",
                               "bicubic", "area")
        method = {"area": "linear", "trilinear": "trilinear"}.get(
            self.method, self.method)
        for _ in range(self.n_stages):
            b, h, w, c = x.shape
            nh = max(1, int(h * self.multiplier))
            nw = max(1, int(w * self.multiplier))
            x = jax.image.resize(x, (b, nh, nw, c),
                                 method="nearest" if method == "nearest"
                                 else "bilinear")
        if self.out_channels is not None:
            x = TorchConv(self.out_channels, 1, use_bias=self.bias,
                          dtype=self.dtype)(x)
        return x

    def encode(self, x):
        return self(x)


class FrozenCLIPTextEmbedder:
    """CLIP text conditioning (modules.py:137-167). Functional flax CLIP
    (``encdiff_tpu.nn.clip``); weights ingested from an OpenAI ``clip``
    state_dict when supplied (``load_torch`` / ENCDIFF_CLIP_CKPT), random
    init otherwise (architecture-correct, uncalibrated)."""

    def __init__(self, version="ViT-L/14", device=None, max_length=77,
                 n_repeat=1, normalize=True, dtype=None):
        import jax.numpy as jnp

        from encdiff_tpu.nn.clip import CLIP

        del device
        self.clip = CLIP(version, dtype=dtype or jnp.float32)
        self.max_length = max_length
        self.n_repeat = n_repeat
        self.normalize = normalize

    def init_variables(self, rng):
        import os

        variables = self.clip.init_variables(rng)
        ckpt = os.environ.get("ENCDIFF_CLIP_CKPT")
        if ckpt:
            import torch

            sd = torch.load(ckpt, map_location="cpu")
            sd = sd.get("state_dict", sd)
            variables = self.clip.load_torch(variables, sd)
        return variables

    def _tokens(self, text):
        import numpy as np

        if isinstance(text, (list, tuple)) and text and isinstance(
                text[0], str):
            from encdiff_tpu.nn.clip import hash_tokenize

            return hash_tokenize(text, self.max_length,
                                 self.clip.cfg.vocab_size)
        return np.asarray(text)

    def __call__(self, variables, text):
        import jax.numpy as jnp

        z = self.clip.encode_text(variables, jnp.asarray(self._tokens(text)))
        if self.normalize:
            z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
        return z

    def encode(self, variables, text):
        """(B, n_repeat, D) — modules.py:162-167."""
        import jax.numpy as jnp

        z = self(variables, text)
        return jnp.repeat(z[:, None, :], self.n_repeat, axis=1)


class FrozenClipImageEmbedder:
    """CLIP image conditioning (modules.py:170-202): bicubic resize to the
    tower resolution + CLIP normalization + encode_image."""

    def __init__(self, model="ViT-L/14", jit=False, device=None,
                 antialias=False, dtype=None):
        import jax.numpy as jnp

        from encdiff_tpu.nn.clip import CLIP

        del jit, device, antialias
        self.clip = CLIP(model, dtype=dtype or jnp.float32)

    def init_variables(self, rng):
        return FrozenCLIPTextEmbedder.init_variables(self, rng)

    def __call__(self, variables, images):
        return self.clip.encode_image(variables, images)

    def encode(self, variables, images):
        return self(variables, images)
