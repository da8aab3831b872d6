"""Vector quantization with straight-through estimator.

Reimplementation of the external taming-transformers ``VectorQuantizer2``
the reference imports (``ldm/models/autoencoder.py:10-11,49-51``):
nearest-neighbour lookup in an (n_embed, embed_dim) codebook, commitment
β=0.25, straight-through gradients, perplexity reporting.

TPU-first: the distance argmin over the 2048x3 codebook is a single
(BHW, e) x (e, n) matmul (MXU) rather than a gather-heavy cdist, and the
quantized output is recovered with a one-hot matmul so the whole op fuses
cleanly under jit. Operates on NHWC latents directly — no permutes.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class VectorQuantizer(nn.Module):
    """z:(B,H,W,e) -> (z_q, codebook_loss, (perplexity, None, indices))."""

    n_embed: int
    embed_dim: int
    beta: float = 0.25
    legacy: bool = True  # taming default loss-term weighting
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        # codebook init parity with taming: U(-1/n, 1/n)
        embedding = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / self.n_embed, 1.0 / self.n_embed),
            (self.n_embed, self.embed_dim))

        z32 = z.astype(jnp.float32)
        flat = z32.reshape(-1, self.embed_dim)
        # ||z - e||^2 = ||z||^2 + ||e||^2 - 2 z.e  (argmin over codes);
        # HIGHEST precision so near-tie argmins are exact on every backend.
        dist = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(embedding**2, axis=1)[None, :]
            - 2.0 * jnp.matmul(flat, embedding.T,
                               precision=jax.lax.Precision.HIGHEST)
        )
        indices = jnp.argmin(dist, axis=1)
        z_q = jnp.take(embedding, indices, axis=0).reshape(z.shape)

        if self.legacy:
            loss = (self.beta * jnp.mean((jax.lax.stop_gradient(z_q) - z32) ** 2)
                    + jnp.mean((z_q - jax.lax.stop_gradient(z32)) ** 2))
        else:
            loss = (jnp.mean((jax.lax.stop_gradient(z_q) - z32) ** 2)
                    + self.beta * jnp.mean((z_q - jax.lax.stop_gradient(z32)) ** 2))

        # straight-through
        z_q = z32 + jax.lax.stop_gradient(z_q - z32)

        one_hot = jax.nn.one_hot(indices, self.n_embed, dtype=jnp.float32)
        avg_probs = jnp.mean(one_hot, axis=0)
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

        indices = indices.reshape(z.shape[:-1])
        return z_q.astype(z.dtype), loss, (perplexity, None, indices)

    def get_codebook_entry(self, indices, shape=None):
        """indices -> codebook vectors (taming API parity)."""
        embedding = self.get_variable("params", "embedding")
        z_q = embedding[indices]
        if shape is not None:
            z_q = z_q.reshape(shape)
        return z_q
