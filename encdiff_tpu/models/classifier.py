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
        # h: (B, H, W, C) torso features; the eps-map path has C=3, so the
        # group count adapts (reference normalizes 4*model_channels mid
        # features where 32 always divides)
        b, _, _, c = h.shape
        groups = 32 if c % 32 == 0 else 1
        h = GroupNorm(groups, epsilon=1e-5, dtype=self.dtype)(h)
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

    @staticmethod
    def compute_top_k(logits, labels, k: int, reduction: str = "mean"):
        """top-k accuracy (classifier.py:151-157)."""
        _, idx = jax.lax.top_k(logits, k)
        hit = jnp.any(idx == labels[:, None], axis=-1).astype(jnp.float32)
        return hit.mean() if reduction == "mean" else hit

    def build_train_step(self, learning_rate: float | None = None):
        """Jitted classifier fine-tune step — the configure_optimizers /
        training_step pair (classifier.py:198-236): AdamW on the HEAD only
        (the diffusion torso stays frozen, matching the reference's
        load-then-probe usage), uniform random t per sample."""
        import optax

        tx = optax.adamw(learning_rate or 1e-4,
                         weight_decay=self.weight_decay)

        def init(rng, feature_shape):
            head_vars = self.init_variables(rng, feature_shape)
            return {"head": head_vars, "opt": tx.init(head_vars["params"])}

        @jax.jit
        def step(state, unet_vars, z, tokens, labels, rng):
            t_rng, n_rng = jax.random.split(rng)
            t = jax.random.randint(
                t_rng, (z.shape[0],), 0, self.diffusion.num_timesteps)

            def loss_fn(p):
                return self.loss({"params": p}, unet_vars, z, t, tokens,
                                 labels, n_rng)

            (_, log), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["head"]["params"])
            updates, opt = tx.update(grads, state["opt"],
                                     state["head"]["params"])
            params = optax.apply_updates(state["head"]["params"], updates)
            return {"head": {"params": params}, "opt": opt}, log

        return init, step

    def noise_level_accuracy(self, head_vars, unet_vars, z, tokens, labels,
                             rng, log_every_t: int | None = None):
        """acc@1 / acc@5 at fixed probe timesteps t in
        range(0, num_timesteps, log_every_t) — validation_step's
        noisy_acc sweep (classifier.py:203-217)."""
        from encdiff_tpu.diffusion import ddpm as ddpm_lib

        step_t = log_every_t or getattr(self.diffusion, "log_every_t", 200)
        out = {}
        for t_val in range(0, self.diffusion.num_timesteps, step_t):
            t = jnp.full((z.shape[0],), t_val, jnp.int32)
            noise = jax.random.normal(rng, z.shape, jnp.float32)
            z_noisy = ddpm_lib.q_sample(self.diffusion.schedule, z, t, noise)
            logits = self.logits(head_vars, unet_vars, z_noisy, t, tokens)
            out[t_val] = {
                "acc@1": float(self.compute_top_k(logits, labels, 1)),
                "acc@5": float(self.compute_top_k(
                    logits, labels, min(5, self.num_classes))),
            }
        return out
