"""VQ-VAE / KL-VAE training losses: PatchGAN discriminator + LPIPS + adaptive
GAN weight.

Rebuild of ``ldm/modules/losses/vqperceptual.py`` (VQLPIPSWithDiscriminator:
43-168) and ``contperceptual.py`` (LPIPSWithDiscriminator:7-110), plus the
taming ``NLayerDiscriminator`` they instantiate. The torch classes hide two
backward passes inside ``calculate_adaptive_weight`` (autograd.grad of nll
and g_loss wrt the decoder's last conv weight, ``vqperceptual.py:86-94``);
here the decoder sows its pre-conv_out activation, so both gradients are a
single 3x3-conv VJP each — no second full backward.

Functional call convention (used by ``encdiff_tpu.train.vq_trainer``):
``loss_obj.generator_loss(...)`` / ``loss_obj.discriminator_loss(...)``
replace torch's ``optimizer_idx`` dispatch; the two-optimizer alternation
lives in the jitted train step with explicit ``stop_gradient`` routing.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from encdiff_tpu.losses.lpips import LPIPS
from encdiff_tpu.nn.layers import Dtype, TorchConv


class NLayerDiscriminator(nn.Module):
    """PatchGAN (taming NLayerDiscriminator parity): 4x4 convs, stride-2
    pyramid, BatchNorm (no actnorm support — reference configs use
    use_actnorm=False), LeakyReLU(0.2)."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        h = TorchConv(self.ndf, 4, stride=2, padding=1, dtype=self.dtype,
                      name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers + 1):
            nf_mult = min(2 ** n, 8)
            stride = 2 if n < self.n_layers else 1
            h = TorchConv(self.ndf * nf_mult, 4, stride=stride, padding=1,
                          use_bias=False, dtype=self.dtype,
                          name=f"conv{n}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=jnp.float32, name=f"bn{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        return TorchConv(1, 4, stride=1, padding=1, dtype=self.dtype,
                         name="conv_out")(h)


def hinge_d_loss(logits_real, logits_fake):
    loss_real = jnp.mean(nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def adopt_weight(weight, global_step, threshold=0, value=0.0):
    """Zero out the GAN term before ``disc_start`` (vqperceptual.py:21-24);
    jittable on a traced global_step."""
    return jnp.where(jnp.asarray(global_step) < threshold, value, weight)


def measure_perplexity(indices, n_embed):
    """Codebook usage perplexity (vqperceptual.py:27-33)."""
    onehot = jax.nn.one_hot(indices.reshape(-1), n_embed)
    avg_probs = onehot.mean(axis=0)
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
    cluster_use = jnp.sum(avg_probs > 0)
    return perplexity, cluster_use


def adaptive_gan_weight(nll_loss_fn, g_loss_fn, conv_out_params,
                        discriminator_weight=1.0, eps=1e-4):
    """d_weight = ||d nll/d w_last|| / (||d g/d w_last|| + eps), clamped to
    [0, 1e4] (vqperceptual.py:86-94). ``*_fn`` map the conv_out params to the
    scalar losses (closing over the sown pre-conv_out activation)."""
    nll_grads = jax.grad(nll_loss_fn)(conv_out_params)
    g_grads = jax.grad(g_loss_fn)(conv_out_params)

    def _kernel_norm(tree):
        # torch uses only the conv weight (not bias): pick the kernel leaves
        leaves = [v for p, v in
                  jax.tree_util.tree_flatten_with_path(tree)[0]
                  if any(getattr(k, "key", "") == "kernel" for k in p)]
        return jnp.sqrt(sum(jnp.sum(l**2) for l in leaves))

    num = _kernel_norm(nll_grads)
    den = _kernel_norm(g_grads) + eps
    d_weight = jnp.clip(num / den, 0.0, 1e4)
    return jax.lax.stop_gradient(d_weight) * discriminator_weight


class VQLPIPSWithDiscriminator:
    """Constructor parity with vqperceptual.py:43-84; functional methods."""

    def __init__(self, disc_start, codebook_weight=1.0, pixelloss_weight=1.0,
                 disc_num_layers=3, disc_in_channels=3, disc_factor=1.0,
                 disc_weight=1.0, perceptual_weight=1.0, use_actnorm=False,
                 disc_conditional=False, disc_ndf=64, disc_loss="hinge",
                 n_classes=None, perceptual_loss="lpips", pixel_loss="l1",
                 dtype=jnp.float32):
        assert disc_loss in ("hinge", "vanilla")
        assert not use_actnorm, "actnorm discriminator not supported"
        assert perceptual_loss == "lpips"
        assert pixel_loss in ("l1", "l2")
        self.codebook_weight = codebook_weight
        self.pixel_weight = pixelloss_weight
        self.perceptual_weight = perceptual_weight
        self.pixel_loss = pixel_loss
        self.discriminator = NLayerDiscriminator(
            input_nc=disc_in_channels, ndf=disc_ndf,
            n_layers=disc_num_layers, dtype=dtype)
        self.discriminator_iter_start = disc_start
        self.disc_loss = hinge_d_loss if disc_loss == "hinge" else vanilla_d_loss
        self.disc_factor = disc_factor
        self.discriminator_weight = disc_weight
        self.disc_conditional = disc_conditional
        self.n_classes = n_classes
        self.lpips = LPIPS(dtype=dtype) if perceptual_weight > 0 else None

    # --- parameter lifecycle -------------------------------------------------
    def init_variables(self, rng, image_size: int = 64):
        r1, r2 = jax.random.split(rng)
        x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        out = {"disc": self.discriminator.init(r1, x, train=False)}
        if self.lpips is not None:
            out["lpips"] = self.lpips.init_variables(r2, image_size)
        return out

    # --- pieces --------------------------------------------------------------
    def _rec_loss(self, loss_vars, x, xrec):
        if self.pixel_loss == "l1":
            rec = jnp.abs(x - xrec)
        else:
            rec = (x - xrec) ** 2
        if self.lpips is not None:
            # remat: the 13-conv VGG trunk's activations at (B,64,64,C) are
            # the dominant HBM cost of the generator step (bs=128 + the
            # 5.9 GB device-resident dataset OOMed a 16 GB v5e without
            # this); recompute them in the backward instead
            p = jax.checkpoint(
                lambda v, a, b: self.lpips(v, a, b))(
                    loss_vars["lpips"], x, xrec)  # (B,)
            rec = rec + self.perceptual_weight * p[:, None, None, None]
            p_mean = p.mean()
        else:
            p_mean = jnp.float32(0.0)
        return rec, p_mean

    def _disc_train_logits(self, dvars, x):
        """Discriminator forward with TRAIN-mode BatchNorm (batch
        statistics), running-stat updates discarded. Torch keeps the
        discriminator in train mode during the generator pass (Lightning
        module-wide .train(); taming uses plain BatchNorm2d), so the
        generator must see batch-stat normalization — scoring fakes
        against stale *running* stats lets the discriminator win
        trivially and sends the generator chasing unbounded magnitudes
        (observed: rec_loss 0.22 -> 31.7 over 7.5k steps)."""
        if "batch_stats" in dvars and dvars["batch_stats"]:
            logits, _ = self.discriminator.apply(dvars, x, train=True,
                                                 mutable=["batch_stats"])
            return logits
        return self.discriminator.apply(dvars, x, train=False)

    def generator_loss(self, loss_vars, disc_params, codebook_loss, x, xrec,
                       global_step, conv_out_params=None, pre_conv_out=None,
                       split="train", predicted_indices=None,
                       disc_batch_stats=None, conv_out_apply=None):
        """optimizer_idx==0 branch (vqperceptual.py:105-149).

        ``conv_out_apply(w, h) -> xrec`` + sown ``pre_conv_out`` enable the
        adaptive weight; if absent, d_weight falls back to
        ``discriminator_weight`` (the torch eval-mode RuntimeError path)."""
        rec, p_mean = self._rec_loss(loss_vars, x, xrec)
        nll_loss = rec.mean()

        dvars = {"params": disc_params}
        if disc_batch_stats is not None:
            dvars["batch_stats"] = disc_batch_stats
        logits_fake = self._disc_train_logits(dvars, xrec)
        g_loss = -jnp.mean(logits_fake)

        if conv_out_params is not None and pre_conv_out is not None:
            def nll_of_w(w):
                xr = conv_out_apply(w, pre_conv_out)
                r, _ = self._rec_loss(loss_vars, x, xr)
                return r.mean()

            def g_of_w(w):
                xr = conv_out_apply(w, pre_conv_out)
                return -jnp.mean(self._disc_train_logits(dvars, xr))

            d_weight = adaptive_gan_weight(
                nll_of_w, g_of_w, conv_out_params,
                discriminator_weight=self.discriminator_weight)
        else:
            d_weight = jnp.float32(self.discriminator_weight)

        disc_factor = adopt_weight(self.disc_factor, global_step,
                                   self.discriminator_iter_start)
        loss = (nll_loss + d_weight * disc_factor * g_loss
                + self.codebook_weight * jnp.mean(codebook_loss))
        log = {
            f"{split}/total_loss": loss,
            f"{split}/quant_loss": jnp.mean(codebook_loss),
            f"{split}/nll_loss": nll_loss,
            f"{split}/rec_loss": rec.mean(),
            f"{split}/p_loss": p_mean,
            f"{split}/d_weight": d_weight,
            f"{split}/disc_factor": disc_factor,
            f"{split}/g_loss": g_loss,
        }
        if predicted_indices is not None and self.n_classes is not None:
            perplexity, cluster_use = measure_perplexity(
                predicted_indices, self.n_classes)
            log[f"{split}/perplexity"] = perplexity
            log[f"{split}/cluster_usage"] = cluster_use
        return loss, log

    def discriminator_loss(self, disc_params, x, xrec, global_step,
                           split="train", disc_batch_stats=None, train=True):
        """optimizer_idx==1 branch (vqperceptual.py:151-168)."""
        dvars = {"params": disc_params}
        if disc_batch_stats is not None:
            dvars["batch_stats"] = disc_batch_stats
        x = jax.lax.stop_gradient(x)
        xrec = jax.lax.stop_gradient(xrec)
        if train and disc_batch_stats is not None:
            logits_real, mut = self.discriminator.apply(
                dvars, x, train=True, mutable=["batch_stats"])
            dvars2 = {"params": disc_params, "batch_stats": mut["batch_stats"]}
            logits_fake, mut = self.discriminator.apply(
                dvars2, xrec, train=True, mutable=["batch_stats"])
            new_stats = mut["batch_stats"]
        else:
            logits_real = self.discriminator.apply(dvars, x, train=False)
            logits_fake = self.discriminator.apply(dvars, xrec, train=False)
            new_stats = disc_batch_stats
        disc_factor = adopt_weight(self.disc_factor, global_step,
                                   self.discriminator_iter_start)
        d_loss = disc_factor * self.disc_loss(logits_real, logits_fake)
        log = {
            f"{split}/disc_loss": d_loss,
            f"{split}/logits_real": jnp.mean(logits_real),
            f"{split}/logits_fake": jnp.mean(logits_fake),
        }
        return d_loss, log, new_stats


class LPIPSWithDiscriminator(VQLPIPSWithDiscriminator):
    """KL-VAE variant (contperceptual.py:7-110): rec + logvar-weighted nll +
    KL term instead of codebook loss."""

    def __init__(self, disc_start, logvar_init=0.0, kl_weight=1.0,
                 pixelloss_weight=1.0, disc_num_layers=3, disc_in_channels=3,
                 disc_factor=1.0, disc_weight=1.0, perceptual_weight=1.0,
                 use_actnorm=False, disc_conditional=False, disc_loss="hinge",
                 dtype=jnp.float32):
        super().__init__(
            disc_start=disc_start, codebook_weight=0.0,
            pixelloss_weight=pixelloss_weight, disc_num_layers=disc_num_layers,
            disc_in_channels=disc_in_channels, disc_factor=disc_factor,
            disc_weight=disc_weight, perceptual_weight=perceptual_weight,
            use_actnorm=use_actnorm, disc_conditional=disc_conditional,
            disc_loss=disc_loss, pixel_loss="l1", dtype=dtype)
        self.kl_weight = kl_weight
        self.logvar_init = logvar_init

    def generator_loss_kl(self, loss_vars, disc_params, x, xrec, posterior,
                          logvar, global_step, conv_out_params=None,
                          pre_conv_out=None, split="train",
                          disc_batch_stats=None, conv_out_apply=None):
        rec, p_mean = self._rec_loss(loss_vars, x, xrec)
        nll = rec / jnp.exp(logvar) + logvar
        nll_loss = jnp.sum(nll) / nll.shape[0]
        kl_loss = jnp.sum(posterior.kl()) / x.shape[0]

        dvars = {"params": disc_params}
        if disc_batch_stats is not None:
            dvars["batch_stats"] = disc_batch_stats
        logits_fake = self._disc_train_logits(dvars, xrec)
        g_loss = -jnp.mean(logits_fake)

        if conv_out_params is not None and pre_conv_out is not None:
            def nll_of_w(w):
                xr = conv_out_apply(w, pre_conv_out)
                r, _ = self._rec_loss(loss_vars, x, xr)
                n = r / jnp.exp(logvar) + logvar
                return jnp.sum(n) / n.shape[0]

            def g_of_w(w):
                xr = conv_out_apply(w, pre_conv_out)
                return -jnp.mean(self._disc_train_logits(dvars, xr))

            d_weight = adaptive_gan_weight(
                nll_of_w, g_of_w, conv_out_params,
                discriminator_weight=self.discriminator_weight)
        else:
            d_weight = jnp.float32(self.discriminator_weight)

        disc_factor = adopt_weight(self.disc_factor, global_step,
                                   self.discriminator_iter_start)
        loss = (nll_loss + self.kl_weight * kl_loss
                + d_weight * disc_factor * g_loss)
        log = {
            f"{split}/total_loss": loss,
            f"{split}/kl_loss": kl_loss,
            f"{split}/nll_loss": nll_loss,
            f"{split}/rec_loss": rec.mean(),
            f"{split}/p_loss": p_mean,
            f"{split}/d_weight": d_weight,
            f"{split}/disc_factor": disc_factor,
            f"{split}/g_loss": g_loss,
        }
        return loss, log
