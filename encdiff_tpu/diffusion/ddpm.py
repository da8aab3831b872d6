"""Pure DDPM math: forward noising, posteriors, ancestral sampling, losses.

TPU-native rebuild of the diffusion process core of
``ldm/models/diffusion/ddpm_enc.py`` (q_sample:292, q_posterior,
p_mean_variance, p_sample_loop:270-289, p_losses/get_loss:305-330,1183-1213).
All functions are pure and jittable; per-timestep coefficients are gathers
into host-built ``DiffusionSchedule`` tables (compile-time constants), and
the ancestral sampling loop is a single ``lax.scan`` instead of a Python
loop over 1000 steps.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from encdiff_tpu.core.schedules import DiffusionSchedule


def extract(table, t, ndim: int):
    """Gather per-sample coefficients and broadcast to an ndim tensor
    (parity with ``extract_into_tensor``, util.py:106-109)."""
    out = jnp.asarray(table)[t]
    return out.reshape(out.shape[0], *([1] * (ndim - 1)))


def q_sample(sched: DiffusionSchedule, x_start, t, noise):
    """x_t = sqrt(ᾱ_t) x_0 + sqrt(1-ᾱ_t) ε  (ddpm_enc.py:292-295)."""
    nd = x_start.ndim
    return (extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
            + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise)


def q_mean_variance(sched: DiffusionSchedule, x_start, t):
    nd = x_start.ndim
    mean = extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
    variance = extract(1.0 - sched.alphas_cumprod, t, nd)
    log_variance = extract(sched.log_one_minus_alphas_cumprod, t, nd)
    return mean, variance, log_variance


def predict_start_from_noise(sched: DiffusionSchedule, x_t, t, noise):
    nd = x_t.ndim
    return (extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * noise)


def predict_eps_from_xstart(sched: DiffusionSchedule, x_t, t, pred_xstart):
    nd = x_t.ndim
    return (extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - pred_xstart) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


def q_posterior(sched: DiffusionSchedule, x_start, x_t, t):
    """q(x_{t-1} | x_t, x_0) moments."""
    nd = x_t.ndim
    mean = (extract(sched.posterior_mean_coef1, t, nd) * x_start
            + extract(sched.posterior_mean_coef2, t, nd) * x_t)
    var = extract(sched.posterior_variance, t, nd)
    log_var = extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, var, log_var


def p_mean_variance(sched: DiffusionSchedule, model_out, x, t,
                    parameterization: str = "eps", clip_denoised: bool = True):
    if parameterization == "eps":
        x_recon = predict_start_from_noise(sched, x, t, noise=model_out)
    elif parameterization == "x0":
        x_recon = model_out
    else:
        raise NotImplementedError(parameterization)
    if clip_denoised:
        x_recon = jnp.clip(x_recon, -1.0, 1.0)
    return q_posterior(sched, x_recon, x, t)


def p_sample_loop(
    sched: DiffusionSchedule,
    denoise_fn: Callable,  # (x, t_batch) -> model_out
    shape,
    rng,
    parameterization: str = "eps",
    clip_denoised: bool = True,
    log_every_t: int | None = None,
):
    """Full ancestral DDPM sampling as one lax.scan (ddpm_enc.py:247-289).

    Returns final sample; if ``log_every_t`` is set, also a stacked array of
    intermediates gathered at fixed stride (static shapes — no dynamic
    appends).
    """
    rng, init_rng = jax.random.split(rng)
    img0 = jax.random.normal(init_rng, shape, jnp.float32)
    b = shape[0]
    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)

    def step(carry, t):
        img, rng = carry
        rng, nrng = jax.random.split(rng)
        t_b = jnp.full((b,), t, jnp.int32)
        model_out = denoise_fn(img, t_b)
        mean, _, log_var = p_mean_variance(
            sched, model_out, img, t_b, parameterization, clip_denoised)
        noise = jax.random.normal(nrng, shape, jnp.float32)
        nonzero = (t > 0).astype(jnp.float32)
        img = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        return (img, rng), img if log_every_t else None

    (img, _), inter = jax.lax.scan(step, (img0, rng), ts)
    if log_every_t:
        idx = jnp.arange(0, sched.num_timesteps, log_every_t)
        return img, inter[idx]
    return img


def simple_loss(pred, target, loss_type: str = "l1"):
    """Per-sample loss averaged over non-batch dims (ddpm_enc.py:305-330)."""
    if loss_type == "l1":
        loss = jnp.abs(target - pred)
    elif loss_type == "l2":
        loss = (target - pred) ** 2
    else:
        raise NotImplementedError(f"unknown loss type '{loss_type}'")
    return loss.reshape(loss.shape[0], -1).mean(axis=1)


def ddpm_losses(
    sched: DiffusionSchedule,
    apply_fn: Callable,  # (x_noisy, t) -> model_out
    x_start,
    t,
    noise,
    logvar,                       # (T,) table
    loss_type: str = "l1",
    parameterization: str = "eps",
    l_simple_weight: float = 1.0,
    original_elbo_weight: float = 0.0,
    prefix: str = "train",
):
    """ε-prediction loss with logvar weighting + vlb term
    (ddpm_enc.py:1183-1213). Returns (loss, loss_dict)."""
    x_noisy = q_sample(sched, x_start, t, noise)
    model_output = apply_fn(x_noisy, t)
    target = noise if parameterization == "eps" else x_start

    loss_simple = simple_loss(model_output.astype(jnp.float32),
                              target.astype(jnp.float32), loss_type)
    logvar_t = jnp.asarray(logvar)[t]
    loss = loss_simple / jnp.exp(logvar_t) + logvar_t
    loss = l_simple_weight * loss.mean()

    loss_vlb = (jnp.asarray(sched.lvlb_weights)[t] * loss_simple).mean()
    loss = loss + original_elbo_weight * loss_vlb

    loss_dict = {
        f"{prefix}/loss_simple": loss_simple.mean(),
        f"{prefix}/loss_vlb": loss_vlb,
        f"{prefix}/loss": loss,
    }
    return loss, loss_dict
