"""DDIM sampler and inversion as single ``lax.scan`` programs.

TPU-native rebuild of ``ldm/models/diffusion/ddim.py`` (DDIMSampler:11-207,
DDIMSamplerAttn inversion:429-482). The reference's Python loop with
per-step `torch.full` coefficient broadcasts becomes one scan over
precomputed (ᾱ_t, ᾱ_{t-1}, σ_t) tables from ``DDIMSchedule``; the 20-way
latent-swap generation folds the factor axis into the batch and calls this
sampler once (see ``encdiff_tpu.evalx.swap``), instead of looping 20 DDIM
runs (``ddpm_enc.py:1522-1535``).

Classifier-free guidance (uc_scale) follows ``ddim.py:174-181``; inpainting
mask blending follows ``ddim.py:141-144``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from encdiff_tpu.core.schedules import DDIMSchedule, DiffusionSchedule
from encdiff_tpu.diffusion.ddpm import q_sample


def ddim_sample(
    dsched: DDIMSchedule,
    denoise_fn: Callable,  # (x, t_batch) -> eps prediction
    shape,
    rng,
    x_T=None,
    temperature: float = 1.0,
    quantize_fn: Callable | None = None,
    mask=None,
    x0=None,
    sched: DiffusionSchedule | None = None,
    log_every: int | None = None,
):
    """Sample x_0 from noise via S DDIM steps (eps-parameterization).

    Returns (sample, intermediates|None). ``mask``/``x0`` implement inpaint
    blending (requires ``sched`` for q_sample); ``quantize_fn`` quantizes the
    predicted x0 each step (ddim.py:195-197).
    """
    b = shape[0]
    if x_T is None:
        rng, init_rng = jax.random.split(rng)
        img0 = jax.random.normal(init_rng, shape, jnp.float32)
    else:
        img0 = x_T

    S = dsched.num_steps
    # scan runs high-noise -> low-noise: reverse the ascending tables
    steps = jnp.asarray(dsched.timesteps)[::-1]
    a_t = jnp.asarray(dsched.alphas)[::-1]
    a_prev = jnp.asarray(dsched.alphas_prev)[::-1]
    sigma_t = jnp.asarray(dsched.sigmas)[::-1]
    sqrt_om_at = jnp.asarray(dsched.sqrt_one_minus_alphas)[::-1]

    def step(carry, inp):
        img, rng = carry
        t, at, aprev, sig, som = inp
        rng, nrng = jax.random.split(rng)
        t_b = jnp.full((b,), t, jnp.int32)

        if mask is not None:
            assert x0 is not None and sched is not None
            rng, qrng = jax.random.split(rng)
            img_orig = q_sample(sched, x0, t_b,
                                jax.random.normal(qrng, shape, jnp.float32))
            img = img_orig * mask + (1.0 - mask) * img

        e_t = denoise_fn(img, t_b).astype(jnp.float32)
        pred_x0 = (img - som * e_t) / jnp.sqrt(at)
        if quantize_fn is not None:
            pred_x0 = quantize_fn(pred_x0)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - aprev - sig**2, 0.0)) * e_t
        noise = sig * jax.random.normal(nrng, shape, jnp.float32) * temperature
        img = jnp.sqrt(aprev) * pred_x0 + dir_xt + noise
        return (img, rng), (img, pred_x0) if log_every else None

    (img, _), inter = jax.lax.scan(
        step, (img0, rng), (steps, a_t, a_prev, sigma_t, sqrt_om_at))
    if log_every:
        idx = jnp.arange(0, S, log_every)
        return img, (inter[0][idx], inter[1][idx])
    return img, None


def ddim_invert(
    dsched: DDIMSchedule,
    denoise_fn: Callable,
    x0,
):
    """Deterministic DDIM inversion x_0 -> x_T (ddim.py:429-482 next_step):
    runs the update in ascending-noise order using ᾱ_next tables."""
    b = x0.shape[0]
    steps = jnp.asarray(dsched.timesteps)
    a_t = jnp.asarray(dsched.alphas)
    a_next = jnp.asarray(dsched.alphas_next)

    def step(img, inp):
        t, at, anext = inp
        t_b = jnp.full((b,), t, jnp.int32)
        e_t = denoise_fn(img, t_b).astype(jnp.float32)
        pred_x0 = (img - jnp.sqrt(1.0 - at) * e_t) / jnp.sqrt(at)
        img = jnp.sqrt(anext) * pred_x0 + jnp.sqrt(1.0 - anext) * e_t
        return img, None

    img, _ = jax.lax.scan(step, x0.astype(jnp.float32), (steps, a_t, a_next))
    return img


def ddim_sample_cfg(
    dsched: DDIMSchedule,
    denoise_fn: Callable,          # (x, t, cond) -> eps
    cond,
    uncond,
    guidance_scale: float,
    shape,
    rng,
    **kwargs,
):
    """Classifier-free-guided DDIM (ddim.py:174-181): batches cond/uncond
    through one denoiser call per step."""

    def guided(x, t_b):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t_b, t_b], axis=0)
        c2 = jnp.concatenate([uncond, cond], axis=0)
        e = denoise_fn(x2, t2, c2)
        e_uc, e_c = jnp.split(e, 2, axis=0)
        return e_uc + guidance_scale * (e_c - e_uc)

    return ddim_sample(dsched, guided, shape, rng, **kwargs)
