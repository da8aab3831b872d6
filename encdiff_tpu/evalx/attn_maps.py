"""Cross-attention map extraction — the intended capability behind the
reference's broken ``DDIMSamplerAttn(return_context=True)`` plumbing
(``ddim.py:384-397`` mis-indexes because ``UNetModel.forward`` swallows
``return_context`` — SURVEY.md §2.5). Here the UNet sows per-layer
attention probabilities into a flax collection, so extraction is exact and
works at any timestep.

Maps come back as {layer_name: (B, heads, N_spatial, M_tokens)} — for
EncDiff, M_tokens == latent_unit, giving the per-factor spatial
attribution the paper visualizes.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from encdiff_tpu.core.schedules import DDIMSchedule


def extract_attention_maps(model, variables, x, t, tokens=None,
                           use_ema: bool = False) -> dict[str, Any]:
    """One denoiser forward with capture: returns {path: probs}.

    x: (B, h, w, C) noisy latent; t: (B,) timesteps; tokens: (B, U*D) flat
    conditioning (computed from images via the cond stage if None).
    """
    unet_vars = ({"params": variables["ema"]}
                 if use_ema and variables.get("ema") is not None
                 else {"params": variables["unet"]["params"]})
    _, mut = model.apply_model(unet_vars, x, t, tokens, capture_attn=True)
    maps = {}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, prefix + (k,))
        else:
            # sow reduce_fn accumulates tuples
            seq = tree if isinstance(tree, (tuple, list)) else (tree,)
            for i, arr in enumerate(seq):
                name = "/".join(prefix) + (f"#{i}" if len(seq) > 1 else "")
                maps[name] = arr

    walk(mut["attn_maps"], ())
    return maps


def cross_attention_maps_for_images(model, variables, images, t_value=500,
                                    rng=None):
    """Convenience: encode images -> tokens, noise to t, capture maps.
    Returns (maps dict, tokens, u scalars)."""
    from encdiff_tpu.diffusion import ddpm as ddpm_lib

    rng = jax.random.PRNGKey(0) if rng is None else rng
    x = jnp.asarray(images).astype(jnp.float32)
    if np.issubdtype(np.asarray(images).dtype, np.integer):
        x = x / 127.5 - 1.0
    cond_vars = {"params": variables["cond"]["params"],
                 "batch_stats": variables["cond"].get("batch_stats", {})}
    u = model.cond_encoding(cond_vars, x)
    tokens = model.cond_warp(cond_vars, u)
    if tokens.ndim == 3:
        tokens = tokens.reshape(tokens.shape[0], -1)
    z = model.get_first_stage_encoding(
        model.encode_first_stage(variables["first_stage"], x),
        float(model.scale_factor))
    b = z.shape[0]
    t = jnp.full((b,), t_value, jnp.int32)
    noise = jax.random.normal(rng, z.shape, jnp.float32)
    z_noisy = ddpm_lib.q_sample(model.schedule, z, t, noise)
    maps = extract_attention_maps(model, variables, z_noisy, t, tokens)
    # keep only cross-attention maps (attn2: keys == latent_unit tokens)
    cross = {k: v for k, v in maps.items()
             if v.shape[-1] == model.latent_unit}
    return cross, tokens, u


def ddim_sample_with_attn(model, variables, tokens, rng, ddim_steps=50,
                          eta=0.0, capture_every=10, use_ema: bool = False):
    """DDIM chain that captures attention maps every ``capture_every`` steps
    (the working DDIMSamplerAttn). Python loop over steps — used for
    analysis, not the hot sampling path."""
    dsched = DDIMSchedule.create(model.schedule, ddim_steps, eta=eta)
    unet_vars = ({"params": variables["ema"]}
                 if use_ema and variables.get("ema") is not None
                 else {"params": variables["unet"]["params"]})
    b = tokens.shape[0]
    shape = (b, model.image_size, model.image_size, model.channels)
    rng, init_rng = jax.random.split(rng)
    img = jax.random.normal(init_rng, shape, jnp.float32)

    steps = np.asarray(dsched.timesteps)[::-1]
    a_t = np.asarray(dsched.alphas)[::-1]
    a_prev = np.asarray(dsched.alphas_prev)[::-1]
    sigma = np.asarray(dsched.sigmas)[::-1]
    som = np.asarray(dsched.sqrt_one_minus_alphas)[::-1]

    @jax.jit
    def plain_step(img, t, at, aprev, sig, somt, nrng):
        t_b = jnp.full((b,), t, jnp.int32)
        e_t = model.apply_model(unet_vars, img, t_b, tokens).astype(jnp.float32)
        pred_x0 = (img - somt * e_t) / jnp.sqrt(at)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - aprev - sig**2, 0.0)) * e_t
        noise = sig * jax.random.normal(nrng, shape, jnp.float32)
        return jnp.sqrt(aprev) * pred_x0 + dir_xt + noise

    collected = {}
    for i in range(len(steps)):
        rng, nrng = jax.random.split(rng)
        if i % capture_every == 0:
            t_b = jnp.full((b,), int(steps[i]), jnp.int32)
            maps = extract_attention_maps(model, variables, img, t_b, tokens,
                                          use_ema=use_ema)
            collected[int(steps[i])] = {
                k: np.asarray(v) for k, v in maps.items()
                if v.shape[-1] == model.latent_unit}
        img = plain_step(img, steps[i], a_t[i], a_prev[i], sigma[i], som[i],
                         nrng)
    return img, collected
