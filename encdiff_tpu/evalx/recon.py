"""Reconstruction metrics: windowed SSIM, LPIPS, MSE — on device.

Rebuild of ``recon_metrics.py:9-104``: the Gaussian-window SSIM (11x1.5,
depthwise conv, C1=0.01^2/C2=0.03^2), per-sample MSE, and LPIPS via the
flax port (``encdiff_tpu.losses.lpips``; the reference uses the ``lpips``
pip package with AlexNet — we use the VGG16 variant consistently with the
VQ training loss). ``recon_eval`` runs the full DDIM-resample protocol
(encode -> DDIM(200, eta=1) -> decode) batched under jit.

All images NHWC. SSIM/MSE expect [0,1]; LPIPS expects [-1,1]
(recon_metrics.py:92-98 normalization conventions preserved).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(window_size: int = 11, sigma: float = 1.5):
    x = np.arange(window_size, dtype=np.float64) - window_size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return jnp.asarray(w2d)


def ssim(img1, img2, window_size: int = 11) -> jnp.ndarray:
    """Per-sample SSIM over NHWC [0,1] images (recon_metrics.py:9-41)."""
    c = img1.shape[-1]
    w = _gaussian_window(window_size)
    # depthwise conv: (kh, kw, 1, C) with feature_group_count=C
    kernel = jnp.tile(w[:, :, None, None], (1, 1, 1, c))

    def dwconv(x):
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1),
            padding=[(window_size // 2,) * 2] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    mu1, mu2 = dwconv(img1), dwconv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = dwconv(img1 * img1) - mu1_sq
    sigma2_sq = dwconv(img2 * img2) - mu2_sq
    sigma12 = dwconv(img1 * img2) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return ssim_map.mean(axis=(1, 2, 3))


def mse(img1, img2) -> jnp.ndarray:
    return ((img1 - img2) ** 2).mean(axis=(1, 2, 3))


def psnr(img1, img2, data_range: float = 1.0) -> jnp.ndarray:
    m = mse(img1, img2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(m, 1e-12))


def recon_eval(model, variables, batches, rng, lpips_obj=None,
               lpips_vars=None, ddim_steps: int = 200, eta: float = 1.0,
               scale_factor: float | None = None):
    """DDIM-resample recon metrics over an iterable of [-1,1] NHWC batches
    (the recon_metrics.py:67-104 loop). Returns dict of means."""
    from encdiff_tpu.core.schedules import DDIMSchedule
    from encdiff_tpu.diffusion import ddim as ddim_lib

    sf = float(model.scale_factor) if scale_factor is None else scale_factor
    dsched = DDIMSchedule.create(model.schedule, ddim_steps, eta=eta)
    fs_vars = variables["first_stage"]
    cond_vars = {"params": variables["cond"]["params"],
                 "batch_stats": variables["cond"].get("batch_stats", {})}
    unet_vars = ({"params": variables["ema"]}
                 if variables.get("ema") is not None
                 else {"params": variables["unet"]["params"]})

    @jax.jit
    def one_batch(x, rng):
        z = model.get_first_stage_encoding(
            model.encode_first_stage(fs_vars, x), sf)
        u = model.cond_encoding(cond_vars, x)
        tokens = model.cond_warp(cond_vars, u)
        if tokens.ndim == 3:
            tokens = tokens.reshape(tokens.shape[0], -1)
        denoise = lambda xx, tt: model.apply_model(unet_vars, xx, tt, tokens)
        samples, _ = ddim_lib.ddim_sample(dsched, denoise, z.shape, rng)
        xrec = model.decode_first_stage(fs_vars, samples, scale_factor=sf)
        x01, xr01 = (x + 1) / 2, (xrec + 1) / 2
        out = {"ssim": ssim(x01, xr01), "mse": mse(x01, xr01),
               "psnr": psnr(x01, xr01)}
        if lpips_obj is not None:
            out["lpips"] = lpips_obj(lpips_vars, x, xrec)
        return out

    sums: dict[str, list] = {}
    for i, batch in enumerate(batches):
        x = jnp.asarray(batch)
        if jnp.issubdtype(x.dtype, jnp.integer):
            x = x.astype(jnp.float32) / 127.5 - 1.0
        res = jax.device_get(one_batch(x, jax.random.fold_in(rng, i)))
        for k, v in res.items():
            sums.setdefault(k, []).append(np.mean(v))
    return {k: float(np.mean(v)) for k, v in sums.items()}
