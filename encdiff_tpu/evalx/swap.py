"""Latent-swap generation + the full ``log_images`` battery.

Rebuild of ``ddpm_enc.py:1473-1596`` (log_images: inputs/recon/diffusion-row/
samples/swap/inpaint/progressive) and the swap loop at ``:1522-1535``.

TPU-first change: the reference runs 20 sequential DDIM(200) chains — one per
factor — each over the N-image batch. Here the factor axis FOLDS INTO THE
BATCH: one (U*N)-batch ``lax.scan`` DDIM run produces all swaps, saturating
the MXU instead of serializing 20 small launches (SURVEY.md §3.3 TPU plan).

EMA parity: sampling branches run under the EMA parameter scope when
available (``ema_scope``, ``ddpm_enc.py:189-202``) — pass ``ema_params``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from encdiff_tpu.core.schedules import DDIMSchedule
from encdiff_tpu.diffusion import ddim as ddim_lib
from encdiff_tpu.diffusion import ddpm as ddpm_lib


def _unet_vars(variables, use_ema: bool):
    if use_ema and variables.get("ema") is not None:
        return {"params": variables["ema"]}
    return {"params": variables["unet"]["params"]} \
        if "params" not in variables["unet"] else variables["unet"]


def swap_conditions(u: jnp.ndarray) -> jnp.ndarray:
    """(B,U) scalars -> (U, B, U): factor cdx of every sample replaced by
    sample 0's value (ddpm_enc.py:1526-1529), all factors at once."""
    b, n_units = u.shape
    base = jnp.broadcast_to(u[None], (n_units, b, n_units))
    eye = jnp.eye(n_units, dtype=u.dtype)[:, None, :]          # (U,1,U)
    donor = u[0][None, None, :]                                # (1,1,U)
    return base * (1 - eye) + donor * eye


def _decode_chunked(model, fs_vars, z, sf, px_budget: int = 2 ** 21):
    """decode_first_stage in fixed-size chunks.

    The all-factor swap batch is U*B (160 at the default N=8); at 256px
    output a single decode of that batch needs more activation HBM than a
    v5e has free mid-training (observed RESOURCE_EXHAUSTED at the step-10k
    image log of the faces run). Chunk so each decode touches at most
    ``px_budget`` output pixels (2M -> 32 images at 256px, 512 at 64px —
    i.e. small configs stay unchunked, one compiled program).
    """
    out_side = int(getattr(model.first_stage_model, "ddconfig", {}).get(
        "resolution", z.shape[1] * 4))
    chunk = max(1, px_budget // (out_side * out_side))
    n = z.shape[0]
    if n <= chunk:
        return np.asarray(model.decode_first_stage(fs_vars, z,
                                                   scale_factor=sf))
    outs = [np.asarray(model.decode_first_stage(fs_vars, z[i:i + chunk],
                                                scale_factor=sf))
            for i in range(0, n, chunk)]
    return np.concatenate(outs, axis=0)


def swap_sample(model, variables, images, rng, ddim_steps: int = 200,
                eta: float = 1.0, use_ema: bool = True):
    """All-factor latent-swap generation in ONE DDIM run.

    images: (B,H,W,3) in [-1,1]. Returns (U*B, H, W, 3) decoded samples in
    reference concat order (factor-major, ``ddpm_enc.py:1534``).
    """
    cond_vars = {"params": variables["cond"]["params"],
                 "batch_stats": variables["cond"].get("batch_stats", {})}
    u = model.cond_encoding(cond_vars, images)                 # (B,U)
    b, n_units = u.shape
    swapped = swap_conditions(u).reshape(n_units * b, n_units)  # (U*B, U)
    tokens = model.cond_warp(cond_vars, swapped)               # (U*B, U*D) flat
    if tokens.ndim == 3:
        tokens = tokens.reshape(tokens.shape[0], -1)

    unet_vars = _unet_vars(variables, use_ema)
    dsched = DDIMSchedule.create(model.schedule, ddim_steps, eta=eta)

    # Chunk the folded (U*B) batch by token budget: at 64x64 latents the
    # 4096-token flash self-attention materializes ~1.3 GB q/k/v/o buffers
    # per layer at U*B=160, which OOMs mid-training alongside the resident
    # dataset/optimizer (and a failed sampling program poisons the queued
    # train step). 2^17 token budget -> 32-sample chunks at 4096 tokens;
    # 16x16-latent configs (256 tokens) stay one fold (chunk=512).
    n_tokens = model.image_size * model.image_size
    chunk = max(1, 2 ** 17 // n_tokens)
    total = n_units * b

    def run_chunk(tok_c, rng_c, nb):
        shape = (nb, model.image_size, model.image_size, model.channels)
        denoise = lambda x, t: model.apply_model(unet_vars, x, t, tok_c)
        samples, _ = ddim_lib.ddim_sample(dsched, denoise, shape, rng_c)
        # decode WITHOUT disentangled_repr: concat channels zero-filled —
        # deliberate reference semantics (autoencoder.py:355-357, §2.5)
        return _decode_chunked(model, variables["first_stage"], samples,
                               float(model.scale_factor))

    if total <= chunk:
        return run_chunk(tokens, rng, total)
    outs = [run_chunk(tokens[i:i + chunk], jax.random.fold_in(rng, i),
                      min(chunk, total - i))
            for i in range(0, total, chunk)]
    return np.concatenate(outs, axis=0)


def log_images(model, variables, batch, N: int = 8, n_row: int = 4,
               sample: bool = True, ddim_steps: int = 200, ddim_eta: float = 1.0,
               quantize_denoised: bool = False, inpaint: bool = False,
               plot_progressive_rows: bool = False, sample_swap: bool = False,
               plot_diffusion_rows: bool = True, rng=None,
               scale_factor: float | None = None, use_ema: bool = True,
               **kwargs) -> dict[str, np.ndarray]:
    """Host-callable logging battery; each branch is one jitted program.

    Returns a dict of numpy arrays (image batches in [-1,1], NHWC), matching
    the reference's log keys (ddpm_enc.py:1473-1596).
    """
    del kwargs
    rng = jax.random.PRNGKey(42) if rng is None else rng
    if hasattr(batch, "astype") and np.issubdtype(
            np.asarray(batch).dtype, np.integer):
        batch = np.asarray(batch).astype(np.float32) / 127.5 - 1.0
    x = jnp.asarray(batch)[:N].astype(jnp.float32)
    N = x.shape[0]
    n_row = min(N, n_row)
    sf = float(model.scale_factor) if scale_factor is None else scale_factor

    fs_vars = variables["first_stage"]
    cond_vars = {"params": variables["cond"]["params"],
                 "batch_stats": variables["cond"].get("batch_stats", {})}

    z = model.get_first_stage_encoding(
        model.encode_first_stage(fs_vars, x), sf)
    u = model.cond_encoding(cond_vars, x)
    tokens = model.cond_warp(cond_vars, u)
    if tokens.ndim == 3:
        tokens = tokens.reshape(tokens.shape[0], -1)
    xrec = model.decode_first_stage(fs_vars, z, scale_factor=sf)

    log: dict[str, np.ndarray] = {
        "inputs": np.asarray(x),
        "reconstruction": np.asarray(xrec),
        "conditioning": np.asarray(x),  # cond input is the raw image
    }

    unet_vars = _unet_vars(variables, use_ema)
    denoise = lambda xx, tt: model.apply_model(unet_vars, xx, tt, tokens)

    if plot_diffusion_rows:
        # forward-noising strip at log_every_t strides (ddpm_enc.py:1505-1520)
        ts = list(range(0, model.num_timesteps, model.log_every_t))
        if (model.num_timesteps - 1) not in ts:
            ts.append(model.num_timesteps - 1)
        rows = []
        z_start = z[:n_row]
        for i, t in enumerate(ts):
            trng = jax.random.fold_in(rng, i)
            noise = jax.random.normal(trng, z_start.shape, jnp.float32)
            z_noisy = ddpm_lib.q_sample(
                model.schedule, z_start,
                jnp.full((n_row,), t, jnp.int32), noise)
            rows.append(np.asarray(model.decode_first_stage(
                fs_vars, z_noisy, scale_factor=sf)))
        log["diffusion_row"] = np.stack(rows, axis=1)  # (n_row, T', H, W, 3)

    needs_ddim = sample or quantize_denoised or inpaint
    dsched = (DDIMSchedule.create(model.schedule, ddim_steps, eta=ddim_eta)
              if needs_ddim else None)
    shape = (N, model.image_size, model.image_size, model.channels)

    if sample_swap:
        rng, srng = jax.random.split(rng)
        log["samples_swapping"] = np.asarray(swap_sample(
            model, variables, x, srng, ddim_steps=ddim_steps, eta=ddim_eta,
            use_ema=use_ema))

    if sample:
        rng, srng = jax.random.split(rng)
        samples, _ = ddim_lib.ddim_sample(dsched, denoise, shape, srng)
        log["samples"] = np.asarray(model.decode_first_stage(
            fs_vars, samples, scale_factor=sf))

    if quantize_denoised:
        # x0 quantized through the VQ codebook each step (ddpm_enc.py:1552-1559)
        def quantize_fn(x0):
            fsm = model.first_stage_model
            quant, _, _ = fsm.module.apply(
                fs_vars, x0 / sf, method=type(fsm.module).encode)
            return quant * sf

        rng, srng = jax.random.split(rng)
        samples_q, _ = ddim_lib.ddim_sample(dsched, denoise, shape, srng,
                                            quantize_fn=quantize_fn)
        log["samples_x0_quantized"] = np.asarray(model.decode_first_stage(
            fs_vars, samples_q, scale_factor=sf))

    if inpaint:
        # lower-right quadrant mask blend (ddpm_enc.py:1561-1581)
        h = model.image_size
        mask = np.ones((N, h, h, 1), np.float32)
        mask[:, h // 4:3 * h // 4, h // 4:3 * h // 4] = 0.0
        mask = jnp.asarray(mask)
        rng, srng = jax.random.split(rng)
        samples_i, _ = ddim_lib.ddim_sample(
            dsched, denoise, shape, srng, mask=mask, x0=z[:N],
            sched=model.schedule)
        log["samples_inpainting"] = np.asarray(model.decode_first_stage(
            fs_vars, samples_i, scale_factor=sf))
        log["mask"] = np.asarray(mask)
        rng, srng = jax.random.split(rng)
        samples_o, _ = ddim_lib.ddim_sample(
            dsched, denoise, shape, srng, mask=1.0 - mask, x0=z[:N],
            sched=model.schedule)
        log["samples_outpainting"] = np.asarray(model.decode_first_stage(
            fs_vars, samples_o, scale_factor=sf))

    if plot_progressive_rows:
        # ancestral DDPM with intermediates (ddpm_enc.py:1583-1589)
        rng, srng = jax.random.split(rng)
        _, inter = ddpm_lib.p_sample_loop(
            model.schedule, denoise, shape, srng,
            parameterization=model.parameterization,
            clip_denoised=model.clip_denoised,
            log_every_t=model.log_every_t)
        decoded = [np.asarray(model.decode_first_stage(
            fs_vars, inter[i], scale_factor=sf))
            for i in range(inter.shape[0])]
        log["progressive_row"] = np.stack(decoded, axis=1)

    return log
