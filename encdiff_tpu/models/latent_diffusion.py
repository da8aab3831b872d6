"""LatentDiffusion / DDPM: the flagship EncDiff model.

TPU-native rebuild of ``ldm/models/diffusion/ddpm_enc.py`` (DDPM:48-479,
LatentDiffusion:482-1648, DiffusionWrapper:1651-1677). The reference is a
LightningModule that mixes module construction, schedule buffers, training
logic, EMA and sampling; here it splits into:

- this orchestrator class, holding the flax module definitions (UNet,
  first-stage VQ, cond-stage Encoder4), host-built schedule tables, and the
  reference's full constructor surface so ``instantiate_from_config`` on the
  reference YAML works verbatim;
- pure jittable functions (``loss_fn``, ``apply_model``, ``sample_*``)
  closing over the module defs, assembled into one fused train step by
  ``encdiff_tpu.train.loop`` (value_and_grad + optax + EMA in a single XLA
  program — the reference splits this across Lightning hooks,
  ``ddpm_enc.py:360-401``).

Conditioning: only the ``crossattn`` DiffusionWrapper path is implemented —
the reference's 'concat'/None paths are dead code with latent bugs
(``ddpm_enc.py:1651-1677``, SURVEY.md §2.5) and no config exercises them.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from encdiff_tpu.core.config import instantiate_from_config, to_plain
from encdiff_tpu.core.schedules import DDIMSchedule, DiffusionSchedule
from encdiff_tpu.diffusion import ddim as ddim_lib
from encdiff_tpu.diffusion import ddpm as ddpm_lib


def _freeze_seqs(params: dict) -> dict:
    """Lists in YAML configs -> tuples (flax module fields must be hashable)."""
    out = {}
    for k, v in params.items():
        if isinstance(v, list):
            out[k] = tuple(v)
        else:
            out[k] = v
    return out


class DDPM:
    """Image-space DDPM base (ddpm_enc.py:48-479 constructor surface)."""

    def __init__(self, unet_config, timesteps=1000, beta_schedule="linear",
                 loss_type="l2", ckpt_path=None, ignore_keys=(),
                 load_only_unet=False, monitor="val/loss", use_ema=True,
                 first_stage_key="image", image_size=256, channels=3,
                 log_every_t=100, clip_denoised=True, linear_start=1e-4,
                 linear_end=2e-2, cosine_s=8e-3, given_betas=None,
                 original_elbo_weight=0.0, v_posterior=0.0,
                 l_simple_weight=1.0, conditioning_key=None,
                 parameterization="eps", scheduler_config=None,
                 use_positional_encodings=False, learn_logvar=False,
                 logvar_init=0.0, eval_name=None, dtype=jnp.float32):
        assert parameterization in ("eps", "x0")
        from encdiff_tpu.nn.layers import as_dtype
        dtype = as_dtype(dtype)
        self.parameterization = parameterization
        self.clip_denoised = clip_denoised
        self.log_every_t = log_every_t
        self.first_stage_key = first_stage_key
        self.image_size = image_size
        self.channels = channels
        self.conditioning_key = conditioning_key
        self.loss_type = loss_type
        self.use_ema = use_ema
        self.monitor = monitor
        self.scheduler_config = scheduler_config
        self.v_posterior = v_posterior
        self.original_elbo_weight = original_elbo_weight
        self.l_simple_weight = l_simple_weight
        self.learn_logvar = learn_logvar
        self.eval_name = eval_name
        self.ckpt_path = ckpt_path
        self.ignore_keys = tuple(ignore_keys)
        self.load_only_unet = load_only_unet
        self.dtype = dtype
        del use_positional_encodings

        unet_config = to_plain(unet_config)
        self.unet_config = unet_config
        self.unet = instantiate_from_config(
            {"target": unet_config["target"],
             "params": _freeze_seqs(dict(unet_config.get("params", {})))},
            dtype=dtype)

        self.schedule = DiffusionSchedule.create(
            timesteps=timesteps, beta_schedule=beta_schedule,
            linear_start=linear_start, linear_end=linear_end,
            cosine_s=cosine_s, given_betas=given_betas,
            v_posterior=v_posterior, parameterization=parameterization)
        self.num_timesteps = self.schedule.num_timesteps
        self.logvar_init = logvar_init
        self.logvar = np.full((self.num_timesteps,), logvar_init,
                              dtype=np.float32)

        # ground-truth label dataset for in-training disentanglement eval
        # (ddpm_enc.py:122-130): observations are integer indices into the
        # on-device representation array.
        self.label_dataset = None
        if eval_name is not None:
            from encdiff_tpu.evalx.ground_truth import named_data
            self.label_dataset = named_data.get_index_dataset(eval_name)

    # --- parameters ---------------------------------------------------------
    def init_variables(self, rng):
        x = jnp.zeros((1, self.image_size, self.image_size, self.channels),
                      jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        ctx = None
        if self.conditioning_key == "crossattn":
            p = self.unet_config.get("params", {})
            ctx = jnp.zeros(
                (1, p.get("latent_unit", 20) * p.get("context_dim", 16)),
                jnp.float32)
        return self.unet.init(rng, x, t, ctx)


class LatentDiffusion(DDPM):
    """Latent-space EncDiff model (ddpm_enc.py:482-1648 surface)."""

    def __init__(self, first_stage_config, cond_stage_config,
                 num_timesteps_cond=None, cond_stage_key="image",
                 cond_stage_trainable=False, concat_mode=True,
                 cond_stage_forward=None, conditioning_key=None,
                 scale_factor=1.0, scale_by_std=False,
                 # MCL fork kwargs (configs/mcl/*.yaml)
                 use_mcl=False, mcl_type="infonce_mechgrad", lambda_mcl=0.0,
                 mcl_tau=0.1, mcl_sigma=0.1, mcl_neg_mode="shuffle_u",
                 mcl_proj_dim=128,
                 # round-4 independence regularizers on the concept scalars
                 # (losses/indep.py): target the two-codes-one-factor split
                 # (completeness) and the interaction leak (the DCI gap)
                 indep_type=None, lambda_indep=0.0, indep_bandwidth=1.0,
                 *args, **kwargs):
        self.num_timesteps_cond = num_timesteps_cond or 1
        self.scale_by_std = scale_by_std
        assert self.num_timesteps_cond <= kwargs.get("timesteps", 1000)
        if conditioning_key is None:
            conditioning_key = "concat" if concat_mode else "crossattn"
        if cond_stage_config == "__is_unconditional__":
            conditioning_key = None
        ckpt_path = kwargs.pop("ckpt_path", None)
        ignore_keys = kwargs.pop("ignore_keys", ())
        super().__init__(*args, conditioning_key=conditioning_key, **kwargs)
        self.concat_mode = concat_mode
        self.cond_stage_trainable = cond_stage_trainable
        self.cond_stage_key = cond_stage_key
        self.cond_stage_forward = cond_stage_forward
        self.scale_factor = scale_factor
        self.shorten_cond_schedule = self.num_timesteps_cond > 1
        self.ckpt_path = ckpt_path
        self.ignore_keys = tuple(ignore_keys)
        self.restarted_from_ckpt = ckpt_path is not None

        # frozen first stage (ddpm_enc.py:619-627)
        first_stage_config = to_plain(first_stage_config)
        self.first_stage_model = instantiate_from_config(first_stage_config)
        # trainable cond stage (ddpm_enc.py:629-648)
        cond_stage_config = to_plain(cond_stage_config)
        if cond_stage_config in ("__is_first_stage__", "__is_unconditional__"):
            self.cond_stage_model = None
        else:
            self.cond_stage_model = instantiate_from_config(
                {"target": cond_stage_config["target"],
                 "params": _freeze_seqs(dict(cond_stage_config.get("params", {})))},
                dtype=self.dtype)
        self.latent_unit = self.unet_config.get("params", {}).get("latent_unit", 20)
        self.context_dim = self.unet_config.get("params", {}).get("context_dim", 16)

        # MCL fork configuration (mcl_utils.py + ddpm_enc.py:553-579)
        self.use_mcl = use_mcl
        self.mcl_type = mcl_type
        self.lambda_mcl = lambda_mcl
        self.mcl_tau = mcl_tau
        self.mcl_sigma = mcl_sigma
        self.mcl_neg_mode = mcl_neg_mode
        self.mcl_proj_dim = mcl_proj_dim
        self.indep_type = indep_type or None
        self.lambda_indep = lambda_indep
        self.indep_bandwidth = indep_bandwidth
        self.mcl_modules = None
        if use_mcl:
            from encdiff_tpu.losses.mcl import build_mcl_modules
            self.mcl_modules = build_mcl_modules(
                z_shape=(self.image_size, self.image_size, self.channels),
                u_dim=self.latent_unit, proj_dim=mcl_proj_dim, dtype=self.dtype)

    # --- parameter lifecycle ------------------------------------------------
    def init_variables(self, rng, image_resolution: int = 64):
        """Init all parameter trees. Returns a dict:
        {unet: vars, cond: vars, first_stage: vars[, mcl: vars]}."""
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        out = {"unet": super().init_variables(r1)}
        if self.cond_stage_model is not None:
            x_img = jnp.zeros((1, image_resolution, image_resolution, 3),
                              jnp.float32)
            out["cond"] = self.cond_stage_model.init(r2, x_img)
        out["first_stage"] = self.first_stage_model.init_variables(r3)
        if self.mcl_modules is not None:
            from encdiff_tpu.losses.mcl import init_mcl_variables
            out["mcl"] = init_mcl_variables(
                self.mcl_modules, r4,
                z_shape=(self.image_size, self.image_size, self.channels),
                u_dim=self.latent_unit)
        return out

    # --- pure model functions -----------------------------------------------
    def apply_model(self, unet_vars, x_noisy, t, cond, capture_attn=False):
        """ε_θ(x_t, t, context) — DiffusionWrapper 'crossattn' path
        (ddpm_enc.py:1666)."""
        if capture_attn:
            return self.unet.apply(unet_vars, x_noisy, t, cond,
                                   capture_attn=True, mutable=["attn_maps"])
        return self.unet.apply(unet_vars, x_noisy, t, cond)

    def encode_first_stage(self, fs_vars, x):
        """Frozen VQ encode (no grad, no quantize for VQModelInterface)."""
        return self.first_stage_model.encode(fs_vars, x)

    def get_first_stage_encoding(self, z, scale_factor=None):
        sf = self.scale_factor if scale_factor is None else scale_factor
        return sf * z

    def decode_first_stage(self, fs_vars, z, disentangled_repr=None,
                           scale_factor=None, force_not_quantize=False):
        """1/scale * z -> VQ decode (quantizes inside unless forced;
        ddpm_enc.py:971-1016 + autoencoder.py:328-369)."""
        sf = self.scale_factor if scale_factor is None else scale_factor
        z = (1.0 / sf) * z
        return self.first_stage_model.decode(
            fs_vars, z, force_not_quantize=force_not_quantize,
            disentangled_repr=disentangled_repr)

    def cond_encoding(self, cond_vars, x, train=False):
        """Raw (B, latent_unit) scalars from Encoder4."""
        from encdiff_tpu.nn.encoder4 import Encoder4
        if train:
            return self.cond_stage_model.apply(
                cond_vars, x, train=True, mutable=["batch_stats"],
                method=Encoder4.encoding)
        return self.cond_stage_model.apply(cond_vars, x,
                                           method=Encoder4.encoding)

    def cond_warp(self, cond_vars, u):
        from encdiff_tpu.nn.encoder4 import Encoder4
        return self.cond_stage_model.apply(cond_vars, u, method=Encoder4.warp)

    def get_learned_conditioning(self, cond_vars, x, train=False):
        """Images -> flat concept-token vector (B, U*D). In train mode also
        returns mutated batch stats and the raw scalars u."""
        from encdiff_tpu.nn.encoder4 import Encoder4
        if train:
            (u, tokens), mut = self.cond_stage_model.apply(
                cond_vars, x, train=True, mutable=["batch_stats"],
                method=_encode_and_warp)
            return tokens, u, mut
        u, tokens = self.cond_stage_model.apply(cond_vars, x,
                                                method=_encode_and_warp)
        return tokens, u, None

    @staticmethod
    def split_batch(batch):
        """Normalize a train batch to ``(x, z_cached)``.

        ``batch`` is either a (B,H,W,3) image array or a dict
        ``{"image": images, "z": pre-scale first-stage code}`` — the
        precomputed-latent path (harness ``--cache_latents``): the frozen
        VQ encode (autoencoder.py:313-316 — a pure conv stack, no rng) is
        deterministic, so re-encoding the same pixels every epoch recomputes
        identical values; caching z once trades ~14% of the train-step FLOPs
        (and the largest-activation convs) for 0.7 GB of HBM at 480k/16x16x3.
        """
        z = None
        if isinstance(batch, dict):
            z = batch["z"]
            batch = batch["image"]
        if jnp.issubdtype(batch.dtype, jnp.integer):
            # loaders ship uint8 over PCIe; normalize on device (the
            # reference's host-side ToTensor+Normalize, disdata.py:80-86)
            x = batch.astype(jnp.float32) / 127.5 - 1.0
        else:
            x = batch.astype(jnp.float32)
        return x, z

    # --- loss (the hot path; called under value_and_grad) --------------------
    def loss_fn(self, trainable, frozen, batch, rng, scale_factor,
                train: bool = True, with_mcl: bool = True):
        """One DDPM training loss evaluation (ddpm_enc.py:1018-1056,
        1183-1253 path).

        trainable: {"unet": params, "cond": {params, batch_stats}
                    [, "logvar"][, "mcl"]}
        frozen:    {"first_stage": vars, "cond_batch_stats": batch_stats}
        batch:     (B,H,W,3) images in [-1,1], HWC.
        ``with_mcl=False`` omits the MCL term even when configured — the
        split-program mode (loop.build_split_mcl_train_step) computes it in
        a second, smaller XLA program.
        Returns (loss, (loss_dict, new_batch_stats)).
        """
        t_rng, n_rng, mcl_rng = jax.random.split(rng, 3)
        x, z = self.split_batch(batch)
        fs_vars = frozen["first_stage"]

        # frozen first-stage encode (no grad flows by construction: fs params
        # are not in `trainable`); skipped when the precomputed-latent path
        # ships z with the batch
        if z is None:
            z = self.encode_first_stage(fs_vars, x)
        z = self.get_first_stage_encoding(z, scale_factor)

        cond_vars = {"params": trainable["cond"],
                     "batch_stats": frozen["cond_batch_stats"]}
        tokens, u, mut = self.get_learned_conditioning(cond_vars, x, train=train)
        new_stats = mut["batch_stats"] if mut is not None else frozen["cond_batch_stats"]

        b = x.shape[0]
        t = jax.random.randint(t_rng, (b,), 0, self.num_timesteps)
        noise = jax.random.normal(n_rng, z.shape, jnp.float32)

        unet_vars = {"params": trainable["unet"]}
        apply_fn = lambda x_noisy, tt: self.apply_model(unet_vars, x_noisy, tt, tokens)
        if self.unet_config.get("params", {}).get("use_checkpoint"):
            # rematerialize the denoiser in the backward pass (the reference's
            # per-block torch checkpointing, util.py:116-176, expressed at the
            # jit level): ~2x less activation memory for ~33% extra FLOPs
            apply_fn = jax.checkpoint(apply_fn)

        logvar = trainable.get("logvar", jnp.asarray(self.logvar))
        prefix = "train" if train else "val"
        loss, loss_dict = ddpm_lib.ddpm_losses(
            self.schedule, apply_fn, z, t, noise, logvar,
            loss_type=self.loss_type, parameterization=self.parameterization,
            l_simple_weight=self.l_simple_weight,
            original_elbo_weight=self.original_elbo_weight, prefix=prefix)

        if self.indep_type is not None and self.lambda_indep > 0:
            from encdiff_tpu.losses.indep import indep_penalty

            pen = indep_penalty(self.indep_type, u,
                                bandwidth=self.indep_bandwidth)
            loss_dict[f"{prefix}/loss_indep"] = pen
            loss = loss + self.lambda_indep * pen
            loss_dict[f"{prefix}/loss"] = loss

        if self.use_mcl and self.lambda_mcl > 0 and with_mcl:
            from encdiff_tpu.losses.mcl import mcl_loss

            def decoder_G(zz, uu):
                # differentiable_decode_first_stage: grads flow through the
                # frozen decoder to (z, u) but not into its params
                # (ddpm_enc.py:1222-1243).
                return self.decode_first_stage(
                    fs_vars, zz, disentangled_repr=uu,
                    scale_factor=scale_factor)

            mcl_val = mcl_loss(
                loss_type=self.mcl_type, decoder_G=decoder_G, z=z, u_key=u,
                modules=self.mcl_modules, params=trainable.get("mcl"),
                rng=mcl_rng, tau=self.mcl_tau, sigma=self.mcl_sigma,
                neg_mode=self.mcl_neg_mode)
            loss_dict[f"{prefix}/loss_mcl"] = mcl_val
            loss = loss + self.lambda_mcl * mcl_val
            loss_dict[f"{prefix}/mcl_diffusion_ratio"] = (
                mcl_val / jnp.maximum(loss_dict[f"{prefix}/loss_simple"], 1e-12))
            loss_dict[f"{prefix}/loss"] = loss

        return loss, (loss_dict, new_stats)

    def mcl_loss_fn(self, trainable, frozen, batch, rng, scale_factor,
                    prefix: str = "train"):
        """The MCL term alone: lambda_mcl * mcl_loss, differentiable wrt
        {cond, mcl} (the unet subtree is untouched -> zero grads). Used by
        the split-program train step so the UNet fwd+bwd and the
        nested-grad decoder programs are compiled (and, on remote-compile
        tunnels, shipped) separately. Normalization uses batch statistics
        (train semantics) so gradients match the fused program bit-for-bit;
        running-stat updates are discarded (the fused/diffusion program owns
        them). Returns (lambda*mcl, loss_dict)."""
        from encdiff_tpu.losses.mcl import mcl_loss

        _, _, mcl_rng = jax.random.split(rng, 3)
        x, z = self.split_batch(batch)
        fs_vars = frozen["first_stage"]
        if z is None:
            z = self.encode_first_stage(fs_vars, x)
        z = self.get_first_stage_encoding(z, scale_factor)
        cond_vars = {"params": trainable["cond"],
                     "batch_stats": frozen["cond_batch_stats"]}
        _, u, _ = self.get_learned_conditioning(cond_vars, x, train=True)

        def decoder_G(zz, uu):
            return self.decode_first_stage(
                fs_vars, zz, disentangled_repr=uu, scale_factor=scale_factor)

        mcl_val = mcl_loss(
            loss_type=self.mcl_type, decoder_G=decoder_G, z=z, u_key=u,
            modules=self.mcl_modules, params=trainable.get("mcl"),
            rng=mcl_rng, tau=self.mcl_tau, sigma=self.mcl_sigma,
            neg_mode=self.mcl_neg_mode)
        return self.lambda_mcl * mcl_val, {f"{prefix}/loss_mcl": mcl_val}

    # --- scale-by-std (ddpm_enc.py on_train_batch_start) ---------------------
    def compute_scale_factor(self, variables, batch):
        """1/std(z) over the first batch when scale_by_std is set."""
        if not self.scale_by_std:
            return jnp.asarray(self.scale_factor, jnp.float32)
        x, z = self.split_batch(batch)
        if z is None:
            z = self.encode_first_stage(variables["first_stage"], x)
        z = z.astype(jnp.float32)  # std in f32 even under bf16 activations
        return 1.0 / jnp.maximum(jnp.std(z.reshape(-1)), 1e-8)

    # --- sampling ------------------------------------------------------------
    def make_denoiser(self, unet_vars, tokens):
        return lambda x, t: self.apply_model({"params": unet_vars["params"]}
                                             if "params" not in unet_vars
                                             else unet_vars, x, t, tokens)

    def sample_ddim(self, variables, tokens, rng, batch_size=None, steps=200,
                    eta=0.0, x_T=None, log_every=None):
        """DDIM sample in latent space conditioned on concept tokens."""
        b = batch_size or tokens.shape[0]
        shape = (b, self.image_size, self.image_size, self.channels)
        dsched = DDIMSchedule.create(self.schedule, steps, eta=eta)
        denoise = self.make_denoiser(variables["unet"], tokens)
        return ddim_lib.ddim_sample(dsched, denoise, shape, rng, x_T=x_T,
                                    sched=self.schedule, log_every=log_every)

    def sample_ddpm(self, variables, tokens, rng, batch_size=None,
                    log_every_t=None):
        b = batch_size or tokens.shape[0]
        shape = (b, self.image_size, self.image_size, self.channels)
        denoise = self.make_denoiser(variables["unet"], tokens)
        return ddpm_lib.p_sample_loop(
            self.schedule, denoise, shape, rng,
            parameterization=self.parameterization,
            clip_denoised=self.clip_denoised, log_every_t=log_every_t)


def _encode_and_warp(module, x, train: bool = False):
    """Helper method run inside Encoder4.apply: returns (scalars, flat tokens)."""
    u = module.encoding(x, train=train)
    return u, module.warp(u)


class DiffusionWrapper:
    """Kept for API completeness: dispatches on conditioning_key
    (ddpm_enc.py:1651-1677). Only 'crossattn' is functional — the reference's
    other branches are broken dead code (SURVEY.md §2.5)."""

    def __init__(self, model: LatentDiffusion):
        self.model = model

    def __call__(self, unet_vars, x, t, c_crossattn=None, **kwargs):
        assert self.model.conditioning_key == "crossattn"
        cond = c_crossattn[0] if isinstance(c_crossattn, (list, tuple)) else c_crossattn
        return self.model.apply_model(unet_vars, x, t, cond)
