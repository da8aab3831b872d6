"""Config registry: ``instantiate_from_config`` + target-string resolution.

API-parity layer for the reference's config system (``ldm/util.py:78-93``):
every model / dataset / callback in a YAML config is a
``{target: dotted.path, params: {...}}`` dict. We additionally accept the
reference's ``ldm.*`` / ``main.*`` / ``main_val.*`` target strings and remap
them onto this package so unmodified reference configs instantiate the
TPU-native equivalents (reference wart: ``main.py`` does not exist upstream,
``SURVEY.md`` §2.5 — both aliases are registered here).
"""

from __future__ import annotations

import importlib
from typing import Any

# Reference target string -> encdiff_tpu target string.
# Covers every `target:` that appears under /root/reference/configs/**.
TARGET_ALIASES: dict[str, str] = {
    # models (ldm/models/diffusion/ddpm_enc.py, ldm/models/autoencoder.py)
    "ldm.models.diffusion.ddpm_enc.LatentDiffusion":
        "encdiff_tpu.models.latent_diffusion.LatentDiffusion",
    "ldm.models.diffusion.ddpm_enc.DDPM":
        "encdiff_tpu.models.latent_diffusion.DDPM",
    "ldm.models.autoencoder.VQModel":
        "encdiff_tpu.models.autoencoder.VQModel",
    "ldm.models.autoencoder.VQModelInterface":
        "encdiff_tpu.models.autoencoder.VQModelInterface",
    "ldm.models.autoencoder.AutoencoderKL":
        "encdiff_tpu.models.autoencoder.AutoencoderKL",
    "ldm.models.autoencoder.IdentityFirstStage":
        "encdiff_tpu.models.autoencoder.IdentityFirstStage",
    # nn modules (ldm/modules/**)
    "ldm.modules.diffusionmodules.openaimodel_enc.UNetModel":
        "encdiff_tpu.nn.unet.UNetModel",
    "ldm.modules.diffusionmodules.openaimodel_enc.Encoder4":
        "encdiff_tpu.nn.encoder4.Encoder4",
    "ldm.modules.encoders.slot_attn.MultiHeadSTEVESA":
        "encdiff_tpu.nn.slot_attn.MultiHeadSTEVESA",
    "ldm.modules.encoders.modules.ClassEmbedder":
        "encdiff_tpu.nn.encoders.ClassEmbedder",
    "ldm.modules.encoders.modules.TransformerEmbedder":
        "encdiff_tpu.nn.encoders.TransformerEmbedder",
    "ldm.modules.encoders.modules.BERTEmbedder":
        "encdiff_tpu.nn.encoders.BERTEmbedder",
    "ldm.modules.encoders.modules.SpatialRescaler":
        "encdiff_tpu.nn.encoders.SpatialRescaler",
    "ldm.modules.encoders.modules.FrozenCLIPTextEmbedder":
        "encdiff_tpu.nn.encoders.FrozenCLIPTextEmbedder",
    "ldm.modules.encoders.modules.FrozenClipImageEmbedder":
        "encdiff_tpu.nn.encoders.FrozenClipImageEmbedder",
    "ldm.models.diffusion.classifier.NoisyLatentImageClassifier":
        "encdiff_tpu.models.classifier.NoisyLatentImageClassifier",
    # losses
    "torch.nn.Identity": "encdiff_tpu.losses.basic.IdentityLoss",
    "ldm.modules.losses.contperceptual.LPIPSWithDiscriminator":
        "encdiff_tpu.losses.gan.LPIPSWithDiscriminator",
    "ldm.modules.losses.vqperceptual.VQLPIPSWithDiscriminator":
        "encdiff_tpu.losses.gan.VQLPIPSWithDiscriminator",
    "taming.modules.losses.vqperceptual.VQLPIPSWithDiscriminator":
        "encdiff_tpu.losses.gan.VQLPIPSWithDiscriminator",
    # schedulers
    "ldm.lr_scheduler.LambdaLinearScheduler":
        "encdiff_tpu.core.lr_scheduler.LambdaLinearScheduler",
    "ldm.lr_scheduler.LambdaWarmUpCosineScheduler":
        "encdiff_tpu.core.lr_scheduler.LambdaWarmUpCosineScheduler",
    "ldm.lr_scheduler.LambdaWarmUpCosineScheduler2":
        "encdiff_tpu.core.lr_scheduler.LambdaWarmUpCosineScheduler2",
    # harness (reference configs point at both main.py and main_val.py)
    "main.DataModuleFromConfig": "encdiff_tpu.train.data.DataModuleFromConfig",
    "main_val.DataModuleFromConfig":
        "encdiff_tpu.train.data.DataModuleFromConfig",
    "main.ImageLogger": "encdiff_tpu.train.callbacks.ImageLogger",
    "main_val.ImageLogger": "encdiff_tpu.train.callbacks.ImageLogger",
    "ldm.tools.Record": "encdiff_tpu.train.callbacks.Record",
    "swap_training_end.SwapVisualizationCallback":
        "encdiff_tpu.train.callbacks.SwapVisualizationCallback",
    "pytorch_lightning.callbacks.ModelCheckpoint":
        "encdiff_tpu.train.callbacks.ModelCheckpoint",
    "pytorch_lightning.callbacks.LearningRateMonitor":
        "encdiff_tpu.train.callbacks.LearningRateMonitor",
}

# Dataset targets: ldm.data.disdata.* -> encdiff_tpu.data.datasets.*
_DISDATA_PREFIX = "ldm.data.disdata."


def _resolve_target(string: str) -> str:
    if string in TARGET_ALIASES:
        return TARGET_ALIASES[string]
    if string.startswith(_DISDATA_PREFIX):
        return "encdiff_tpu.data.datasets." + string[len(_DISDATA_PREFIX):]
    return string


def get_obj_from_str(string: str, reload: bool = False) -> Any:
    """Resolve a dotted path (with reference-name aliasing) to an object."""
    string = _resolve_target(string)
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def instantiate_from_config(config: Any, **extra_kwargs: Any) -> Any:
    """Instantiate ``{target: ..., params: {...}}`` (ldm/util.py:78-85 parity).

    The special sentinels ``__is_first_stage__`` and ``__is_unconditional__``
    are honored exactly like the reference (``ldm/util.py:80-84``).
    """
    if not isinstance(config, dict):
        # OmegaConf DictConfig quacks like a Mapping; convert lazily.
        try:
            config = dict(config)
        except TypeError as e:
            raise KeyError("Expected a config dict with a `target` key") from e
    if "target" not in config:
        if config.get("__is_first_stage__", False) or config == "__is_first_stage__":
            return None
        if config.get("__is_unconditional__", False) or config == "__is_unconditional__":
            return None
        raise KeyError("Expected key `target` to instantiate.")
    params = dict(config.get("params", {}) or {})
    params.update(extra_kwargs)
    return get_obj_from_str(config["target"])(**params)


def to_plain(cfg: Any) -> Any:
    """Recursively convert OmegaConf containers to plain python."""
    try:
        from omegaconf import OmegaConf

        if OmegaConf.is_config(cfg):
            return OmegaConf.to_container(cfg, resolve=True)
    except ImportError:
        pass
    if isinstance(cfg, dict):
        return {k: to_plain(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return [to_plain(v) for v in cfg]
    return cfg
