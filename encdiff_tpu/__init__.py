"""EncDiff-TPU: a TPU-native JAX/XLA/Pallas framework for disentangled
representation learning with latent diffusion and cross-attention.

A from-scratch rebuild of the capabilities of SelenaGeRuiqi/EncDiff
("Diffusion Model with Cross Attention as an Inductive Bias for
Disentanglement", NeurIPS 2024) designed TPU-first:

- All compute paths are pure-functional JAX, jitted and shardable with
  ``jax.sharding`` over device meshes (data parallel over ICI).
- Hot ops (cross-attention over concept tokens, GroupNorm+SiLU fusions,
  VQ codebook lookup) have Pallas TPU kernels in ``encdiff_tpu.nn.pallas``.
- Sampling (DDIM/DDPM/PLMS) runs as single ``lax.scan`` programs.
- The public config surface (``instantiate_from_config`` + OmegaConf YAML,
  reference ``ldm.util.py:78-93``) is preserved, including aliases for the
  reference's ``ldm.*`` target strings.
"""

__version__ = "0.1.0"

from encdiff_tpu.core.config import instantiate_from_config, get_obj_from_str

__all__ = ["instantiate_from_config", "get_obj_from_str", "__version__"]
