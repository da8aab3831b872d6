"""Pallas TPU kernels for the EncDiff hot path.

Two fused kernels (SURVEY.md §7 step 8, the north-star "fused into Pallas
kernels" item):

- ``attention.fused_attention``: q/k/v projection + multi-head softmax
  attention + output projection of a SpatialTransformer attention layer in
  one kernel (the sequences are tiny — 256 queries x 20/256 keys — so the
  win is fusion and dispatch count, not flash-style tiling).
- ``groupnorm_silu.groupnorm_silu``: GroupNorm(32) + SiLU (+ optional FiLM
  scale/shift) in one VMEM-resident pass.

Both have jnp reference implementations and are validated against them in
``tests/test_pallas_kernels.py`` (interpret mode on CPU, compiled on TPU).
Model modules call them only when ``encdiff_tpu.nn.pallas.enabled()`` — a
TPU backend is present or interpret mode is forced.
"""

from __future__ import annotations

import os


def enabled(feature: str = "") -> bool:
    """True when Pallas TPU kernels should be used: OPT-IN via
    ENCDIFF_PALLAS on a TPU backend. The value is either a blanket switch
    ("1"/"all"/"interpret") or a comma list of kernel families to enable
    selectively — "gn" (fused GroupNorm+SiLU), "attn" (small fused
    attention core), "flash" (blockwise large-N self-attention) — so each
    kernel can be measured in isolation.

    Measured on one v5e chip at the flagship config (bs=128): the fused
    attention core wins its micro-benchmark (17us vs 19us fwd, 20us vs 24us
    fwd+bwd at 256x20) but LOSES inside the full train step (25.9 vs 55.6
    steps/s) — the custom_vjp boundary stops XLA fusing the surrounding
    projection/residual ops and the per-(batch,head) grid serializes
    dispatch at EncDiff's tiny sequence lengths. XLA's fusion is the right
    default here (SURVEY.md C5: "fusion, not tiling, is the win");
    the kernels remain available for large-latent configs (e.g. CelebA
    64x64 latents = 4096-token self-attention) where VMEM-resident
    attention pays off."""
    val = os.environ.get("ENCDIFF_PALLAS", "")
    if not val:
        return False
    if val not in ("1", "all", "interpret"):
        feats = {f.strip() for f in val.split(",")}
        if feature and feature not in feats:
            return False
    if interpret():
        return True
    try:
        import jax

        plat = jax.default_backend()
        return plat not in ("cpu",)
    except Exception:
        return False


def interpret() -> bool:
    """ENCDIFF_PALLAS=interpret runs the kernels in Pallas interpret mode —
    CPU-correctness testing of the exact kernel code paths."""
    return os.environ.get("ENCDIFF_PALLAS") == "interpret"
