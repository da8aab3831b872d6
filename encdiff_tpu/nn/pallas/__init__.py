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
    """Whether a Pallas kernel family is active on this backend.

    ENCDIFF_PALLAS values: unset -> measured defaults (flash ON on TPU,
    gn/attn off); "0"/"off" -> everything off; "1"/"all" -> everything on;
    "interpret" -> everything on in interpret mode (CPU testing); or a
    comma list of families — "gn" (fused GroupNorm+SiLU), "attn" (small
    fused attention core), "flash" (blockwise large-N self-attention) —
    to enable selectively for isolated measurement.

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
    if val in ("0", "off", "none"):
        return False
    if not val:
        # measured defaults (BENCH_NOTES.md round 2): flash WINS 2.4x on
        # 4096-token self-attention and is ON by default on TPU backends;
        # gn/attn lose in-situ at EncDiff's small sizes and stay opt-in
        if feature not in _DEFAULT_ON:
            return False
    elif val not in ("1", "all", "interpret"):
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


_DEFAULT_ON = {"flash"}


def interpret() -> bool:
    """ENCDIFF_PALLAS=interpret runs the kernels in Pallas interpret mode —
    CPU-correctness testing of the exact kernel code paths."""
    return os.environ.get("ENCDIFF_PALLAS") == "interpret"
