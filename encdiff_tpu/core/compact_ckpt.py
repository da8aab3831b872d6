"""Compact, git-committable checkpoints.

This box loses every gitignored ``runs_*/`` tree on reboot (three times in
round 3 — ROADMAP.md), so checkpoint-dependent studies (seed/probe/swap,
MCL fine-tunes) previously required a full retrain each session. A compact
checkpoint is a single ``.npz``: the model parameter subtrees flattened to
``/``-joined keys and cast to float16, with no optimizer state. ~2 bytes
per parameter — small enough for ``demo_artifacts/``.

Consumers:
- ``checkpoint_io.load_model_variables`` accepts a ``.npz`` path for every
  eval/sampling script (swap grids, TAD, reasoning, UDR);
- ``harness.Trainer.restore_checkpoint`` accepts it for ``--resume_ckpt``:
  the lenient strict=False merge leaves optimizer slots at init — exactly
  the fine-tune semantics the MCL sweep already uses (fresh AdamW, loaded
  weights).

float16 narrowing moves eval metrics by <1e-3 on the flagship (the codes
feeding DCI/FactorVAE are encoder outputs whose weights sit well inside
fp16 range); the full-precision orbax tree remains the in-session format.
"""

from __future__ import annotations

from typing import Any

import numpy as np

_SEP = "/"
_META_PREFIX = "__shape0__"  # marks empty-shape/scalar leaves stored as 0-d


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
        return out
    if isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}{_SEP}"))
        return out
    arr = np.asarray(tree)
    # narrow weight tensors only; scalars (step, scale_factor, EMA decay)
    # stay exact — they are load-bearing and cost nothing
    if arr.dtype in (np.float32, np.float64) and arr.size > 1:
        arr = arr.astype(np.float16)
    out[prefix[:-1]] = arr
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, arr in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if arr.dtype == np.float16:
            arr = arr.astype(np.float32)
        node[parts[-1]] = arr
    return tree


def save_compact(path: str, state: Any, frozen: Any) -> str:
    """Write {state: params/batch_stats/ema/scale_factor, frozen} as one
    fp16 npz. ``state`` may be a TrainState or an equivalent dict."""
    def field(obj, name):
        if isinstance(obj, dict):
            return obj.get(name)
        return getattr(obj, name, None)

    tree = {
        "state": {
            "params": field(state, "params"),
            "batch_stats": field(state, "batch_stats") or {},
            "scale_factor": np.float32(np.asarray(
                field(state, "scale_factor"))),
            "step": np.asarray(field(state, "step") or 0),
        },
        "frozen": frozen,
    }
    ema = field(state, "ema")
    if ema is not None:
        tree["state"]["ema"] = {"params": field(ema, "params")}
    flat = _flatten(tree)
    np.savez_compressed(path, **flat)
    return path


def save_compact_vq(path: str, state: Any) -> str:
    """Compact form of the VQ-GAN trainer's two-optimizer state: keeps
    gen/disc params and batch stats, drops the Adam slots (gen_opt /
    disc_opt). Loadable by ``VQModel.load_reference_checkpoint`` (the
    ``.npz`` branch routes through the same gen_params merge as a native
    orbax dir, including post_quant_conv widening)."""
    def field(obj, name):
        if isinstance(obj, dict):
            return obj.get(name)
        return getattr(obj, name, None)

    tree = {"state": {
        "gen_params": field(state, "gen_params"),
        "disc_params": field(state, "disc_params") or {},
        "disc_batch_stats": field(state, "disc_batch_stats") or {},
        "loss_vars": field(state, "loss_vars") or {},
        "step": np.asarray(field(state, "step") or 0),
    }}
    np.savez_compressed(path, **_flatten(tree))
    return path


def load_compact(path: str) -> dict:
    """Returns the nested {state, frozen} dict (float32 restored)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten(flat)
