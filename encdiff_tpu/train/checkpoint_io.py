"""Checkpoint loading helpers for analysis scripts.

Bridges the Trainer's orbax layout ({state, frozen} pytree, written by
``harness.Trainer.save_checkpoint``) and reference torch ``.ckpt`` files
(via ``core.torch_ldm_import``) into the flat ``variables`` dict the
sampling/eval code consumes ({unet, cond, first_stage, ema}).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def load_model_variables(model, path: str) -> tuple[dict, float]:
    """Returns (variables, scale_factor). ``path`` is either a native orbax
    checkpoint directory or a torch .ckpt file."""
    if os.path.isfile(path) and path.endswith(".npz"):
        from encdiff_tpu.core.compact_ckpt import load_compact

        tree = load_compact(path)
        state, frozen = tree["state"], tree["frozen"]
        ema = state.get("ema")
        variables = {
            "unet": {"params": state["params"]["unet"]},
            "cond": {"params": state["params"]["cond"],
                     "batch_stats": state.get("batch_stats") or {}},
            "first_stage": frozen["first_stage"],
            "ema": ema["params"] if isinstance(ema, dict) else None,
        }
        return variables, float(np.asarray(state["scale_factor"]))

    if os.path.isfile(path) and path.endswith(".ckpt"):
        from encdiff_tpu.core.torch_ldm_import import load_torch_ldm_checkpoint

        init = model.init_variables(jax.random.PRNGKey(0))
        variables = load_torch_ldm_checkpoint(model, init, path)
        out = {
            "unet": variables["unet"],
            "cond": variables.get("cond"),
            "first_stage": variables.get("first_stage"),
            "ema": None,
        }
        return out, float(model.scale_factor)

    from encdiff_tpu.core.checkpoints import restore_pytree

    # Restore WITHOUT an abstract target tree: eval scripts only need the
    # model subtrees, and reconstructing the optimizer to build a target
    # breaks whenever the run's optimizer topology differs from the default
    # (e.g. accumulate_grad_batches wraps AdamW in optax.MultiSteps, whose
    # opt_state has a different pytree structure). Orbax reconstructs the
    # saved topology from its own metadata; NamedTuples (TrainState,
    # MultiStepsState) come back as dicts keyed by field name.
    tree = restore_pytree(os.path.abspath(path))
    state = tree["state"]
    frozen = tree["frozen"]
    ema = state.get("ema")
    variables = {
        "unet": {"params": state["params"]["unet"]},
        "cond": {"params": state["params"]["cond"],
                 "batch_stats": state.get("batch_stats") or {}},
        "first_stage": frozen["first_stage"],
        "ema": ema["params"] if isinstance(ema, dict) else None,
    }
    return variables, float(np.asarray(state["scale_factor"]))
