"""Pytree EMA of model parameters.

TPU-native replacement for ``ldm/modules/ema.py:5-76`` (LitEma): instead of
name-mangled shadow buffers mutated in-place, the EMA state is an immutable
pytree updated functionally inside the jitted train step, and "ema_scope"
becomes simply passing ``ema.params`` to an eval/sample function.

Decay warmup matches the reference: ``min(decay, (1+n)/(10+n))``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: Any            # shadow parameter pytree
    num_updates: jnp.ndarray  # int32 scalar; -1 disables warmup


def init(params: Any, use_num_updates: bool = True) -> EmaState:
    # NB: must COPY, not alias — the shadow tree lives in a donated TrainState
    # next to the params; aliased buffers make XLA reject the donation
    # ("attempt to donate the same buffer twice").
    return EmaState(
        params=jax.tree.map(lambda x: jnp.array(x, copy=True), params),
        num_updates=jnp.asarray(0 if use_num_updates else -1, jnp.int32),
    )


def update(state: EmaState, params: Any, decay: float = 0.9999) -> EmaState:
    """One EMA step: shadow <- shadow - (1-d) * (shadow - param)."""
    n = jnp.where(state.num_updates >= 0, state.num_updates + 1,
                  state.num_updates)
    d = jnp.where(
        n >= 0,
        jnp.minimum(decay, (1.0 + n.astype(jnp.float32)) / (10.0 + n.astype(jnp.float32))),
        jnp.asarray(decay, jnp.float32),
    )
    new_shadow = jax.tree.map(
        lambda s, p: s - (1.0 - d).astype(s.dtype) * (s - p),
        state.params, params)
    return EmaState(params=new_shadow, num_updates=n)
