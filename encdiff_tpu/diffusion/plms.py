"""PLMS (pseudo linear multistep) sampler as one ``lax.scan``.

Rebuild of ``ldm/models/diffusion/plms.py`` (PLMSSampler:11-236): the
Adams-Bashforth multistep eps-combination (`:219-232`) is expressed with a
fixed-size carry of the last 3 eps predictions plus a step counter —
``lax.switch`` picks the 1st/2nd/3rd/4th-order formula, so the whole chain
compiles to a single scan (no Python-list ``old_eps``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from encdiff_tpu.core.schedules import DDIMSchedule


def plms_sample(
    dsched: DDIMSchedule,
    denoise_fn: Callable,  # (x, t_batch) -> eps
    shape,
    rng,
    x_T=None,
    temperature: float = 1.0,
):
    """Sample via S PLMS steps (eta=0 deterministic updates, plms.py:199-216)."""
    b = shape[0]
    if x_T is None:
        rng, init_rng = jax.random.split(rng)
        img0 = jax.random.normal(init_rng, shape, jnp.float32)
    else:
        img0 = x_T

    steps = jnp.asarray(dsched.timesteps)[::-1]
    steps_next = jnp.concatenate([steps[1:], jnp.zeros((1,), steps.dtype)])
    a_t = jnp.asarray(dsched.alphas)[::-1]
    a_prev = jnp.asarray(dsched.alphas_prev)[::-1]
    som = jnp.asarray(dsched.sqrt_one_minus_alphas)[::-1]

    def x_prev_from(e_t, img, at, aprev, somt):
        pred_x0 = (img - somt * e_t) / jnp.sqrt(at)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - aprev, 0.0)) * e_t
        return jnp.sqrt(aprev) * pred_x0 + dir_xt

    def step(carry, inp):
        img, eps_hist, n_hist = carry  # eps_hist: (3, *shape), newest first
        t, t_next, at, aprev, somt = inp
        t_b = jnp.full((b,), t, jnp.int32)
        e_t = denoise_fn(img, t_b).astype(jnp.float32)

        def order1():
            # first step: midpoint correction with a second model call
            x_prev = x_prev_from(e_t, img, at, aprev, somt)
            e_t_next = denoise_fn(x_prev, jnp.full((b,), t_next, jnp.int32))
            return (e_t + e_t_next.astype(jnp.float32)) / 2

        def order2():
            return (3 * e_t - eps_hist[0]) / 2

        def order3():
            return (23 * e_t - 16 * eps_hist[0] + 5 * eps_hist[1]) / 12

        def order4():
            return (55 * e_t - 59 * eps_hist[0] + 37 * eps_hist[1]
                    - 9 * eps_hist[2]) / 24

        e_t_prime = jax.lax.switch(jnp.minimum(n_hist, 3),
                                   [order1, order2, order3, order4])
        img = x_prev_from(e_t_prime, img, at, aprev, somt)
        eps_hist = jnp.concatenate([e_t[None], eps_hist[:2]], axis=0)
        return (img, eps_hist, n_hist + 1), None

    hist0 = jnp.zeros((3,) + tuple(shape), jnp.float32)
    (img, _, _), _ = jax.lax.scan(
        step, (img0, hist0, jnp.int32(0)),
        (steps, steps_next, a_t, a_prev, som))
    del temperature
    return img
