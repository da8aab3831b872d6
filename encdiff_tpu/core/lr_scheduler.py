"""LR-multiplier schedules (parity with ``ldm/lr_scheduler.py:4-98``).

Each scheduler is a callable ``f(step) -> multiplier`` on a base LR of 1.0.
``as_optax_schedule`` adapts any of them into an optax schedule usable inside
a jitted train step: for the piecewise-linear/cosine forms used by the
reference configs we emit a closed-form jnp expression (single cycle), and
fall back to a host-precomputed table lookup for multi-cycle configs.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class LambdaWarmUpCosineScheduler:
    """Linear warmup then single cosine decay (``lr_scheduler.py:4-33``)."""

    def __init__(self, warm_up_steps, lr_min, lr_max, lr_start,
                 max_decay_steps, verbosity_interval=0):
        self.lr_warm_up_steps = warm_up_steps
        self.lr_start = lr_start
        self.lr_min = lr_min
        self.lr_max = lr_max
        self.lr_max_decay_steps = max_decay_steps
        del verbosity_interval

    def schedule(self, n, **kwargs):
        if n < self.lr_warm_up_steps:
            return ((self.lr_max - self.lr_start) / self.lr_warm_up_steps * n
                    + self.lr_start)
        t = min((n - self.lr_warm_up_steps)
                / (self.lr_max_decay_steps - self.lr_warm_up_steps), 1.0)
        return self.lr_min + 0.5 * (self.lr_max - self.lr_min) * (
            1 + np.cos(t * np.pi))

    def __call__(self, n, **kwargs):
        return self.schedule(n, **kwargs)


class LambdaWarmUpCosineScheduler2:
    """Multi-cycle warmup+cosine (``lr_scheduler.py:36-80``)."""

    def __init__(self, warm_up_steps, f_min, f_max, f_start, cycle_lengths,
                 verbosity_interval=0):
        assert (len(warm_up_steps) == len(f_min) == len(f_max)
                == len(f_start) == len(cycle_lengths))
        self.lr_warm_up_steps = list(warm_up_steps)
        self.f_start = list(f_start)
        self.f_min = list(f_min)
        self.f_max = list(f_max)
        self.cycle_lengths = list(cycle_lengths)
        self.cum_cycles = np.cumsum([0] + list(self.cycle_lengths))
        del verbosity_interval

    def find_in_interval(self, n):
        interval = 0
        for cl in self.cum_cycles[1:]:
            if n <= cl:
                return interval
            interval += 1
        return max(len(self.cycle_lengths) - 1, 0)

    def _decay(self, cycle, n):
        t = min((n - self.lr_warm_up_steps[cycle])
                / (self.cycle_lengths[cycle] - self.lr_warm_up_steps[cycle]), 1.0)
        return self.f_min[cycle] + 0.5 * (self.f_max[cycle] - self.f_min[cycle]) * (
            1 + np.cos(t * np.pi))

    def schedule(self, n, **kwargs):
        cycle = self.find_in_interval(n)
        n = n - self.cum_cycles[cycle]
        if n < self.lr_warm_up_steps[cycle]:
            return ((self.f_max[cycle] - self.f_start[cycle])
                    / self.lr_warm_up_steps[cycle] * n + self.f_start[cycle])
        return self._decay(cycle, n)

    def __call__(self, n, **kwargs):
        return self.schedule(n, **kwargs)


class LambdaLinearScheduler(LambdaWarmUpCosineScheduler2):
    """Linear warmup then linear decay over the cycle
    (``lr_scheduler.py:83-98``) — the scheduler used by every EncDiff LDM
    config."""

    def _decay(self, cycle, n):
        return self.f_min[cycle] + (self.f_max[cycle] - self.f_min[cycle]) * (
            self.cycle_lengths[cycle] - n) / self.cycle_lengths[cycle]


def as_optax_schedule(sched, base_lr: float):
    """Adapt a scheduler object into an optax schedule fn(step)->lr.

    Emits a traced jnp expression for single-cycle LambdaLinearScheduler
    (the flagship config: warmup 10k, cycle 1e13), so the whole train step
    stays jittable with no host callback.
    """
    if isinstance(sched, LambdaLinearScheduler) and len(sched.cycle_lengths) == 1:
        warm = float(sched.lr_warm_up_steps[0])
        f_start, f_max, f_min = (float(sched.f_start[0]), float(sched.f_max[0]),
                                 float(sched.f_min[0]))
        cycle = float(sched.cycle_lengths[0])

        def schedule(step):
            step = jnp.asarray(step, jnp.float32)
            warm_f = (f_max - f_start) / warm * step + f_start
            decay_f = f_min + (f_max - f_min) * (cycle - step) / cycle
            return base_lr * jnp.where(step < warm, warm_f, decay_f)

        return schedule

    if isinstance(sched, LambdaWarmUpCosineScheduler2) and len(sched.cycle_lengths) == 1:
        warm = float(sched.lr_warm_up_steps[0])
        f_start, f_max, f_min = (float(sched.f_start[0]), float(sched.f_max[0]),
                                 float(sched.f_min[0]))
        cycle = float(sched.cycle_lengths[0])

        def schedule(step):
            step = jnp.asarray(step, jnp.float32)
            warm_f = (f_max - f_start) / warm * step + f_start
            t = jnp.minimum((step - warm) / (cycle - warm), 1.0)
            decay_f = f_min + 0.5 * (f_max - f_min) * (1 + jnp.cos(t * jnp.pi))
            return base_lr * jnp.where(step < warm, warm_f, decay_f)

        return schedule

    # Generic fallback: precompute a table on host; clamp lookups at the end.
    horizon = 2_000_000
    table = jnp.asarray(
        np.array([sched(n) for n in range(0, horizon, 100)], dtype=np.float32))

    def schedule(step):
        idx = jnp.minimum(jnp.asarray(step) // 100, table.shape[0] - 1)
        return base_lr * table[idx]

    return schedule
