"""Tracing / profiling / observability utilities.

The reference's story is minimal (SURVEY.md §5: CUDACallback epoch timing,
count_params, thop FLOP counting). The TPU build provides more:

- ``count_params``: parity with ``ldm/util.py:71-75``.
- ``profile_trace``: context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace.
- ``StepTimer``: rolling steps/sec + examples/sec with ``block_until_ready``
  fencing (the BASELINE primary metric).
- ``device_memory_stats``: per-device HBM usage.
- ``flops_estimate``: XLA cost-analysis FLOPs for a jitted fn — replaces
  the reference's thop hook (``openaimodel_enc.py:327-345``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import numpy as np


def count_params(params, verbose: bool = False, name: str = "model") -> int:
    """Total parameter count of a pytree (ldm/util.py:71-75 parity)."""
    total = sum(np.prod(np.shape(p)) for p in jax.tree_util.tree_leaves(params))
    if verbose:
        print(f"{name} has {total * 1e-6:.2f} M params.")
    return int(total)


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace scope (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling throughput meter for jitted train steps."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._last = None

    def tick(self, sync: Any = None):
        if sync is not None:
            jax.block_until_ready(sync)
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return 1.0 / (sum(self._times) / len(self._times))

    def examples_per_sec(self, batch_size: int) -> float:
        return self.steps_per_sec * batch_size


def device_memory_stats() -> dict:
    out = {}
    for d in jax.local_devices():
        try:
            ms = d.memory_stats() or {}
            out[str(d)] = {
                "bytes_in_use": ms.get("bytes_in_use", 0),
                "peak_bytes_in_use": ms.get("peak_bytes_in_use", 0),
            }
        except Exception:
            out[str(d)] = {}
    return out


def flops_estimate(fn: Callable, *example_args) -> float | None:
    """FLOPs of one invocation via XLA cost analysis (replaces the
    reference's thop counting hook)."""
    try:
        lowered = jax.jit(fn).lower(*example_args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None
