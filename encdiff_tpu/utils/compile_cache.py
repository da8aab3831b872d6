"""Persistent XLA compilation cache setup, shared by every entry point.

First compiles over the remote-compile tunnel take minutes; training
programs recur across runs (MCL sweeps, control experiments, bench
re-runs), so all entry points enable the persistent cache.

The CPU backend needs a host-scoped directory: XLA:CPU embeds the compile
machine's feature set in the AOT result but does NOT key the cache entry
by it, so a cache written on one box is silently loaded on another and
`cpu_aot_loader` warns about every mismatched feature ("could lead to
execution errors such as SIGILL"). Scoping the CPU cache dir by a
/proc/cpuinfo flags fingerprint makes each host population disjoint.
The accelerator (axon/tpu) cache keeps the flat legacy path so warm
caches from earlier runs stay valid.
"""

from __future__ import annotations

import hashlib
import os

_BASE = os.path.expanduser("~/.cache/jax_comp_cache")


def _host_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "unknown"


def cache_dir() -> str:
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if "cpu" in platforms.split(","):
        return os.path.join(_BASE, f"cpu-{_host_fingerprint()}")
    return _BASE


def enable_persistent_cache(min_compile_secs: int = 5) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
