"""Native (C++) host-runtime components.

``fast_gather``: threaded batch row-gather feeding the device prefetch
(built on demand from ``fast_gather.cpp``; transparent numpy fallback when
no compiler is available). The build is a single translation unit compiled
with the running interpreter's headers — no pybind11 needed.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
from typing import Any

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_fast_gather.so")
_mod = None
_build_failed = False


def _try_build() -> None:
    global _build_failed
    if os.path.exists(_SO):
        return
    src = os.path.join(_HERE, "fast_gather.cpp")
    include = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           f"-I{include}", src, "-o", _SO, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception as e:  # no compiler / failed build -> numpy fallback
        _build_failed = True
        sys.stderr.write(f"[encdiff_tpu.native] build failed ({e}); "
                         "using numpy fallback\n")


def _load():
    global _mod
    if _mod is not None or _build_failed:
        return _mod
    _try_build()
    if os.path.exists(_SO):
        import importlib.util

        spec = importlib.util.spec_from_file_location("_fast_gather", _SO)
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        _mod = m
    return _mod


def fast_gather(src: np.ndarray, indices: np.ndarray,
                num_threads: int = 0) -> np.ndarray:
    """dst[i] = src[indices[i]] with a threaded row-wise memcpy.

    src: C-contiguous (N, ...) array; indices: (B,) integer array.
    Falls back to numpy fancy indexing if the extension is unavailable.
    """
    m = _load()
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    if m is None:
        return src[idx]
    out = m.fast_gather(src, idx, num_threads=num_threads)
    return np.frombuffer(out, dtype=src.dtype).reshape(
        (len(idx),) + src.shape[1:])
