"""Device mesh + sharding utilities: the TPU-native replacement for the
reference's Lightning-DDP/NCCL distributed story (``main_val.py:656-660``,
SURVEY.md §2.4).

The reference's only parallelism is data-parallel (one process per GPU,
NCCL all-reduce inserted by Lightning). Here the equivalent is GSPMD: a
``jax.sharding.Mesh`` over the ICI fabric, the global batch sharded over the
``data`` axis, parameters replicated (or sharded over ``model`` for tensor
parallelism of the attention/dense blocks at larger scale), and XLA inserting
the gradient all-reduce automatically because the output shardings demand
replicated grads. No explicit collectives appear in model code.

Axes:
- ``data``  — batch-dimension sharding (DP). Required for parity.
- ``model`` — optional tensor-parallel axis for Dense/attention-head sharding
  (ABSENT in the reference; provided for >1-chip-per-replica scaling).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices: Sequence[Any] | None = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    With defaults, all devices go to the ``data`` axis — the configuration
    that reproduces the reference's DDP semantics on a TPU slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch (pytree of arrays with leading batch dim) onto the
    mesh, sharded over the ``data`` axis."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape["data"]
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by data-parallel size {n}")
    return global_batch // n
