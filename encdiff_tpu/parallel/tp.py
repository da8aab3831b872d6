"""Tensor-parallel sharding rules for the UNet's attention blocks.

The reference has NO tensor parallelism (SURVEY.md §2.4: DP only); this is
the TPU-native scaling extension for >1-chip-per-replica meshes: classic
Megatron attention sharding expressed purely as GSPMD layout constraints —
q/k/v projections column-parallel (heads split over the ``model`` axis),
the output projection row-parallel (XLA inserts the partial-sum
all-reduce). No model code changes: the rules are applied as
``NamedSharding`` trees over the TrainState, and because optimizer moments
and the EMA mirror the param tree, the same path-based matcher shards them
identically.

Softmax/attention math stays exact: each model-shard owns a contiguous
slice of heads (the head axis is embarrassingly parallel), and GSPMD
propagates the sharding through reshape/transpose/einsum.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_names(path) -> list[str]:
    out = []
    for k in path:
        name = getattr(k, "key", None)
        if name is None:
            name = getattr(k, "name", None)
        if name is None:
            name = str(k)
        out.append(str(name))
    return out


def _spec_for(path, leaf) -> P:
    names = _path_names(path)
    joined = "/".join(names)
    ndim = getattr(leaf, "ndim", 0)
    # column-parallel qkv: kernel (in, heads*dh) -> split output dim
    if any(f"{p}/Dense_0/kernel" in joined for p in ("to_q", "to_k", "to_v")) \
            and ndim == 2:
        return P(None, "model")
    if any(f"{p}/Dense_0/bias" in joined for p in ("to_q", "to_k", "to_v")) \
            and ndim == 1:
        return P("model")
    # row-parallel output projection: kernel (heads*dh, out) -> split input
    # dim; bias replicated (added after the all-reduce)
    if "to_out/Dense_0/kernel" in joined and ndim == 2:
        return P("model", None)
    return P()


def tp_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for a TrainState (or any pytree containing the
    UNet param names — optimizer moments and EMA included by construction)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    specs = [NamedSharding(mesh, _spec_for(p, leaf)) for p, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, specs)


def has_model_axis(mesh: Mesh) -> bool:
    return "model" in mesh.shape and mesh.shape["model"] > 1
