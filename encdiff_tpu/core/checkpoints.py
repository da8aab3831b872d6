"""Checkpointing: orbax for native state + torch-checkpoint ingestion.

Native checkpoints use orbax (pytree save/restore). For parity with the
reference ecosystem, this module can also ingest PyTorch-Lightning ``.ckpt``
state_dicts produced by the reference repo and convert them into this
package's flax parameter trees, including the reference's checkpoint
surgery: post_quant_conv widening with Xavier init of the new channels
(``ldm/models/autoencoder.py:91-137``) and strict=False partial loads with
reported missing/unexpected keys (``ddpm_enc.py:204-220``).

Layout conversions torch -> flax/NHWC:
- Conv2d weight (O,I,kh,kw)  -> kernel (kh,kw,I,O)
- Linear weight (O,I)        -> kernel (I,O)
- GroupNorm/BatchNorm weight/bias -> scale/bias
- Encoder4's flatten-Linear columns are permuted CHW -> HWC.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# orbax native checkpoints
# --------------------------------------------------------------------------

def save_pytree(path, tree) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def restore_pytree(path, abstract_tree=None):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract_tree)


# --------------------------------------------------------------------------
# torch state_dict ingestion
# --------------------------------------------------------------------------

def load_torch_state_dict(path) -> dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()
            if hasattr(v, "detach")}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = jnp.asarray(value)


def _xavier_uniform(rng: np.random.RandomState, shape) -> np.ndarray:
    fan_out, fan_in = shape[0], int(np.prod(shape[1:]))
    bound = np.sqrt(6.0 / (fan_in + fan_out))
    return rng.uniform(-bound, bound, size=shape).astype(np.float32)


def widen_post_quant_conv(sd: dict[str, np.ndarray], new_in: int,
                          key: str = "post_quant_conv.weight",
                          seed: int = 0) -> dict[str, np.ndarray]:
    """Reference post_quant_conv widening (autoencoder.py:106-124): keep old
    input channels, Xavier-init the appended disentangled channels."""
    if key not in sd:
        return sd
    old = sd[key]  # (z, e, 1, 1)
    if old.shape[1] == new_in:
        return sd
    rng = np.random.RandomState(seed)
    new = _xavier_uniform(rng, (old.shape[0], new_in, 1, 1))
    new[:, : old.shape[1]] = old
    out = dict(sd)
    out[key] = new
    return out


# ---- VAE (CompVis Encoder/Decoder + VQ) name mapping ---------------------

def _map_vae_tower(prefix: str, key: str) -> tuple[str, ...] | None:
    """Map e.g. `down.0.block.1.norm1` -> (down_0_block_1, norm1)."""
    m = re.match(r"down\.(\d+)\.block\.(\d+)\.(.*)", key)
    if m:
        return (f"down_{m.group(1)}_block_{m.group(2)}",) + tuple(m.group(3).split("."))
    m = re.match(r"down\.(\d+)\.attn\.(\d+)\.(.*)", key)
    if m:
        return (f"down_{m.group(1)}_attn_{m.group(2)}",) + tuple(m.group(3).split("."))
    m = re.match(r"down\.(\d+)\.downsample\.conv\.?(.*)", key)
    if m:
        rest = tuple(m.group(2).split(".")) if m.group(2) else ()
        return (f"down_{m.group(1)}_downsample", "conv") + rest
    m = re.match(r"up\.(\d+)\.block\.(\d+)\.(.*)", key)
    if m:
        return (f"up_{m.group(1)}_block_{m.group(2)}",) + tuple(m.group(3).split("."))
    m = re.match(r"up\.(\d+)\.attn\.(\d+)\.(.*)", key)
    if m:
        return (f"up_{m.group(1)}_attn_{m.group(2)}",) + tuple(m.group(3).split("."))
    m = re.match(r"up\.(\d+)\.upsample\.conv\.?(.*)", key)
    if m:
        rest = tuple(m.group(2).split(".")) if m.group(2) else ()
        return (f"up_{m.group(1)}_upsample", "conv") + rest
    m = re.match(r"mid\.(block_\d|attn_\d)\.(.*)", key)
    if m:
        return (f"mid_{m.group(1)}",) + tuple(m.group(2).split("."))
    for simple in ("conv_in", "conv_out", "norm_out"):
        if key == simple:
            return (simple,)
        if key.startswith(simple + "."):
            return (simple,) + tuple(key[len(simple) + 1:].split("."))
    return None


def _convert_leaf(path: tuple[str, ...], pname: str, val: np.ndarray,
                  out_params: dict, out_stats: dict):
    """Write a (sub-path, torch-param-name, tensor) into flax params/stats.

    flax inner-module naming: TorchConv wraps an anonymous nn.Conv (Conv_0),
    GroupNorm wraps GroupNorm_0; BatchNorm layers are named directly.
    """
    if pname == "weight":
        if val.ndim == 4:
            _set(out_params, path + ("Conv_0", "kernel"), _conv_kernel(val))
        elif val.ndim == 2:
            _set(out_params, path + ("Dense_0", "kernel"), val.T)
        elif val.ndim == 1:  # norm scale
            _set(out_params, path + ("GroupNorm_0", "scale"), val)
        else:
            raise ValueError(f"unhandled weight shape {val.shape} at {path}")
    elif pname == "bias":
        if path and "norm" in path[-1]:
            _set(out_params, path + ("GroupNorm_0", "bias"), val)
        else:
            # conv or dense bias: attach to the wrapped module
            _set(out_params, path + ("Conv_0", "bias"), val)
    else:
        raise ValueError(f"unhandled param {pname} at {path}")


def load_torch_vq_checkpoint(variables, path, ignore_keys=(),
                             use_disentangled_concat: bool = False):
    """Convert a reference VQModel .ckpt into our VQVAE variables."""
    sd = load_torch_state_dict(path)
    for k in list(sd):
        if any(k.startswith(ik) for ik in ignore_keys):
            del sd[k]
    return apply_torch_vq_state_dict(
        variables, sd, use_disentangled_concat=use_disentangled_concat)


def apply_torch_vq_state_dict(variables, sd: dict[str, np.ndarray],
                              use_disentangled_concat: bool = False):
    """Pure conversion (state_dict already in memory)."""
    params = jax.tree.map(np.asarray, dict(variables["params"]))
    flat_ref = _flatten(params)

    if use_disentangled_concat:
        pq = flat_ref.get(("post_quant_conv", "Conv_0", "kernel"))
        if pq is not None:
            sd = widen_post_quant_conv(sd, new_in=pq.shape[2])

    new_params: dict = {}
    missing, unexpected = [], []
    for k, v in sd.items():
        if k.startswith("loss."):
            continue
        parts = k.split(".")
        pname = parts[-1]
        body = ".".join(parts[:-1])
        if parts[0] in ("encoder", "decoder"):
            sub = _map_vae_tower(parts[0], ".".join(parts[1:-1]))
            if sub is None:
                unexpected.append(k)
                continue
            tgt = (parts[0],) + sub
        elif body == "quant_conv" or body == "post_quant_conv":
            tgt = (body,)
        elif body == "quantize.embedding":
            _set(new_params, ("quantize", "embedding"), v)
            continue
        else:
            unexpected.append(k)
            continue
        _convert_leaf(tgt, pname, v, new_params, {})

    merged = _merge_with_report(params, new_params, missing)
    out = dict(variables)
    out["params"] = jax.tree.map(jnp.asarray, merged)
    if missing or unexpected:
        print(f"[checkpoints] restored with {len(missing)} missing and "
              f"{len(unexpected)} unexpected keys")
    return out


def _flatten(tree: dict, prefix: tuple = ()) -> dict[tuple, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _merge_with_report(base: dict, updates: dict, missing: list) -> dict:
    flat_base = _flatten(base)
    flat_up = _flatten(updates)
    out = dict(flat_base)
    for k, v in flat_up.items():
        if k in out:
            if tuple(np.shape(v)) != tuple(np.shape(out[k])):
                raise ValueError(
                    f"shape mismatch for {'/'.join(k)}: "
                    f"ckpt {np.shape(v)} vs model {np.shape(out[k])}")
            out[k] = v
    for k in flat_base:
        if k not in flat_up:
            missing.append("/".join(k))
    # unflatten
    tree: dict = {}
    for k, v in out.items():
        _set(tree, k, v)
    return tree
