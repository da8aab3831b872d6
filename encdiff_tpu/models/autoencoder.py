"""First-stage autoencoders: VQ-VAE (with the fork's disentangled-concat
decode) and KL-VAE.

TPU-native rebuild of ``ldm/models/autoencoder.py`` (VQModel:20,
VQModelInterface:308-369, AutoencoderKL:372, IdentityFirstStage:513). The
reference classes are LightningModules mixing architecture, training logic
and checkpoint surgery; here they split into
- ``VQVAE`` / ``KLVAE``: pure flax modules (the compute graph), and
- ``VQModel`` / ``VQModelInterface`` / ``AutoencoderKL``: thin orchestrators
  with the reference's constructor surface (so ``instantiate_from_config``
  on reference YAML works verbatim), parameter init, and torch-checkpoint
  ingestion incl. the post_quant_conv widening surgery
  (``autoencoder.py:91-137``).

The fork's ``use_disentangled_concat`` decode semantics are preserved
exactly (``autoencoder.py:328-369``): the 20 scalars broadcast to (B,H,W,20)
and concatenate onto the quantized latent before post_quant_conv; when no
representation is supplied the concat channels are zero-filled (deliberate
reconstruction-without-factors semantics, SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from encdiff_tpu.core.distributions import DiagonalGaussianDistribution
from encdiff_tpu.nn.layers import Dtype, TorchConv
from encdiff_tpu.nn.quantize import VectorQuantizer
from encdiff_tpu.nn.vae import Decoder, Encoder


def _ddconfig_fields(ddconfig: dict) -> dict:
    """Normalize a reference ddconfig dict into hashable module kwargs."""
    d = dict(ddconfig)
    d["ch_mult"] = tuple(d.get("ch_mult", (1, 2, 4, 8)))
    d["attn_resolutions"] = tuple(d.get("attn_resolutions", ()) or ())
    return d


class VQVAE(nn.Module):
    """Encoder -> quant_conv -> VectorQuantizer -> [concat u] ->
    post_quant_conv -> Decoder."""

    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    in_channels: int
    resolution: int
    z_channels: int
    out_ch: int
    n_embed: int
    embed_dim: int
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    double_z: bool = False
    use_disentangled_concat: bool = False
    disentangled_dim: int = 0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            in_channels=self.in_channels, resolution=self.resolution,
            z_channels=self.z_channels, out_ch=self.out_ch,
            attn_resolutions=self.attn_resolutions, dropout=self.dropout,
            resamp_with_conv=self.resamp_with_conv, double_z=self.double_z,
            dtype=self.dtype)
        self.decoder = Decoder(
            ch=self.ch, out_ch=self.out_ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks, in_channels=self.in_channels,
            resolution=self.resolution, z_channels=self.z_channels,
            attn_resolutions=self.attn_resolutions, dropout=self.dropout,
            resamp_with_conv=self.resamp_with_conv, dtype=self.dtype)
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim, beta=0.25,
                                        dtype=self.dtype)
        self.quant_conv = TorchConv(self.embed_dim, 1, dtype=self.dtype,
                                    name="quant_conv")
        self.post_quant_conv = TorchConv(self.z_channels, 1, dtype=self.dtype,
                                         name="post_quant_conv")

    def encode_pre_quant(self, x):
        """VQModelInterface.encode (autoencoder.py:313-316): NO quantization —
        the LDM diffuses the continuous pre-quant latent."""
        return self.quant_conv(self.encoder(x))

    def encode(self, x):
        h = self.encode_pre_quant(x)
        quant, emb_loss, info = self.quantize(h)
        return quant, emb_loss, info

    def _concat_and_decode(self, quant, disentangled_repr):
        if self.use_disentangled_concat:
            b, hh, ww, _ = quant.shape
            if disentangled_repr is None:
                s = jnp.zeros((b, hh, ww, self.disentangled_dim), quant.dtype)
            else:
                s = jnp.broadcast_to(
                    disentangled_repr[:, None, None, :].astype(quant.dtype),
                    (b, hh, ww, disentangled_repr.shape[-1]))
            quant = jnp.concatenate([quant, s], axis=-1)
        return self.decoder(self.post_quant_conv(quant))

    def decode(self, h, force_not_quantize: bool = False,
               disentangled_repr=None):
        """autoencoder.py:328-369 decode semantics."""
        if not force_not_quantize:
            quant, _, _ = self.quantize(h)
        else:
            quant = h
        return self._concat_and_decode(quant, disentangled_repr)

    def decode_code(self, code):
        quant = self.quantize.get_codebook_entry(code)
        return self._concat_and_decode(quant, None)

    def __call__(self, x, disentangled_repr=None, return_pred_indices: bool = False):
        quant, diff, (_, _, ind) = self.encode(x)
        dec = self._concat_and_decode(quant, disentangled_repr)
        if return_pred_indices:
            return dec, diff, ind
        return dec, diff


class KLVAE(nn.Module):
    """AutoencoderKL compute graph (autoencoder.py:372-478)."""

    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    in_channels: int
    resolution: int
    z_channels: int
    out_ch: int
    embed_dim: int
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    double_z: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        assert self.double_z
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            in_channels=self.in_channels, resolution=self.resolution,
            z_channels=self.z_channels, out_ch=self.out_ch,
            attn_resolutions=self.attn_resolutions, dropout=self.dropout,
            resamp_with_conv=self.resamp_with_conv, double_z=True,
            dtype=self.dtype)
        self.decoder = Decoder(
            ch=self.ch, out_ch=self.out_ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks, in_channels=self.in_channels,
            resolution=self.resolution, z_channels=self.z_channels,
            attn_resolutions=self.attn_resolutions, dropout=self.dropout,
            resamp_with_conv=self.resamp_with_conv, dtype=self.dtype)
        self.quant_conv = TorchConv(2 * self.embed_dim, 1, dtype=self.dtype,
                                    name="quant_conv")
        self.post_quant_conv = TorchConv(self.z_channels, 1, dtype=self.dtype,
                                         name="post_quant_conv")

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x))
        return DiagonalGaussianDistribution(moments)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None, sample_posterior: bool = True):
        posterior = self.encode(x)
        if sample_posterior and rng is not None:
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        return self.decode(z), posterior


class VQModel:
    """Orchestrator with the reference VQModel constructor surface
    (autoencoder.py:20-74). Holds the flax module + optional loss config;
    the GAN training step lives in ``encdiff_tpu.train.vq_trainer``."""

    is_interface = False

    def __init__(self, ddconfig, lossconfig=None, n_embed=2048, embed_dim=3,
                 ckpt_path=None, ignore_keys=(), image_key="image",
                 colorize_nlabels=None, monitor=None, batch_resize_range=None,
                 scheduler_config=None, lr_g_factor=1.0, remap=None,
                 sane_index_shape=False, use_ema=False,
                 use_disentangled_concat=False, disentangled_dim=0,
                 dtype=jnp.float32):
        from encdiff_tpu.nn.layers import as_dtype
        dtype = as_dtype(dtype)
        del remap, sane_index_shape, colorize_nlabels, batch_resize_range
        self.ddconfig = dict(ddconfig)
        self.lossconfig = lossconfig
        self.n_embed = n_embed
        self.embed_dim = embed_dim
        self.image_key = image_key
        self.monitor = monitor
        self.scheduler_config = scheduler_config
        self.lr_g_factor = lr_g_factor
        self.use_ema = use_ema
        self.ckpt_path = ckpt_path
        self.ignore_keys = tuple(ignore_keys)
        self.use_disentangled_concat = use_disentangled_concat
        self.disentangled_dim = disentangled_dim
        fields = _ddconfig_fields(ddconfig)
        self.module = VQVAE(
            ch=fields["ch"], ch_mult=fields["ch_mult"],
            num_res_blocks=fields["num_res_blocks"],
            in_channels=fields["in_channels"], resolution=fields["resolution"],
            z_channels=fields["z_channels"], out_ch=fields["out_ch"],
            n_embed=n_embed, embed_dim=embed_dim,
            attn_resolutions=fields["attn_resolutions"],
            dropout=fields.get("dropout", 0.0),
            double_z=fields.get("double_z", False),
            use_disentangled_concat=use_disentangled_concat,
            disentangled_dim=disentangled_dim, dtype=dtype)
        self.loss = None
        if lossconfig is not None:
            from encdiff_tpu.core.config import instantiate_from_config
            self.loss = instantiate_from_config(lossconfig)

    # --- parameter lifecycle -------------------------------------------------
    def init_variables(self, rng, batch_size: int = 1):
        res = self.ddconfig["resolution"]
        x = jnp.zeros((batch_size, res, res, self.ddconfig["in_channels"]),
                      jnp.float32)
        variables = self.module.init(rng, x)
        if self.ckpt_path is not None:
            variables = self.load_reference_checkpoint(variables, self.ckpt_path)
        return variables

    def load_reference_checkpoint(self, variables, path):
        """Ingest a checkpoint: torch Lightning ``.ckpt`` (incl.
        post_quant_conv widening, autoencoder.py:91-137) or a native orbax
        directory written by the VQ-GAN trainer."""
        import os

        if os.path.isdir(path) or path.endswith(".npz"):
            return self._load_native_checkpoint(variables, path)
        from encdiff_tpu.core.checkpoints import load_torch_vq_checkpoint
        return load_torch_vq_checkpoint(
            variables, path, ignore_keys=self.ignore_keys,
            use_disentangled_concat=self.use_disentangled_concat)

    def _load_native_checkpoint(self, variables, path):
        """Restore gen_params from an orbax VQTrainState dir; widens
        post_quant_conv for disentangled-concat interfaces like the torch
        surgery path."""
        import os

        import numpy as np

        if path.endswith(".npz"):
            from encdiff_tpu.core.compact_ckpt import load_compact
            tree = load_compact(path)
        else:
            from encdiff_tpu.core.checkpoints import restore_pytree
            tree = restore_pytree(os.path.abspath(path), None)
        state = tree.get("state", tree)
        gen = state["gen_params"] if "gen_params" in state else state
        params = jax.tree.map(np.asarray, dict(variables["params"]))

        def merge(dst, src, prefix=()):
            for k, v in src.items():
                if isinstance(v, dict):
                    merge(dst.setdefault(k, {}), v, prefix + (k,))
                else:
                    cur = dst.get(k)
                    if cur is not None and np.shape(cur) != np.shape(v):
                        # post_quant_conv widening: keep loaded input rows,
                        # leave the extra concat channels at their init
                        if k == "kernel" and np.shape(cur)[2] > np.shape(v)[2]:
                            cur = np.array(cur)
                            cur[:, :, : np.shape(v)[2], :] = v
                            dst[k] = cur
                            continue
                        raise ValueError(
                            f"shape mismatch at {'/'.join(prefix + (k,))}: "
                            f"{np.shape(v)} vs {np.shape(cur)}")
                    dst[k] = np.asarray(v)

        merge(params, jax.tree.map(np.asarray, gen))
        out = dict(variables)
        out["params"] = jax.tree.map(jnp.asarray, params)
        return out

    # --- functional forward helpers -----------------------------------------
    def encode(self, variables, x):
        return self.module.apply(variables, x, method=VQVAE.encode)

    def decode(self, variables, h, force_not_quantize=False,
               disentangled_repr=None):
        return self.module.apply(
            variables, h, force_not_quantize, disentangled_repr,
            method=VQVAE.decode)

    def reconstruct(self, variables, x, disentangled_repr=None):
        dec, _ = self.module.apply(variables, x, disentangled_repr)
        return dec


class VQModelInterface(VQModel):
    """encode() skips quantization; decode() quantizes unless forced
    (autoencoder.py:308-369) — the first-stage wrapper used by EncDiff."""

    is_interface = True

    def encode(self, variables, x):
        return self.module.apply(variables, x, method=VQVAE.encode_pre_quant)


class AutoencoderKL:
    """Reference AutoencoderKL surface (autoencoder.py:372-478)."""

    def __init__(self, ddconfig, lossconfig=None, embed_dim=4, ckpt_path=None,
                 ignore_keys=(), image_key="image", colorize_nlabels=None,
                 monitor=None, dtype=jnp.float32):
        from encdiff_tpu.nn.layers import as_dtype
        dtype = as_dtype(dtype)
        del colorize_nlabels
        self.ddconfig = dict(ddconfig)
        self.embed_dim = embed_dim
        self.image_key = image_key
        self.monitor = monitor
        self.ckpt_path = ckpt_path
        self.ignore_keys = tuple(ignore_keys)
        fields = _ddconfig_fields(ddconfig)
        self.module = KLVAE(
            ch=fields["ch"], ch_mult=fields["ch_mult"],
            num_res_blocks=fields["num_res_blocks"],
            in_channels=fields["in_channels"], resolution=fields["resolution"],
            z_channels=fields["z_channels"], out_ch=fields["out_ch"],
            embed_dim=embed_dim,
            attn_resolutions=fields["attn_resolutions"],
            dropout=fields.get("dropout", 0.0),
            double_z=fields.get("double_z", True), dtype=dtype)
        self.loss = None
        if lossconfig is not None:
            from encdiff_tpu.core.config import instantiate_from_config
            self.loss = instantiate_from_config(lossconfig)

    def init_variables(self, rng, batch_size: int = 1):
        res = self.ddconfig["resolution"]
        x = jnp.zeros((batch_size, res, res, self.ddconfig["in_channels"]),
                      jnp.float32)
        variables = self.module.init(rng, x)
        if self.ckpt_path is not None:
            from encdiff_tpu.core.checkpoints import load_torch_vq_checkpoint
            variables = load_torch_vq_checkpoint(
                variables, self.ckpt_path, ignore_keys=self.ignore_keys)
        return variables

    def encode(self, variables, x):
        return self.module.apply(variables, x, method=KLVAE.encode)

    def decode(self, variables, z):
        return self.module.apply(variables, z, method=KLVAE.decode)


class IdentityFirstStage:
    """Pass-through first stage (autoencoder.py:513-531)."""

    is_interface = False

    def __init__(self, *args, vq_interface=False, **kwargs):
        self.vq_interface = vq_interface
        self.module = None

    def init_variables(self, rng, batch_size: int = 1):
        return {}

    def encode(self, variables, x):
        return x

    def decode(self, variables, x, *args, **kwargs):
        return x
