"""Encoder4: the trainable concept-token encoder.

Rebuild of ``ldm/modules/diffusionmodules/openaimodel_enc.py:969-1049``
(Encoder4 + EncResBlock + View): a small stride-2 CNN maps a (B,64,64,3)
image to ``latent_unit`` scalars, then ``latent_unit`` independent per-factor
"warp" MLPs (1->64->128->context_dim, ELU) lift each scalar into a concept
token.

TPU-first deviations:
- The reference's Python loop over 20 tiny per-unit MLPs
  (``openaimodel_enc.py:1029-1031``) becomes ONE batched einsum over stacked
  weights of shape (U,1,64)/(U,64,128)/(U,128,D) — a single MXU-friendly
  contraction instead of 20 (B,1)x(1,64) GEMMs.
- NHWC; the flatten before the final Linear is HWC-ordered (the torch
  checkpoint converter permutes the corresponding Linear columns).

Architectural quirk preserved faithfully: the third conv block has BatchNorm
but *no* ReLU (``openaimodel_enc.py:1003-1004``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from encdiff_tpu.nn.layers import Dtype, TorchConv, TorchDense, torch_linear_init


class EncResBlock(nn.Module):
    """x + Conv1x1(ReLU( [BN] Conv3x3(ReLU(x)) )) (openaimodel_enc.py:969-989).

    With bn=True the BatchNorm sits between conv1 and the second ReLU,
    mirroring ``layers.insert(2, BatchNorm)``.
    """

    out_channels: int
    mid_channels: int | None = None
    bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        mid = self.mid_channels or self.out_channels
        h = nn.relu(x)
        h = TorchConv(mid, 3, padding=1, dtype=self.dtype, name="conv1")(h)
        if self.bn:
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=jnp.float32, name="bn")(h)
        h = nn.relu(h)
        h = TorchConv(self.out_channels, 1, dtype=self.dtype, name="conv2")(h)
        return x + h


class WarpMLPs(nn.Module):
    """latent_unit independent scalar->token MLPs as one batched einsum.

    Parameters are stacked along a leading unit axis; forward is
    u:(B,U) -> tokens:(B,U,context_dim).
    """

    latent_unit: int
    context_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, u):
        U, D = self.latent_unit, self.context_dim
        p = self.param
        w1 = p("w1", torch_linear_init(1), (U, 1, 64))
        b1 = p("b1", torch_linear_init(1), (U, 64))
        w2 = p("w2", torch_linear_init(64), (U, 64, 128))
        b2 = p("b2", torch_linear_init(64), (U, 128))
        w3 = p("w3", torch_linear_init(128), (U, 128, D))
        b3 = p("b3", torch_linear_init(128), (U, D))

        u = u.astype(self.dtype)
        h = u[:, :, None] * w1[None, :, 0, :].astype(self.dtype) + b1.astype(self.dtype)
        h = jax.nn.elu(h)
        h = jnp.einsum("bud,udk->buk", h, w2.astype(self.dtype),
                       preferred_element_type=jnp.float32).astype(self.dtype)
        h = jax.nn.elu(h + b2.astype(self.dtype))
        h = jnp.einsum("bud,udk->buk", h, w3.astype(self.dtype),
                       preferred_element_type=jnp.float32).astype(self.dtype)
        return h + b3.astype(self.dtype)


class Encoder4(nn.Module):
    """CNN -> latent_unit scalars -> warp MLPs -> concept tokens.

    API parity with the reference:
      __call__(x)  == forward:  (B,64,64,3) -> (B, latent_unit*context_dim)
      encoding(x):              (B,64,64,3) -> (B, latent_unit) raw scalars
      warp(u):                  (B, latent_unit) -> (B, latent_unit*context_dim)
    """

    d: int = 128
    context_dim: int = 16
    latent_unit: int = 20
    bn: bool = True
    num_channels: int = 3
    dtype: Dtype = jnp.float32

    def setup(self):
        mk_bn = lambda name: nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
            param_dtype=jnp.float32, name=name)
        self.conv1 = TorchConv(self.d, 4, stride=2, padding=1,
                               dtype=self.dtype, name="conv1")
        self.bn1 = mk_bn("bn1")
        self.conv2 = TorchConv(self.d, 4, stride=2, padding=1,
                               dtype=self.dtype, name="conv2")
        self.bn2 = mk_bn("bn2")
        self.conv3 = TorchConv(self.d, 4, stride=2, padding=1,
                               dtype=self.dtype, name="conv3")
        self.bn3 = mk_bn("bn3")
        self.conv4 = TorchConv(self.d, 4, stride=2, padding=1,
                               dtype=self.dtype, name="conv4")
        self.bn4 = mk_bn("bn4")
        self.res1 = EncResBlock(self.d, bn=self.bn, dtype=self.dtype, name="res1")
        self.bn5 = mk_bn("bn5")
        self.res2 = EncResBlock(self.d, bn=self.bn, dtype=self.dtype, name="res2")
        self.fc = TorchDense(self.latent_unit, dtype=self.dtype, name="fc")
        self.warp_mlps = WarpMLPs(self.latent_unit, self.context_dim,
                                  dtype=self.dtype, name="warp")

    def encoding(self, x, *, train: bool = False):
        """Raw per-image scalars u in R^{latent_unit}."""
        ra = not train
        h = x.astype(self.dtype)
        h = nn.relu(self.bn1(self.conv1(h), use_running_average=ra))
        h = nn.relu(self.bn2(self.conv2(h), use_running_average=ra))
        h = self.bn3(self.conv3(h), use_running_average=ra)  # no ReLU (:1003)
        h = nn.relu(self.bn4(self.conv4(h), use_running_average=ra))
        h = self.res1(h, train=train)
        h = nn.relu(self.bn5(h, use_running_average=ra))
        h = self.res2(h, train=train)
        h = h.reshape(h.shape[0], -1)  # (B, 4*4*d) HWC-ordered
        return self.fc(h)

    def warp(self, u):
        """Scalars -> flat token vector (B, latent_unit*context_dim)."""
        tokens = self.warp_mlps(u)
        return tokens.reshape(u.shape[0], -1)

    def __call__(self, x, *, train: bool = False):
        return self.warp(self.encoding(x, train=train))
