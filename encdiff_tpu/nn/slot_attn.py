"""Multi-head slot attention: the alternative concept-token encoder.

TPU-native rebuild of ``ldm/modules/encoders/slot_attn.py``
(MultiHeadSTEVESA:38-173, CartesianPositionalEmbedding:10-30). The
corrector loop stays an unrolled fixed-count loop (3-7 iterations) so flax
submodule calls trace cleanly; the GRU cell is flax's GRUCell applied over
the flattened slot batch.

Input convention is NHWC (the reference takes NCHW; the harness feeds HWC
feature maps directly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from encdiff_tpu.nn.layers import Dtype, TorchConv, TorchDense


class CartesianPositionalEmbedding(nn.Module):
    """x + proj([gx, gy, 1-gx, 1-gy]) positional grid (slot_attn.py:10-30)."""

    channels: int
    image_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        side = self.image_size
        coords = np.linspace(0.0, 1.0, side + 1, dtype=np.float32)
        coords = 0.5 * (coords[:-1] + coords[1:])
        gy, gx = np.meshgrid(coords, coords, indexing="ij")
        pe = np.stack([gx, gy, 1 - gx, 1 - gy], axis=-1)  # (H, W, 4)
        pe = jnp.asarray(pe)[None]
        proj = TorchConv(self.channels, 1, dtype=self.dtype, name="projection")
        return x + proj(pe)


class MultiHeadSTEVESA(nn.Module):
    """Iterative multi-head slot attention (slot_attn.py:38-173)."""

    num_iterations: int
    num_slots: int
    num_heads: int
    input_size: int
    out_size: int
    slot_size: int
    mlp_hidden_size: int
    input_resolution: int
    epsilon: float = 1e-8
    learnable_slot_init: bool = False
    bi_level: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        assert self.slot_size % self.num_heads == 0
        if self.bi_level:
            assert self.learnable_slot_init
        self.pos = CartesianPositionalEmbedding(
            self.input_size, self.input_resolution, dtype=self.dtype)
        self.in_layer_norm = nn.LayerNorm(dtype=jnp.float32)
        self.in_mlp_0 = TorchDense(self.input_size, dtype=self.dtype)
        self.in_mlp_1 = TorchDense(self.input_size, dtype=self.dtype)
        if self.learnable_slot_init:
            self.slot_mu = self.param(
                "slot_mu", nn.initializers.xavier_uniform(),
                (1, self.num_slots, self.slot_size))
        else:
            self.slot_mu = self.param(
                "slot_mu", nn.initializers.xavier_uniform(),
                (1, 1, self.slot_size))
            self.slot_log_sigma = self.param(
                "slot_log_sigma", nn.initializers.xavier_uniform(),
                (1, 1, self.slot_size))
        self.norm_inputs = nn.LayerNorm(dtype=jnp.float32)
        self.norm_slots = nn.LayerNorm(dtype=jnp.float32)
        self.norm_mlp = nn.LayerNorm(dtype=jnp.float32)
        self.project_q = TorchDense(self.slot_size, use_bias=False,
                                    dtype=self.dtype)
        self.project_k = TorchDense(self.slot_size, use_bias=False,
                                    dtype=self.dtype)
        self.project_v = TorchDense(self.slot_size, use_bias=False,
                                    dtype=self.dtype)
        self.gru = nn.GRUCell(features=self.slot_size, dtype=self.dtype,
                              param_dtype=jnp.float32)
        self.mlp_0 = TorchDense(self.mlp_hidden_size, dtype=self.dtype)
        self.mlp_1 = TorchDense(self.slot_size, dtype=self.dtype)
        self.out_layer_norm = nn.LayerNorm(dtype=jnp.float32)
        self.out_linear = TorchDense(self.out_size, dtype=self.dtype)

    def forward_slots(self, inputs, rng=None):
        """inputs: (B, H, W, input_size) -> slots (B, num_slots, slot_size)."""
        b, h, w, _ = inputs.shape
        x = self.pos(inputs)
        x = x.reshape(b, h * w, self.input_size)
        x = self.in_mlp_1(nn.relu(self.in_mlp_0(self.in_layer_norm(x))))

        if self.learnable_slot_init:
            slots = jnp.broadcast_to(self.slot_mu,
                                     (b, self.num_slots, self.slot_size))
        else:
            if rng is None:
                rng = self.make_rng("slots")
            noise = jax.random.normal(
                rng, (b, self.num_slots, self.slot_size), jnp.float32)
            slots = self.slot_mu + jnp.exp(self.slot_log_sigma) * noise

        x = self.norm_inputs(x)
        nh, dh = self.num_heads, self.slot_size // self.num_heads
        k = self.project_k(x).reshape(b, h * w, nh, dh).transpose(0, 2, 1, 3)
        v = self.project_v(x).reshape(b, h * w, nh, dh).transpose(0, 2, 1, 3)
        k = (self.slot_size ** -0.5) * k

        def iteration(slots, _):
            slots_prev = slots
            s = self.norm_slots(slots)
            q = self.project_q(s).reshape(
                b, self.num_slots, nh, dh).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhid,bhsd->bhis", k, q,
                                preferred_element_type=jnp.float32)
            # softmax over the JOINT (head, slot) axis (slot_attn.py:150)
            flat = logits.transpose(0, 2, 1, 3).reshape(
                b, h * w, nh * self.num_slots)
            attn = jax.nn.softmax(flat.astype(jnp.float32), axis=-1)
            attn_vis = attn.reshape(b, h * w, nh, self.num_slots) \
                .transpose(0, 2, 1, 3)
            a = attn_vis + self.epsilon
            a = a / jnp.sum(a, axis=-2, keepdims=True)  # normalize over inputs
            updates = jnp.einsum("bhis,bhid->bhsd", a, v.astype(jnp.float32))
            updates = updates.transpose(0, 2, 1, 3).reshape(
                b, self.num_slots, self.slot_size).astype(slots.dtype)
            flat_new, _ = self.gru(
                slots_prev.reshape(-1, self.slot_size),
                updates.reshape(-1, self.slot_size))
            slots = flat_new.reshape(b, self.num_slots, self.slot_size)
            slots = slots + self.mlp_1(nn.relu(self.mlp_0(
                self.norm_mlp(slots))))
            return slots, attn_vis

        # corrector iterations: small fixed count (3-7) — unrolled python
        # loop so flax module calls trace correctly (a lax.scan over a body
        # with parameterized submodules leaks init tracers); XLA still sees
        # one fused program.
        for _ in range(self.num_iterations):
            slots, _attn = iteration(slots, None)
        return slots

    def __call__(self, inputs, rng=None):
        slots = self.forward_slots(inputs, rng=rng)
        return self.out_linear(self.out_layer_norm(slots))
