"""Fused GroupNorm(+FiLM)+SiLU kernel.

One VMEM-resident pass over a (H*W, C) sample computes the per-group
mean/variance, normalizes, applies the affine (and optional FiLM
scale/shift from the timestep embedding, openaimodel_enc.py:268-271), and
the SiLU — the GN-SiLU prologue of every UNet/VAE ResBlock collapsed from
several XLA ops into one kernel.

Groups are laid out contiguously along the channel axis (C = G * cg);
grouped statistics go through a one-hot channel->group membership matmul
(Mosaic cannot reshape across the lane axis — see the kernel docstring).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_silu_kernel(x_ref, gamma_ref, beta_ref, scale_ref, shift_ref, o_ref,
                    *, groups: int, eps: float, film: bool):
    """Reshape-free grouped statistics: Mosaic cannot lower a reshape that
    splits the lane (channel) axis into (groups, cg), so group sums are
    computed against a one-hot channel->group membership matrix instead —
    two small MXU matmuls replace the (HW, G, cg) reduction, and the
    per-channel mean/rstd come back via the transposed membership."""
    x = x_ref[0].astype(jnp.float32)               # (HW, C)
    hw, c = x.shape
    cg = c // groups
    # channel->group one-hot (C, G) built from 2-D iotas
    ch_group = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    g_idx = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (ch_group == g_idx).astype(jnp.float32)    # (C, G)

    s1 = jnp.sum(x, axis=0, keepdims=True)         # (1, C)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    n = float(hw * cg)
    mean_g = jnp.dot(s1, m, preferred_element_type=jnp.float32) / n  # (1, G)
    ex2_g = jnp.dot(s2, m, preferred_element_type=jnp.float32) / n
    var_g = ex2_g - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # back to per-channel via the transpose: (1, G) @ (G, C)
    mean_c = jax.lax.dot_general(mean_g, m, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(rstd_g, m, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    xn = (x - mean_c) * rstd_c
    y = xn * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    if film:
        # scale/shift ride as (B, 1, C) so their (1, C) block is lane-legal
        y = y * (1.0 + scale_ref[0].astype(jnp.float32)) \
            + shift_ref[0].astype(jnp.float32)
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


@partial(jax.jit,
         static_argnames=("groups", "eps", "interpret"))
def groupnorm_silu(x, gamma, beta, scale=None, shift=None, *,
                   groups: int = 32, eps: float = 1e-5,
                   interpret: bool = False):
    """x: (B, H, W, C) -> SiLU(FiLM(GroupNorm(x))). scale/shift: (B, C)|None."""
    b, h, w, c = x.shape
    film = scale is not None
    if not film:
        scale = jnp.zeros((b, c), x.dtype)
        shift = jnp.zeros((b, c), x.dtype)
    x2 = x.reshape(b, h * w, c)
    scale3 = scale.reshape(b, 1, c)
    shift3 = shift.reshape(b, 1, c)
    kernel = partial(_gn_silu_kernel, groups=groups, eps=eps, film=film)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), x.dtype),
        interpret=interpret,
    )(x2, gamma, beta, scale3, shift3)
    return out.reshape(b, h, w, c)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gn_silu(x, gamma, beta, scale, shift, groups: int = 32,
            eps: float = 1e-5, interpret: bool = False):
    """Differentiable fused GN(+FiLM)+SiLU: Pallas kernel forward,
    reference-recompute backward (the VJP math stays in XLA where it fuses
    into the surrounding conv grads). scale/shift must be concrete (B, C)
    arrays — pass zeros for the no-FiLM case."""
    return groupnorm_silu(x, gamma, beta, scale, shift, groups=groups,
                          eps=eps, interpret=interpret)


def _gn_silu_fwd(x, gamma, beta, scale, shift, groups, eps, interpret):
    out = groupnorm_silu(x, gamma, beta, scale, shift, groups=groups,
                         eps=eps, interpret=interpret)
    return out, (x, gamma, beta, scale, shift)


def _gn_silu_bwd(groups, eps, interpret, res, g):
    x, gamma, beta, scale, shift = res
    _, vjp = jax.vjp(
        lambda xx, ga, be, sc, sh: reference_groupnorm_silu(
            xx, ga, be, sc, sh, groups=groups, eps=eps),
        x, gamma, beta, scale, shift)
    return vjp(g)


gn_silu.defvjp(_gn_silu_fwd, _gn_silu_bwd)

# A (HW, C) fp32 block must fit VMEM (~16 MB/core) with headroom for the
# reshape temporaries; above this the fused kernel falls back to XLA.
_VMEM_BLOCK_LIMIT = 4 * 2**20


def fits_vmem(h: int, w: int, c: int) -> bool:
    return h * w * c * 4 <= _VMEM_BLOCK_LIMIT


def reference_groupnorm_silu(x, gamma, beta, scale=None, shift=None, *,
                             groups: int = 32, eps: float = 1e-5):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    y = xn * gamma + beta
    if scale is not None:
        y = y * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)
