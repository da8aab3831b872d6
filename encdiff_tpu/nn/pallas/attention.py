"""Fused multi-head attention kernel for the SpatialTransformer.

One ``pallas_call`` computes, for a block of batch rows resident in VMEM:

    q = x  @ wq;  k = ctx @ wk;  v = ctx @ wv            (MXU)
    attn = softmax(q_h k_h^T * scale)  per head          (VPU, fp32)
    out  = concat_h(attn v_h) @ wo + bo                  (MXU)

replacing the 6-op XLA chain of ``encdiff_tpu.nn.attention.CrossAttention``
(attention.py:152-193 reference semantics). Sequences are tiny (N<=256
spatial queries, M in {20, N} keys), so everything for a batch block fits in
VMEM and the kernel is fusion/dispatch-bound, not tiling-bound
(SURVEY.md C5 "fusion, not tiling, is the win").

Head dims are small (8/16/32); per-head score matmuls are expressed as one
``dot_general`` with the head axis as a batch dimension — Mosaic unrolls it,
each slice still hitting the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(x_ref, ctx_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref,
                 o_ref, *, heads: int, dim_head: int):
    """One batch row per program: x (N, C), ctx (M, D)."""
    x = x_ref[0]
    ctx = ctx_ref[0]
    n = x.shape[0]
    m = ctx.shape[0]
    inner = heads * dim_head
    f32 = jnp.float32

    q = jnp.dot(x, wq_ref[:], preferred_element_type=f32)      # (N, inner)
    k = jnp.dot(ctx, wk_ref[:], preferred_element_type=f32)    # (M, inner)
    v = jnp.dot(ctx, wv_ref[:], preferred_element_type=f32)    # (M, inner)

    scale = dim_head ** -0.5
    qh = q.reshape(n, heads, dim_head).transpose(1, 0, 2)      # (H, N, dh)
    kh = k.reshape(m, heads, dim_head).transpose(1, 0, 2)      # (H, M, dh)
    vh = v.reshape(m, heads, dim_head).transpose(1, 0, 2)      # (H, M, dh)

    sim = jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32) * scale                     # (H, N, M)
    sim = sim - jnp.max(sim, axis=-1, keepdims=True)
    p = jnp.exp(sim)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        p, vh, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32)                             # (H, N, dh)
    out = out.transpose(1, 0, 2).reshape(n, inner)
    y = jnp.dot(out.astype(x.dtype), wo_ref[:],
                preferred_element_type=f32) + bo_ref[:].astype(f32)
    o_ref[0] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("heads", "dim_head", "interpret"))
def fused_attention(x, ctx, wq, wk, wv, wo, bo, *, heads: int, dim_head: int,
                    interpret: bool = False):
    """x: (B, N, C); ctx: (B, M, D); returns (B, N, C_out).

    wq: (C, H*dh), wk/wv: (D, H*dh), wo: (H*dh, C_out), bo: (C_out,).
    """
    b, n, c = x.shape
    m = ctx.shape[1]
    c_out = wo.shape[1]
    kernel = partial(_attn_kernel, heads=heads, dim_head=dim_head)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, ctx.shape[2]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wq.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wk.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wv.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wo.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bo.shape, lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c_out), x.dtype),
        interpret=interpret,
    )(x, ctx, wq, wk, wv, wo, bo)


def _attn_core_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One (batch, head) pair per program: q (N, dh), k/v (M, dh) — keeps
    every intermediate at (N, M), well under the VMEM budget even for
    256x256 self-attention."""
    f32 = jnp.float32
    q = q_ref[0, 0].astype(f32)
    k = k_ref[0, 0].astype(f32)
    v = v_ref[0, 0].astype(f32)
    sim = jnp.dot(q, k.T, preferred_element_type=f32) * scale
    sim = sim - jnp.max(sim, axis=-1, keepdims=True)
    p = jnp.exp(sim)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(p, v, preferred_element_type=f32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _attn_core_fwd_call(q, k, v, interpret):
    b, h, n, dh = q.shape
    m = k.shape[2]
    scale = dh ** -0.5
    kernel = partial(_attn_core_kernel, scale=scale)
    spec_q = pl.BlockSpec((1, 1, n, dh), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, 1, m, dh), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[spec_q, spec_k, spec_k],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((b, h, n, dh), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _attn_core_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                          dv_ref, *, scale: float):
    """Recompute-P backward for one (batch, head) pair — every intermediate
    is (N, M); no attention-probability tensor ever reaches HBM."""
    f32 = jnp.float32
    q = q_ref[0, 0].astype(f32)
    k = k_ref[0, 0].astype(f32)
    v = v_ref[0, 0].astype(f32)
    do = do_ref[0, 0].astype(f32)
    sim = jnp.dot(q, k.T, preferred_element_type=f32) * scale
    sim = sim - jnp.max(sim, axis=-1, keepdims=True)
    p = jnp.exp(sim)
    p = p / jnp.sum(p, axis=-1, keepdims=True)            # (N, M)
    dv = jnp.dot(p.T, do, preferred_element_type=f32)     # (M, dh)
    dp = jnp.dot(do, v.T, preferred_element_type=f32)     # (N, M)
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - row) * scale                           # (N, M)
    dq = jnp.dot(ds, k, preferred_element_type=f32)       # (N, dh)
    dk = jnp.dot(ds.T, q, preferred_element_type=f32)     # (M, dh)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _attn_core_bwd_call(q, k, v, do, interpret):
    b, h, n, dh = q.shape
    m = k.shape[2]
    scale = dh ** -0.5
    kernel = partial(_attn_core_bwd_kernel, scale=scale)
    spec_q = pl.BlockSpec((1, 1, n, dh), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, 1, m, dh), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[spec_q, spec_k, spec_k, spec_q],
        out_specs=(spec_q, spec_k, spec_k),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        interpret=interpret,
    )(q, k, v, do)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_core(q, k, v, interpret):
    return _attn_core_fwd_call(q, k, v, interpret)


def _attention_core_fwd(q, k, v, interpret):
    return _attn_core_fwd_call(q, k, v, interpret), (q, k, v)


def _attention_core_bwd(interpret, res, do):
    q, k, v = res
    return _attn_core_bwd_call(q, k, v, do, interpret)


_attention_core.defvjp(_attention_core_fwd, _attention_core_bwd)


@partial(jax.jit, static_argnames=("interpret",))
def attention_core(q, k, v, *, interpret: bool = False):
    """softmax(q k^T / sqrt(dh)) v on (B, H, N, dh) / (B, H, M, dh) tensors.

    The projection matmuls stay in XLA (they fuse well); this kernel fuses
    the score/softmax/value chain. Differentiable via a custom VJP whose
    backward is a second recompute-P kernel (no attention-probability
    tensor ever hits HBM in either pass).
    """
    return _attention_core(q, k, v, interpret)


def reference_attention(x, ctx, wq, wk, wv, wo, bo, *, heads: int,
                        dim_head: int):
    """jnp reference (mirrors nn.attention.CrossAttention math)."""
    b, n, _ = x.shape
    m = ctx.shape[1]
    q = (x @ wq).reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)
    k = (ctx @ wk).reshape(b, m, heads, dim_head).transpose(0, 2, 1, 3)
    v = (ctx @ wv).reshape(b, m, heads, dim_head).transpose(0, 2, 1, 3)
    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=jnp.float32) * dim_head**-0.5
    p = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", p, v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, heads * dim_head)
    return out @ wo + bo
