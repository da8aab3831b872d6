"""Blockwise (flash) self-attention kernels for large token counts.

The CelebA f=4 config runs 64x64 latents -> 4096-token self-attention
(SURVEY.md §2.4 "blockwise Pallas attention suffices within one chip");
XLA's einsum path materializes the (B, H, N, N) score tensor in HBM
(536 MB at bs=8/h=8/N=4096 fp32) twice per step (fwd + recompute in bwd).
These kernels keep scores in VMEM tiles with the standard online-softmax
recurrence; the backward pass recomputes score tiles from the saved
logsumexp, so HBM traffic is O(N*D) instead of O(N^2).

Layout notes (TPU): head_dim is zero-padded to a 128-lane multiple by the
wrapper (padding columns contribute nothing to q.k^T and are sliced off
the output); q/k/v for one (batch, head) fit VMEM whole at EncDiff sizes
(4096 x 128 fp32 = 2 MB), so the grid tiles only the query/key axis and
each program loops over the other axis in ``pl.ds`` blocks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_NEG_INF = -1e30


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                block_k: int):
    q = q_ref[0].astype(jnp.float32) * scale            # (Bq, D)
    bq, d = q.shape
    n = k_ref.shape[1]

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v,
                                        preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n // block_k, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # (Bq, 1) broadcast over the 8-lane trailing axis: TPU block shapes
    # need a lane-legal last dim, so lse rides as (BH, N, 8)
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (bq, 8))


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
               scale: float, block_k: int):
    q = q_ref[0].astype(jnp.float32) * scale
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]
    bq, d = q.shape
    n = k_ref.shape[1]

    def body(j, dq):
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, n // block_k, body,
                           jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref,
                dv_ref, *, scale: float, block_q: int):
    k = k_ref[0].astype(jnp.float32)                    # (Bk, D)
    v = v_ref[0].astype(jnp.float32)
    bk, d = k.shape
    n = q_ref.shape[1]

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(
            jnp.float32) * scale
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :1]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :1]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse)                             # (Bq, Bk)
        dv_new = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)                            # (Bq, Bk)
        dk_new = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_new, dv_new

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n // block_q, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)   # scale already applied via q
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_heads(t):
    d = t.shape[-1]
    pad = (-d) % _LANES
    if pad:
        t = jnp.pad(t, ((0, 0), (0, 0), (0, pad)))
    return t


def _flash_fwd_impl(q, k, v, scale, block_q, block_k, interpret):
    bh, n, d = q.shape
    grid = (bh, n // block_q)
    kern = partial(_fwd_kernel, scale=scale, block_k=block_k)
    o, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 8), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, 8), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return o, lse


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_core(q, k, v, scale, block_q, block_k, interpret):
    """(BH, N, D-padded) flash self-attention."""
    o, _ = _flash_fwd_impl(q, k, v, scale, block_q, block_k, interpret)
    return o


def _flash_core_fwd(q, k, v, scale, block_q, block_k, interpret):
    o, lse = _flash_fwd_impl(q, k, v, scale, block_q, block_k, interpret)
    return o, (q, k, v, o, lse)


def _flash_core_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v, o, lse = res
    bh, n, d = q.shape
    # The bwd kernels hold 4 (block_q, block_k) f32 temporaries (s/p/dp/ds)
    # on the Mosaic scoped-VMEM stack *on top of* the pipelined full-length
    # q/do blocks. At d=128/N=4096 the 512x512 tiles blow the default 16 MB
    # scoped limit (observed: 18 MB on v5e). Smaller tiles cost nothing
    # measurable here (the kernels are MXU-bound on the d-contraction), so
    # clamp to 256 and give the compiler explicit VMEM headroom.
    block_q = min(block_q, 256)
    block_k = min(block_k, 256)
    bwd_params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    delta = jnp.broadcast_to(
        jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                axis=-1, keepdims=True), (bh, n, 8))      # lane-legal

    dq = pl.pallas_call(
        partial(_dq_kernel, scale=scale, block_k=block_k),
        grid=(bh, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 8), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 8), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        compiler_params=bwd_params,
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        partial(_dkv_kernel, scale=scale, block_q=block_q),
        grid=(bh, n // block_k),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 8), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 8), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        ],
        compiler_params=bwd_params,
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(q, k, v, scale: float, *, block_q: int = 512,
                    block_k: int = 512, interpret: bool = False):
    """Differentiable flash self-attention on (B, H, N, D) tensors.

    Drop-in for the einsum path of ``encdiff_tpu.nn.attention.attention``
    for the self-attention case (N == M). Pads D to a 128-lane multiple
    and folds (B, H) into the grid.
    """
    b, h, n, d = q.shape
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    if n % block_q or n % block_k:
        raise ValueError(f"N={n} must divide block sizes "
                         f"({block_q}, {block_k})")

    def fold(t):
        return _pad_heads(t.reshape(b * h, n, d))

    o = _flash_core(fold(q), fold(k), fold(v), scale, block_q, block_k,
                    interpret)
    return o[..., :d].reshape(b, h, n, d)


def reference_attention(q, k, v, scale: float):
    """The XLA einsum path (for parity tests)."""
    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhij,bhjd->bhid", attn, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
