"""Pallas kernel correctness vs jnp references (interpret mode on CPU)."""

import numpy as np
import pytest


def test_fused_attention_matches_reference():
    import jax
    import jax.numpy as jnp

    from encdiff_tpu.nn.pallas.attention import (fused_attention,
                                                 reference_attention)

    rs = np.random.RandomState(0)
    b, n, m, c, d = 3, 16, 20, 32, 16
    heads, dim_head = 4, 8
    inner = heads * dim_head
    x = jnp.asarray(rs.randn(b, n, c).astype(np.float32))
    ctx = jnp.asarray(rs.randn(b, m, d).astype(np.float32))
    wq = jnp.asarray(rs.randn(c, inner).astype(np.float32) * 0.1)
    wk = jnp.asarray(rs.randn(d, inner).astype(np.float32) * 0.1)
    wv = jnp.asarray(rs.randn(d, inner).astype(np.float32) * 0.1)
    wo = jnp.asarray(rs.randn(inner, c).astype(np.float32) * 0.1)
    bo = jnp.asarray(rs.randn(c).astype(np.float32) * 0.1)

    ref = reference_attention(x, ctx, wq, wk, wv, wo, bo, heads=heads,
                              dim_head=dim_head)
    out = fused_attention(x, ctx, wq, wk, wv, wo, bo, heads=heads,
                          dim_head=dim_head, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_self_attention():
    import jax.numpy as jnp

    from encdiff_tpu.nn.pallas.attention import (fused_attention,
                                                 reference_attention)

    rs = np.random.RandomState(1)
    b, n, c = 2, 64, 32
    heads, dim_head = 4, 8
    inner = heads * dim_head
    x = jnp.asarray(rs.randn(b, n, c).astype(np.float32))
    wq = jnp.asarray(rs.randn(c, inner).astype(np.float32) * 0.1)
    wk = jnp.asarray(rs.randn(c, inner).astype(np.float32) * 0.1)
    wv = jnp.asarray(rs.randn(c, inner).astype(np.float32) * 0.1)
    wo = jnp.asarray(rs.randn(inner, c).astype(np.float32) * 0.1)
    bo = jnp.zeros((c,), jnp.float32)
    ref = reference_attention(x, x, wq, wk, wv, wo, bo, heads=heads,
                              dim_head=dim_head)
    out = fused_attention(x, x, wq, wk, wv, wo, bo, heads=heads,
                          dim_head=dim_head, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("film", [False, True])
def test_groupnorm_silu_matches_reference(film):
    import jax.numpy as jnp

    from encdiff_tpu.nn.pallas.groupnorm_silu import (
        groupnorm_silu, reference_groupnorm_silu)

    rs = np.random.RandomState(2)
    b, h, w, c, groups = 2, 8, 8, 64, 32
    x = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    gamma = jnp.asarray(rs.randn(c).astype(np.float32))
    beta = jnp.asarray(rs.randn(c).astype(np.float32))
    scale = jnp.asarray(rs.randn(b, c).astype(np.float32) * 0.2) if film else None
    shift = jnp.asarray(rs.randn(b, c).astype(np.float32) * 0.2) if film else None
    ref = reference_groupnorm_silu(x, gamma, beta, scale, shift,
                                   groups=groups)
    out = groupnorm_silu(x, gamma, beta, scale, shift, groups=groups,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_attention_core_grads_match_reference():
    import jax
    import jax.numpy as jnp

    from encdiff_tpu.nn.pallas.attention import attention_core

    rs = np.random.RandomState(3)
    b, h, n, m, dh = 2, 4, 16, 20, 8
    q = jnp.asarray(rs.randn(b, h, n, dh).astype(np.float32))
    k = jnp.asarray(rs.randn(b, h, m, dh).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h, m, dh).astype(np.float32))

    def ref(q, k, v):
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * dh**-0.5
        p = jax.nn.softmax(sim, axis=-1)
        return jnp.einsum("bhij,bhjd->bhid", p, v)

    def loss_ref(q, k, v):
        return jnp.sum(ref(q, k, v) ** 2)

    def loss_pl(q, k, v):
        return jnp.sum(attention_core(q, k, v, interpret=True) ** 2)

    o_ref = ref(q, k, v)
    o_pl = attention_core(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-5)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_gn_silu_custom_vjp_grads():
    """gn_silu (kernel fwd / reference-recompute bwd) gradients match
    jax.grad of the pure reference for x, gamma, beta, and FiLM scale/shift."""
    import jax
    import jax.numpy as jnp

    from encdiff_tpu.nn.pallas.groupnorm_silu import (
        gn_silu, reference_groupnorm_silu)

    rs = np.random.RandomState(3)
    b, h, w, c, g = 2, 4, 4, 16, 4
    x = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    gamma = jnp.asarray(rs.randn(c).astype(np.float32) * 0.1 + 1.0)
    beta = jnp.asarray(rs.randn(c).astype(np.float32) * 0.1)
    scale = jnp.asarray(rs.randn(b, c).astype(np.float32) * 0.1)
    shift = jnp.asarray(rs.randn(b, c).astype(np.float32) * 0.1)

    def loss_kernel(*args):
        return jnp.sum(gn_silu(*args, g, 1e-5, True) ** 2)

    def loss_ref(*args):
        return jnp.sum(reference_groupnorm_silu(*args, groups=g,
                                                eps=1e-5) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(
        x, gamma, beta, scale, shift)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, gamma, beta, scale, shift)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_gnsilu_module_interpret_matches_default(monkeypatch):
    """The GNSiLU flax module: ENCDIFF_PALLAS=interpret (fused kernel path)
    and the default XLA path produce the same output and the same param tree
    as the pre-fusion GroupNorm+silu composition."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn_

    from encdiff_tpu.nn.layers import GNSiLU, GroupNorm, nonlinearity

    class Old(nn_.Module):
        @nn_.compact
        def __call__(self, x):
            return nonlinearity(GroupNorm(32, epsilon=1e-5,
                                          name="in_norm")(x))

    class New(nn_.Module):
        @nn_.compact
        def __call__(self, x):
            return GNSiLU(32, epsilon=1e-5, name="in_norm")(x)

    x = jnp.asarray(np.random.RandomState(4).randn(2, 8, 8, 64)
                    .astype(np.float32))
    vo = Old().init(jax.random.PRNGKey(0), x)
    vn = New().init(jax.random.PRNGKey(0), x)
    # identical param paths -> checkpoints stay loadable
    assert (jax.tree_util.tree_structure(vo)
            == jax.tree_util.tree_structure(vn))
    monkeypatch.delenv("ENCDIFF_PALLAS", raising=False)
    y_def = New().apply(vo, x)
    np.testing.assert_allclose(np.asarray(y_def),
                               np.asarray(Old().apply(vo, x)),
                               rtol=1e-5, atol=1e-6)
    monkeypatch.setenv("ENCDIFF_PALLAS", "interpret")
    y_fused = New().apply(vo, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_def),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_fwd_matches_reference():
    """Blockwise flash self-attention (interpret mode): multi-block online
    softmax + lane padding (d=8 -> 128) vs the einsum reference."""
    import jax.numpy as jnp

    from encdiff_tpu.nn.pallas.flash_attention import (flash_attention,
                                                       reference_attention)

    rs = np.random.RandomState(5)
    b, h, n, d = 1, 2, 256, 8
    q = jnp.asarray(rs.randn(b, h, n, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, h, n, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h, n, d).astype(np.float32))
    scale = d ** -0.5
    ref = reference_attention(q, k, v, scale)
    out = flash_attention(q, k, v, scale, block_q=128, block_k=64,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_grads_match_reference():
    import jax
    import jax.numpy as jnp

    from encdiff_tpu.nn.pallas.flash_attention import (flash_attention,
                                                       reference_attention)

    rs = np.random.RandomState(6)
    b, h, n, d = 1, 1, 128, 16
    q = jnp.asarray(rs.randn(b, h, n, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, h, n, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h, n, d).astype(np.float32))
    w = jnp.asarray(rs.randn(b, h, n, d).astype(np.float32))
    scale = d ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, block_q=64,
                                       block_k=64, interpret=True) * w)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v, scale) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_vae_attnblock_flash_routing_matches_einsum(monkeypatch):
    """VAE mid-block AttnBlock at N>=1024 routes through the flash kernel
    (round-3 fix: the einsum path materialized f32[B,4096,4096] scores and
    failed HBM planning on 256px encodes). Interpret-mode flash output must
    match the plain-einsum path on the same params."""
    import jax
    import jax.numpy as jnp

    from encdiff_tpu.nn.vae import AttnBlock

    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 32, 32, 64).astype(np.float32))  # N=1024
    blk = AttnBlock(in_channels=64)

    monkeypatch.setenv("ENCDIFF_PALLAS", "off")
    variables = blk.init(jax.random.PRNGKey(0), x)
    out_einsum = np.asarray(blk.apply(variables, x))

    monkeypatch.setenv("ENCDIFF_PALLAS", "interpret")
    out_flash = np.asarray(blk.apply(variables, x))

    assert not np.allclose(out_einsum, 0)
    np.testing.assert_allclose(out_flash, out_einsum, rtol=2e-5, atol=2e-5)
