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
