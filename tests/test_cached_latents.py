"""Precomputed-latent training (harness --cache_latents).

The frozen VQModelInterface encode (reference autoencoder.py:313-316) is a
pure conv stack, so caching z once and feeding {"image", "z"} batches must
reproduce the image-batch step exactly — same loss, same updated params.
"""

import numpy as np
import pytest


def _tiny_model():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _build_model

    return _build_model(model_channels=32, num_res_blocks=1, vq_ch=32,
                        channel_mult=(1, 2), vq_ch_mult=(1, 2),
                        resolution=32)


@pytest.fixture(scope="module")
def bits():
    import jax

    from encdiff_tpu.train import loop as train_loop

    model = _tiny_model()
    optimizer = train_loop.build_optimizer(model, learning_rate=1e-4)
    state, frozen = train_loop.create_train_state(
        model, jax.random.PRNGKey(0), optimizer, image_resolution=32)
    batch = np.random.RandomState(0).randint(
        0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    return model, optimizer, state, frozen, batch


def test_cached_step_matches_image_step(bits):
    import jax
    import jax.numpy as jnp

    from encdiff_tpu.train import loop as train_loop

    model, optimizer, state, frozen, batch = bits
    rng = jax.random.PRNGKey(7)
    step = train_loop.build_train_step(model, optimizer, donate=False)

    s_img, m_img = step(state, frozen, batch, rng)

    x = jnp.asarray(batch).astype(jnp.float32) / 127.5 - 1.0
    z = model.encode_first_stage(frozen["first_stage"], x)
    s_z, m_z = step(state, frozen, {"image": jnp.asarray(batch), "z": z}, rng)

    assert float(m_img["train/loss"]) == pytest.approx(
        float(m_z["train/loss"]), rel=1e-5)
    # scale_by_std fired identically (sf derives from the same z)
    assert float(s_img.scale_factor) == pytest.approx(
        float(s_z.scale_factor), rel=1e-6)
    d = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a - b)).max()),
                     s_img.params, s_z.params)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-5


def test_precompute_latents_chunking(bits):
    """Chunked one-time encode == direct encode, incl. the overlapping
    final chunk when chunk size does not divide N."""
    import jax.numpy as jnp

    from encdiff_tpu.train import loop as train_loop

    model, _, _, frozen, _ = bits
    n = 10  # chunk=4 -> starts [0, 4, 6]: overlap path exercised
    imgs = np.random.RandomState(1).randint(
        0, 256, size=(n, 32, 32, 3), dtype=np.uint8)
    flat = jnp.asarray(train_loop.flatten_for_device(imgs))

    cache, hwc = train_loop.precompute_latents(model, frozen, flat, chunk=4)
    assert cache["image"] is flat
    assert cache["z"].shape == (n, int(np.prod(hwc)))

    x = jnp.asarray(imgs).astype(jnp.float32) / 127.5 - 1.0
    z_direct = model.encode_first_stage(frozen["first_stage"], x)
    assert hwc == tuple(z_direct.shape[1:])
    np.testing.assert_allclose(np.asarray(cache["z"]),
                               np.asarray(z_direct).reshape(n, -1),
                               rtol=1e-5, atol=1e-6)


def test_epoch_step_with_cache_matches_plain(bits):
    """build_epoch_train_step over the latent cache == over raw images."""
    import jax
    import jax.numpy as jnp

    from encdiff_tpu.train import loop as train_loop

    model, optimizer, state, frozen, _ = bits
    n, bs, spe = 8, 4, 2
    imgs = np.random.RandomState(2).randint(
        0, 256, size=(n, 32, 32, 3), dtype=np.uint8)
    flat = jnp.asarray(train_loop.flatten_for_device(imgs))
    perm = jnp.arange(n, dtype=jnp.int32)
    rngb = jax.random.PRNGKey(3)

    plain = train_loop.build_epoch_train_step(model, optimizer, spe,
                                              donate=False)
    s1, m1 = plain(state, frozen, flat, perm, rngb)

    cache, hwc = train_loop.precompute_latents(model, frozen, flat, chunk=8)
    cached = train_loop.build_epoch_train_step(model, optimizer, spe,
                                               donate=False, latent_hwc=hwc)
    s2, m2 = cached(state, frozen, cache, perm, rngb)

    assert float(m1["train/loss"]) == pytest.approx(
        float(m2["train/loss"]), rel=1e-5)
    d = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a - b)).max()),
                     s1.params, s2.params)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-5


def test_ddim_sample_with_bf16_weights(bits):
    """BENCH_BF16_PARAMS path: the full sample_fn (cond encode -> warp ->
    DDIM scan -> VQ decode) runs with every float leaf cast to bf16 and
    returns finite images (the byte-halving sampler mode)."""
    import jax
    import jax.numpy as jnp

    from encdiff_tpu.core.schedules import DDIMSchedule
    from encdiff_tpu.diffusion import ddim as ddim_lib

    model, _, state, frozen, batch = bits
    cast = lambda t: jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, t)
    unet_p = cast(state.params["unet"])
    cvars = cast({"params": state.params["cond"],
                  "batch_stats": state.batch_stats})
    fs_vars = cast(frozen["first_stage"])
    dsched = DDIMSchedule.create(model.schedule, 4, eta=1.0)

    x = jnp.asarray(batch).astype(jnp.float32) / 127.5 - 1.0
    u = model.cond_encoding(cvars, x)
    tokens = model.cond_warp(cvars, u)
    if tokens.ndim == 3:
        tokens = tokens.reshape(tokens.shape[0], -1)
    shape = (x.shape[0], model.image_size, model.image_size, model.channels)
    denoise = lambda z, t: model.apply_model({"params": unet_p}, z, t, tokens)
    z, _ = ddim_lib.ddim_sample(dsched, denoise, shape, jax.random.PRNGKey(3))
    img = model.decode_first_stage(fs_vars, z, scale_factor=1.0)
    assert img.shape[0] == x.shape[0]
    assert bool(jnp.isfinite(img.astype(jnp.float32)).all())
