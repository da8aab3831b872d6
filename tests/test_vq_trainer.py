"""VQ-GAN two-optimizer train step: shape/finiteness/grad-routing checks
(the reference covers this path only through Lightning integration —
SURVEY.md §3.4)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def vq_bits():
    import jax

    from encdiff_tpu.losses.gan import VQLPIPSWithDiscriminator
    from encdiff_tpu.models.autoencoder import VQModel
    from encdiff_tpu.train import vq_trainer

    ddconfig = dict(double_z=False, z_channels=3, resolution=32,
                    in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2],
                    num_res_blocks=1, attn_resolutions=[], dropout=0.0)
    vq = VQModel(ddconfig=ddconfig, n_embed=64, embed_dim=3)
    # perceptual off: no pretrained VGG in CI; disc_start=0 so GAN term live
    loss = VQLPIPSWithDiscriminator(disc_start=0, disc_weight=0.75,
                                    codebook_weight=1.0, perceptual_weight=0.0,
                                    n_classes=64)
    gen_tx, disc_tx = vq_trainer.make_optimizers(1e-4)
    state = vq_trainer.create_vq_train_state(vq, loss, jax.random.PRNGKey(0),
                                             gen_tx, disc_tx)
    return vq, loss, gen_tx, disc_tx, state


def test_vq_gan_step(vq_bits):
    from encdiff_tpu.train import vq_trainer

    vq, loss, gen_tx, disc_tx, state = vq_bits
    step = vq_trainer.build_vq_train_step(vq, loss, gen_tx, disc_tx,
                                          donate=False)
    batch = np.random.RandomState(0).randint(
        0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    s1, m1 = step(state, batch)
    assert int(s1.step) == 1
    for k in ("train/total_loss", "train/rec_loss", "train/disc_loss",
              "train/d_weight", "train/g_loss", "train/perplexity"):
        assert np.isfinite(float(m1[k])), k
    # both param sets moved
    import jax

    dg = max(jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.gen_params, s1.gen_params)))
    dd = max(jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.disc_params, s1.disc_params)))
    assert dg > 0 and dd > 0
    # adaptive weight is clamped
    assert 0.0 <= float(m1["train/d_weight"]) <= 1e4 * 0.75 + 1


def test_vq_eval_step(vq_bits):
    from encdiff_tpu.train import vq_trainer

    vq, loss, gen_tx, disc_tx, state = vq_bits
    ev = vq_trainer.build_vq_eval_step(vq, loss)
    batch = np.random.RandomState(1).randint(
        0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    log = ev(state, batch)
    assert np.isfinite(float(log["val/rec_loss"]))
    assert np.isfinite(float(log["val/disc_loss"]))


@pytest.mark.slow
def test_vq_gan_step_with_perceptual():
    """perceptual_weight>0 path (vqperceptual.py:59 + shapes3d_vq_4_16.yaml
    taming default): LPIPS in calibrated random-features mode contributes a
    positive p_loss and the step stays finite."""
    import jax

    from encdiff_tpu.losses.gan import VQLPIPSWithDiscriminator
    from encdiff_tpu.models.autoencoder import VQModel
    from encdiff_tpu.train import vq_trainer

    ddconfig = dict(double_z=False, z_channels=3, resolution=32,
                    in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2],
                    num_res_blocks=1, attn_resolutions=[], dropout=0.0)
    vq = VQModel(ddconfig=ddconfig, n_embed=64, embed_dim=3)
    loss = VQLPIPSWithDiscriminator(disc_start=0, disc_weight=0.75,
                                    codebook_weight=1.0,
                                    perceptual_weight=1.0)
    gen_tx, disc_tx = vq_trainer.make_optimizers(1e-4)
    state = vq_trainer.create_vq_train_state(vq, loss, jax.random.PRNGKey(0),
                                             gen_tx, disc_tx,
                                             image_resolution=32)
    step = vq_trainer.build_vq_train_step(vq, loss, gen_tx, disc_tx,
                                          donate=False)
    batch = np.random.RandomState(2).randint(
        0, 256, size=(2, 32, 32, 3), dtype=np.uint8)
    s1, m1 = step(state, batch)
    assert float(m1["train/p_loss"]) > 0.0
    assert np.isfinite(float(m1["train/total_loss"]))


def test_lpips_shapes():
    """LPIPS module: symmetric, zero at identity, (B,) output."""
    import jax
    import jax.numpy as jnp

    from encdiff_tpu.losses.lpips import LPIPS

    lp = LPIPS()
    variables = lp.init_variables(jax.random.PRNGKey(0), image_size=32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3),
                           minval=-1, maxval=1)
    y = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3),
                           minval=-1, maxval=1)
    d_xy = lp(variables, x, y)
    assert d_xy.shape == (2,)
    d_xx = lp(variables, x, x)
    np.testing.assert_allclose(np.asarray(d_xx), 0.0, atol=1e-5)
