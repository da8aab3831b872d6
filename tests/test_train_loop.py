"""Train-loop + data-pipeline tests on a virtual 8-device CPU mesh
(SURVEY.md §4 note 5: real multi-device semantics on one host)."""

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
def trained_bits():
    import jax

    from encdiff_tpu.train import loop as train_loop

    model = _tiny_model()
    optimizer = train_loop.build_optimizer(model, learning_rate=1e-4)
    state, frozen = train_loop.create_train_state(
        model, jax.random.PRNGKey(0), optimizer, image_resolution=32)
    return model, optimizer, state, frozen


@pytest.mark.slow
def test_single_device_train_step(trained_bits):
    import jax

    from encdiff_tpu.train import loop as train_loop

    model, optimizer, state, frozen = trained_bits
    step_fn = train_loop.build_train_step(model, optimizer, donate=False)
    batch = np.random.RandomState(0).randint(
        0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    s1, m1 = step_fn(state, frozen, batch, jax.random.PRNGKey(1))
    assert int(s1.step) == 1
    assert np.isfinite(float(m1["train/loss"]))
    # scale_by_std fired on step 0: scale_factor is 1/std(z), not the init 1.0
    assert float(s1.scale_factor) != pytest.approx(1.0)
    s2, m2 = step_fn(s1, frozen, batch, jax.random.PRNGKey(2))
    assert int(s2.step) == 2
    # scale factor frozen after step 0
    assert float(s2.scale_factor) == pytest.approx(float(s1.scale_factor))
    # EMA shadow moved toward params
    du = jax.tree_util.tree_leaves(
        jax.tree.map(lambda a, b: float(np.abs(a - b).max()),
                     s2.ema.params, s2.params["unet"]))
    assert max(du) >= 0.0


@pytest.mark.slow
def test_multichip_matches_single_chip(trained_bits):
    """DP over 8 virtual devices must reproduce the single-device loss for
    the same global batch (the reference's DDP-equivalence check)."""
    import jax

    from encdiff_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from encdiff_tpu.train import loop as train_loop

    model, optimizer, state, frozen = trained_bits
    batch = np.random.RandomState(1).randint(
        0, 256, size=(8, 32, 32, 3), dtype=np.uint8)
    rng = jax.random.PRNGKey(3)

    f1 = train_loop.build_train_step(model, optimizer, donate=False)
    _, m_single = f1(state, frozen, batch, rng)

    mesh = make_mesh(n_data=8)
    repl = replicated(mesh)
    state_r = jax.device_put(state, repl)
    frozen_r = jax.device_put(frozen, repl)
    f8 = train_loop.build_train_step(model, optimizer, mesh=mesh, donate=False)
    _, m_multi = f8(state_r, frozen_r, shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(m_single["train/loss"]),
                               float(m_multi["train/loss"]), rtol=2e-4)


@pytest.mark.slow
def test_unrolled_kstep_matches_single_steps(trained_bits):
    """build_unrolled_train_step(k=2) must reproduce two single-step calls
    (same batches, same per-substep fold_in rng derivation)."""
    import jax
    import jax.numpy as jnp

    from encdiff_tpu.train import loop as train_loop

    model, optimizer, state, frozen = trained_bits
    images = np.random.RandomState(2).randint(
        0, 256, size=(8, 32, 32, 3), dtype=np.uint8)
    idx_matrix = np.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], dtype=np.int32)
    rng = jax.random.PRNGKey(9)

    single = train_loop.build_train_step(model, optimizer, donate=False)
    s_ref, m_ref = state, None
    for j in range(2):
        s_ref, m_ref = single(s_ref, frozen, images[idx_matrix[j]],
                              jax.random.fold_in(rng, j))

    fused = train_loop.build_unrolled_train_step(
        model, optimizer, k=2, donate=False)
    s_fused, m_fused = fused(state, frozen, jnp.asarray(images),
                             jnp.asarray(idx_matrix), rng)

    assert int(s_fused.step) == int(s_ref.step) == 2
    np.testing.assert_allclose(float(m_fused["train/loss"]),
                               float(m_ref["train/loss"]), rtol=1e-4)
    ref_leaves = jax.tree_util.tree_leaves(s_ref.params)
    fused_leaves = jax.tree_util.tree_leaves(s_fused.params)
    for a, b in zip(ref_leaves, fused_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_epoch_loader_and_datamodule():
    from encdiff_tpu.data.datasets import SyntheticData
    from encdiff_tpu.train.data import (DataModuleFromConfig, epoch_loader,
                                        infinite_loader)

    ds = SyntheticData(length=64, image_size=8, seed=0)
    batches = list(epoch_loader(ds, 16, shuffle=True, seed=0))
    assert len(batches) == 4
    assert batches[0].shape == (16, 8, 8, 3)
    assert str(batches[0].dtype) == "uint8"

    # reshuffled across epochs
    it = infinite_loader(ds, 16, seed=0)
    e0 = np.asarray(next(it))
    for _ in range(3):
        next(it)
    e1 = np.asarray(next(it))
    assert not np.array_equal(e0, e1)

    dm = DataModuleFromConfig(
        batch_size=8,
        train={"target": "encdiff_tpu.data.datasets.SyntheticData",
               "params": {"length": 32, "image_size": 8}},
        validation={"target": "encdiff_tpu.data.datasets.SyntheticData",
                    "params": {"length": 16, "image_size": 8}},
        wrap=True)
    dm.setup()
    tb = list(dm.train_loader())
    vb = list(dm.val_loader())
    assert len(tb) == 4 and len(vb) == 2
    # __getitem__ parity: dict with normalized HWC image
    item = dm.datasets["train"][0]
    assert item["image"].shape == (8, 8, 3)
    assert -1.0 <= item["image"].min() and item["image"].max() <= 1.0


@pytest.mark.slow
def test_mcl_train_step():
    """MCL fine-tune path: higher-order grads through the frozen decoder
    inside one jitted step (run_mcl parity — SURVEY.md 3.5); MCL params get
    gradients, loss_dict carries loss_mcl + ratio."""
    import sys

    sys.path.insert(0, "/root/repo")
    import jax

    from __graft_entry__ import _flagship_config
    from encdiff_tpu.core.config import instantiate_from_config
    from encdiff_tpu.train import loop as train_loop

    cfg = _flagship_config(model_channels=32, num_res_blocks=1, vq_ch=32,
                           channel_mult=(1, 2), vq_ch_mult=(1, 2),
                           resolution=32)
    cfg["params"].update({"use_mcl": True, "lambda_mcl": 0.05,
                          "mcl_type": "infonce_mechgrad", "mcl_tau": 0.1,
                          "mcl_sigma": 0.1, "mcl_neg_mode": "shuffle_u",
                          "mcl_proj_dim": 32})
    model = instantiate_from_config(cfg)
    optimizer = train_loop.build_optimizer(model, learning_rate=1e-5)
    state, frozen = train_loop.create_train_state(
        model, jax.random.PRNGKey(0), optimizer, image_resolution=32)
    assert "mcl" in state.params
    step = train_loop.build_train_step(model, optimizer, donate=False)
    batch = np.random.RandomState(0).randint(
        0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    s1, m1 = step(state, frozen, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["train/loss"]))
    assert np.isfinite(float(m1["train/loss_mcl"]))
    assert "train/mcl_diffusion_ratio" in m1
    # MCL modules actually moved
    import jax as _jax

    dm = max(_jax.tree_util.tree_leaves(_jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.params["mcl"], s1.params["mcl"])))
    assert dm > 0


@pytest.mark.slow
def test_split_mcl_step_matches_fused():
    """build_split_mcl_train_step (three-program remote-compile-safe mode)
    must reproduce the fused step's updated params and losses: the losses
    are additive, so summed split grads == fused grads."""
    import sys

    sys.path.insert(0, "/root/repo")
    import jax

    from __graft_entry__ import _flagship_config
    from encdiff_tpu.core.config import instantiate_from_config
    from encdiff_tpu.train import loop as train_loop

    cfg = _flagship_config(model_channels=32, num_res_blocks=1, vq_ch=32,
                           channel_mult=(1, 2), vq_ch_mult=(1, 2),
                           resolution=32)
    cfg["params"].update({"use_mcl": True, "lambda_mcl": 0.05,
                          "mcl_type": "infonce_mechgrad", "mcl_tau": 0.1,
                          "mcl_sigma": 0.1, "mcl_neg_mode": "shuffle_u",
                          "mcl_proj_dim": 32})
    model = instantiate_from_config(cfg)
    optimizer = train_loop.build_optimizer(model, learning_rate=1e-5)
    state, frozen = train_loop.create_train_state(
        model, jax.random.PRNGKey(0), optimizer, image_resolution=32)
    batch = np.random.RandomState(3).randint(
        0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    rng = jax.random.PRNGKey(5)

    fused = train_loop.build_train_step(model, optimizer, donate=False)
    sf, mf = fused(state, frozen, batch, rng)
    split = train_loop.build_split_mcl_train_step(model, optimizer)
    ss, ms = split(state, frozen, batch, rng)

    np.testing.assert_allclose(float(ms["train/loss_mcl"]),
                               float(mf["train/loss_mcl"]), rtol=1e-5)
    np.testing.assert_allclose(float(ms["train/loss"]),
                               float(mf["train/loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(ms["grad_norm"]),
                               float(mf["grad_norm"]), rtol=1e-4)
    diffs = jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        ss.params, sf.params))
    assert max(diffs) < 1e-5
    # split-only diagnostics (per-group grad norms, ddpm_enc.py:1023-1038)
    assert np.isfinite(float(ms["grad_norm_diffusion"]))
    assert np.isfinite(float(ms["grad_norm_mcl"]))


@pytest.mark.slow
def test_indexed_train_step_matches_batch_step(trained_bits):
    """Device-resident-data step must produce the same loss as the
    host-batch step for identical data."""
    import jax
    import jax.numpy as jnp

    from encdiff_tpu.train import loop as train_loop

    model, optimizer, state, frozen = trained_bits
    rs = np.random.RandomState(7)
    images = rs.randint(0, 256, size=(64, 32, 32, 3), dtype=np.uint8)
    idx = np.array([3, 41, 17, 9], np.int32)
    rng = jax.random.PRNGKey(5)

    f_batch = train_loop.build_train_step(model, optimizer, donate=False)
    _, m1 = f_batch(state, frozen, images[idx], rng)

    f_idx = train_loop.build_indexed_train_step(
        model, optimizer, donate=False)
    _, m2 = f_idx(state, frozen, jnp.asarray(images), jnp.asarray(idx), rng)

    np.testing.assert_allclose(float(m1["train/loss"]),
                               float(m2["train/loss"]), rtol=1e-5)


@pytest.mark.slow
def test_remat_flag_changes_nothing_numerically():
    """use_checkpoint (remat) must leave the loss/gradients unchanged."""
    import sys

    sys.path.insert(0, "/root/repo")
    import jax

    from __graft_entry__ import _flagship_config
    from encdiff_tpu.core.config import instantiate_from_config
    from encdiff_tpu.train import loop as train_loop

    losses = []
    for remat in (False, True):
        cfg = _flagship_config(model_channels=32, num_res_blocks=1, vq_ch=32,
                               channel_mult=(1, 2), vq_ch_mult=(1, 2),
                               resolution=32)
        cfg["params"]["unet_config"]["params"]["use_checkpoint"] = remat
        model = instantiate_from_config(cfg)
        optimizer = train_loop.build_optimizer(model, learning_rate=1e-4)
        state, frozen = train_loop.create_train_state(
            model, jax.random.PRNGKey(0), optimizer, image_resolution=32)
        step = train_loop.build_train_step(model, optimizer, donate=False)
        batch = np.random.RandomState(0).randint(
            0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
        _, m = step(state, frozen, batch, jax.random.PRNGKey(1))
        losses.append(float(m["train/loss"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)


def test_encode_sweep_matches_per_batch_encode(trained_bits):
    """build_encode_sweep (one-dispatch whole-dataset scan) must equal the
    streaming per-batch encode, including the pad-and-slice tail."""
    import jax
    import jax.numpy as jnp

    from encdiff_tpu.train import loop as train_loop

    model, optimizer, state, frozen = trained_bits
    n, chunk = 10, 4                      # non-divisible: exercises padding
    images = np.random.RandomState(2).randint(
        0, 256, size=(n, 32, 32, 3), dtype=np.uint8)

    encode_fn = train_loop.build_encode_step(model)
    want = np.asarray(encode_fn(state, images))

    n_chunks = -(-n // chunk)
    order = np.zeros(n_chunks * chunk, np.int32)
    order[:n] = np.arange(n, dtype=np.int32)
    sweep = train_loop.build_encode_sweep(model, n_chunks, chunk)
    got = np.asarray(sweep(state, jnp.asarray(images), jnp.asarray(order)))[:n]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_epoch_vq_step_matches_streaming_step():
    """Device-resident VQ step (images+perm slicing) must reproduce the
    streaming step's metrics for the same batch."""
    import jax
    import jax.numpy as jnp

    from encdiff_tpu.core.config import instantiate_from_config
    from encdiff_tpu.losses.gan import VQLPIPSWithDiscriminator
    from encdiff_tpu.train import vq_trainer

    vq = instantiate_from_config({
        "target": "encdiff_tpu.models.autoencoder.VQModel",
        "params": {"embed_dim": 3, "n_embed": 64, "ddconfig": {
            "double_z": False, "z_channels": 3, "resolution": 32,
            "in_channels": 3, "out_ch": 3, "ch": 32, "ch_mult": [1, 2],
            "num_res_blocks": 1, "attn_resolutions": [], "dropout": 0.0}}})
    loss = VQLPIPSWithDiscriminator(disc_start=0, perceptual_weight=0.0)
    gen_tx, disc_tx = vq_trainer.make_optimizers(1e-4)
    state = vq_trainer.create_vq_train_state(
        vq, loss, jax.random.PRNGKey(0), gen_tx, disc_tx,
        image_resolution=32)

    images = np.random.RandomState(3).randint(
        0, 256, size=(8, 32, 32, 3), dtype=np.uint8)
    perm = np.arange(8, dtype=np.int32)   # 2 steps/epoch x bs 4

    stream = vq_trainer.build_vq_train_step(vq, loss, gen_tx, disc_tx,
                                            donate=False)
    _, m_want = stream(state, images[perm[:4]])

    epoch_fn = vq_trainer.build_epoch_vq_train_step(
        vq, loss, gen_tx, disc_tx, steps_per_epoch=2, donate=False)
    _, m_got = epoch_fn(state, jnp.asarray(images), jnp.asarray(perm))

    for k in m_want:
        np.testing.assert_allclose(float(m_got[k]), float(m_want[k]),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=k)


@pytest.mark.slow
def test_split_mcl_epoch_step_matches_streaming_split():
    """Device-resident split-MCL (gather program + 3 step programs) must
    reproduce the streaming split step for the same gathered batch + rng
    derivation (rng folded from the step counter)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from encdiff_tpu.core.config import instantiate_from_config
    from encdiff_tpu.train import loop as train_loop

    cfg = _flagship_config(model_channels=32, num_res_blocks=1, vq_ch=32,
                           channel_mult=(1, 2), vq_ch_mult=(1, 2),
                           resolution=32)
    cfg["params"].update({"use_mcl": True, "lambda_mcl": 0.05,
                          "mcl_proj_dim": 32})
    model = instantiate_from_config(cfg)
    optimizer = train_loop.build_optimizer(model, learning_rate=1e-5)
    state, frozen = train_loop.create_train_state(
        model, jax.random.PRNGKey(0), optimizer, image_resolution=32)

    n, b = 16, 4
    images = np.random.RandomState(7).randint(
        0, 256, size=(n, 32, 32, 3), dtype=np.uint8)
    images_flat = jnp.asarray(train_loop.flatten_for_device(images))
    perm = jnp.asarray(np.arange(n, dtype=np.int32))
    rng_base = jax.random.PRNGKey(9)

    epoch_step = train_loop.build_split_mcl_epoch_step(
        model, optimizer, steps_per_epoch=n // b)
    se, me = epoch_step(state, frozen, images_flat, perm, rng_base)

    # the split apply-program donates its state: rebuild an identical one
    state2, _ = train_loop.create_train_state(
        model, jax.random.PRNGKey(0), optimizer, image_resolution=32)
    stream_step = train_loop.build_split_mcl_train_step(model, optimizer)
    batch0 = images[:b]
    rng0 = jax.random.fold_in(rng_base, 0)
    ss, ms = stream_step(state2, frozen, batch0, rng0)

    np.testing.assert_allclose(float(me["train/loss"]),
                               float(ms["train/loss"]), rtol=1e-6)
    diffs = jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b_: float(np.abs(np.asarray(a) - np.asarray(b_)).max()),
        se.params, ss.params))
    assert max(diffs) < 1e-6


@pytest.mark.slow
def test_dp_tp_mesh_matches_single_chip(trained_bits):
    """4x2 dp x tp mesh (Megatron attention sharding, parallel/tp.py) must
    reproduce the single-device loss — the sharding rules are pure layout."""
    import jax

    from encdiff_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from encdiff_tpu.parallel.tp import tp_shardings
    from encdiff_tpu.train import loop as train_loop

    model, optimizer, state, frozen = trained_bits
    batch = np.random.RandomState(2).randint(
        0, 256, size=(8, 32, 32, 3), dtype=np.uint8)
    rng = jax.random.PRNGKey(4)

    f1 = train_loop.build_train_step(model, optimizer, donate=False)
    _, m_single = f1(state, frozen, batch, rng)

    mesh = make_mesh(n_data=4, n_model=2)
    ss = tp_shardings(state, mesh)
    state_s = jax.device_put(state, ss)
    frozen_s = jax.device_put(frozen, replicated(mesh))
    ftp = train_loop.build_train_step(model, optimizer, mesh=mesh,
                                      donate=False, state_sharding=ss)
    s_tp, m_tp = ftp(state_s, frozen_s, shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(m_single["train/loss"]),
                               float(m_tp["train/loss"]), rtol=2e-4)
    # qkv kernels really are sharded over the model axis
    flat, _ = jax.tree_util.tree_flatten_with_path(s_tp.params)
    sharded = [p for p, v in flat
               if "to_q" in "/".join(str(k) for k in p)
               and hasattr(v, "sharding")
               and "model" in str(v.sharding.spec)]
    assert sharded, "no to_q kernel carries a model-axis sharding"
