"""End-to-end harness smoke: config YAML -> Trainer -> 2 jitted train steps
on the 8-device CPU mesh, with callbacks, checkpoint save, and logdir layout
(the reference's `python main_val.py -b cfg -t` path, main_val.py:585-874)."""

import os

import numpy as np
import pytest
import yaml


def _tiny_cfg(tmp_path):
    cfg = {
        "model": {
            "base_learning_rate": 1.0e-4,
            "target": "encdiff_tpu.models.latent_diffusion.LatentDiffusion",
            "params": {
                "linear_start": 0.0015, "linear_end": 0.0155,
                "timesteps": 100, "loss_type": "l1",
                "image_size": 8, "channels": 3, "log_every_t": 50,
                "cond_stage_trainable": True, "concat_mode": False,
                "scale_by_std": True, "conditioning_key": "crossattn",
                "monitor": "train/loss_simple",
                "unet_config": {
                    "target": "encdiff_tpu.nn.unet.UNetModel",
                    "params": {"image_size": 8, "in_channels": 3,
                               "out_channels": 3, "model_channels": 32,
                               "attention_resolutions": [1],
                               "num_res_blocks": 1, "channel_mult": [1, 2],
                               "num_heads": 4, "use_scale_shift_norm": True,
                               "resblock_updown": True,
                               "use_spatial_transformer": True,
                               "context_dim": 16, "latent_unit": 10}},
                "first_stage_config": {
                    "target": "encdiff_tpu.models.autoencoder.VQModelInterface",
                    "params": {"embed_dim": 3, "n_embed": 64,
                               "use_disentangled_concat": True,
                               "disentangled_dim": 10,
                               "ddconfig": {"double_z": False,
                                            "z_channels": 3,
                                            "resolution": 16,
                                            "in_channels": 3, "out_ch": 3,
                                            "ch": 32, "ch_mult": [1, 2],
                                            "num_res_blocks": 1,
                                            "attn_resolutions": [],
                                            "dropout": 0.0},
                               "lossconfig": {"target": "torch.nn.Identity"}}},
                "cond_stage_config": {
                    "target": "encdiff_tpu.nn.encoder4.Encoder4",
                    "params": {"d": 32, "context_dim": 16,
                               "latent_unit": 10}},
            },
        },
        "data": {
            "target": "encdiff_tpu.train.data.DataModuleFromConfig",
            "params": {"batch_size": 8, "wrap": True,
                       "train": {"target": "encdiff_tpu.data.datasets.SyntheticData",
                                 "params": {"length": 32, "image_size": 16}},
                       "validation": {"target": "encdiff_tpu.data.datasets.SyntheticData",
                                      "params": {"length": 16,
                                                 "image_size": 16}}}},
        "lightning": {
            "callbacks": {
                "image_logger": {
                    "target": "encdiff_tpu.train.callbacks.ImageLogger",
                    "params": {"batch_frequency": 1000, "max_images": 4,
                               "increase_log_steps": False}}},
            "trainer": {"max_epochs": 1},
        },
    }
    path = os.path.join(tmp_path, "tiny.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


@pytest.mark.slow
def test_harness_end_to_end(tmp_path):
    from encdiff_tpu.train import harness

    cfg_path = _tiny_cfg(str(tmp_path))
    logdir = os.path.join(str(tmp_path), "logs")
    trainer = harness.main([
        "-b", cfg_path, "-t", "true", "--max_steps", "2",
        "-l", logdir, "-s", "7"])
    assert int(np.asarray(trainer.state.step)) == 2
    # logdir layout: configs dumped, checkpoints written
    run_dir = trainer.logdir
    assert os.path.isdir(os.path.join(run_dir, "configs"))
    cfgs = os.listdir(os.path.join(run_dir, "configs"))
    assert any(c.endswith("-project.yaml") for c in cfgs)
    assert os.path.isdir(os.path.join(run_dir, "checkpoints", "last"))
    # LR scaling rule: accum(1) x ndev(8) x bs(8) x base_lr(1e-4)
    assert np.isclose(trainer.learning_rate, 8 * 8 * 1e-4)


@pytest.mark.slow
def test_checkpoint_loads_for_eval_with_grad_accum(tmp_path):
    """Eval-side checkpoint loading must not depend on the run's optimizer
    topology: accumulate_grad_batches wraps AdamW in optax.MultiSteps, whose
    opt_state pytree differs from the plain optimizer's — regression for the
    round-3 faces eval failure (restore with a mismatched abstract tree)."""
    import jax.numpy as jnp

    from encdiff_tpu.core.config import instantiate_from_config, to_plain
    from encdiff_tpu.core.yamlcfg import OmegaConf
    from encdiff_tpu.train import harness
    from encdiff_tpu.train.checkpoint_io import load_model_variables

    cfg_path = _tiny_cfg(str(tmp_path))
    logdir = os.path.join(str(tmp_path), "logs")
    trainer = harness.main([
        "-b", cfg_path, "-t", "true", "--max_steps", "2",
        "-l", logdir, "-s", "7", "--accumulate_grad_batches", "2"])
    ckpt = os.path.join(trainer.logdir, "checkpoints", "last")
    assert os.path.isdir(ckpt)

    model_cfg = to_plain(OmegaConf.load(cfg_path)["model"])
    model = instantiate_from_config(
        {"target": model_cfg["target"], "params": model_cfg["params"]})
    variables, scale_factor = load_model_variables(model, ckpt)
    assert scale_factor > 0
    assert variables["unet"]["params"]
    assert variables["ema"] is not None
    cond_vars = {"params": variables["cond"]["params"],
                 "batch_stats": variables["cond"]["batch_stats"]}
    u = model.cond_encoding(cond_vars, jnp.zeros((2, 16, 16, 3)))
    assert u.shape[0] == 2 and jnp.isfinite(u).all()


def test_token_num_rewiring(tmp_path):
    from encdiff_tpu.train.harness import apply_token_num, load_configs

    cfg_path = _tiny_cfg(str(tmp_path))
    config = load_configs([cfg_path], [])
    config = apply_token_num(config, 12)
    assert config["model"]["params"]["unet_config"]["params"]["latent_unit"] == 12
    assert config["model"]["params"]["cond_stage_config"]["params"]["latent_unit"] == 12
    assert config["model"]["params"]["first_stage_config"]["params"]["disentangled_dim"] == 12


def test_dotlist_override(tmp_path):
    from encdiff_tpu.train.harness import load_configs

    cfg_path = _tiny_cfg(str(tmp_path))
    config = load_configs([cfg_path], ["model.base_learning_rate=3e-5",
                                       "data.params.batch_size=16"])
    assert float(config["model"]["base_learning_rate"]) == 3e-5
    assert int(config["data"]["params"]["batch_size"]) == 16


def _tiny_vq_cfg(tmp_path):
    cfg = {
        "model": {
            "base_learning_rate": 1.0e-4,
            "target": "encdiff_tpu.models.autoencoder.VQModel",
            "params": {
                "embed_dim": 3, "n_embed": 64, "monitor": "val/rec_loss",
                "ddconfig": {"double_z": False, "z_channels": 3,
                             "resolution": 16, "in_channels": 3, "out_ch": 3,
                             "ch": 32, "ch_mult": [1, 2],
                             "num_res_blocks": 1, "attn_resolutions": [],
                             "dropout": 0.0},
                "lossconfig": {
                    "target": "encdiff_tpu.losses.gan.VQLPIPSWithDiscriminator",
                    "params": {"disc_start": 0, "disc_weight": 0.75,
                               "codebook_weight": 1.0,
                               "perceptual_weight": 0.0}}},
        },
        "data": {
            "target": "encdiff_tpu.train.data.DataModuleFromConfig",
            "params": {"batch_size": 8, "wrap": True,
                       "train": {"target": "encdiff_tpu.data.datasets.SyntheticData",
                                 "params": {"length": 32, "image_size": 16}},
                       "validation": {"target": "encdiff_tpu.data.datasets.SyntheticData",
                                      "params": {"length": 16,
                                                 "image_size": 16}}}},
        "lightning": {"trainer": {"max_epochs": 1,
                                  "accumulate_grad_batches": 1}},
    }
    path = os.path.join(tmp_path, "tiny_vq.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


@pytest.mark.slow
def test_harness_vq_gan_end_to_end(tmp_path):
    """Autoencoder config -> VQ-GAN two-optimizer loop via the same CLI
    (reference `main.py --base configs/autoencoder/... -t`, SURVEY.md 3.4)."""
    from encdiff_tpu.train import harness

    cfg_path = _tiny_vq_cfg(str(tmp_path))
    logdir = os.path.join(str(tmp_path), "logs")
    trainer = harness.main([
        "-b", cfg_path, "-t", "true", "--max_steps", "2",
        "-l", logdir, "-s", "3", "--val_batches", "1"])
    assert int(np.asarray(trainer.state.step)) == 2
    assert os.path.isdir(os.path.join(trainer.logdir, "checkpoints", "last"))


def test_synthetic_full_grid_layout_and_registry():
    """The generalized renderer keeps the row-major index layout and every
    factor has a visible pixel effect; the full-grid ground-truth dataset is
    registered with Shapes3D's exact factor table (shapes3d.py:44)."""
    import numpy as np

    from encdiff_tpu.data import synthetic_shapes as ss
    from encdiff_tpu.evalx.ground_truth.named_data import (
        get_named_ground_truth_data)

    sizes = [3, 3, 3, 2, 2, 3]            # tiny grid, same code path
    imgs = ss.render_all(size=32, factor_sizes=sizes)
    assert imgs.shape == (int(np.prod(sizes)), 32, 32, 3)
    assert imgs.dtype == np.uint8

    bases = np.concatenate(
        [np.cumprod(sizes[::-1])[::-1][1:], [1]]).astype(np.int64)
    base_f = np.array([1, 1, 1, 1, 1, 1])
    i0 = int(base_f @ bases)
    for k in range(6):
        f = base_f.copy()
        f[k] = (f[k] + 1) % sizes[k]
        assert (imgs[i0] != imgs[int(f @ bases)]).any(), \
            f"factor {ss.FACTOR_NAMES[k]} has no pixel effect"

    gt = get_named_ground_truth_data("synthetic_shapes_full")
    assert gt.factors_num_values == [10, 10, 10, 8, 4, 15]
    assert len(gt.images) == 480_000
    # index trick: observations are the indices themselves
    rs = np.random.RandomState(0)
    factors = gt.sample_factors(5, rs)
    obs = gt.sample_observations_from_factors(factors, rs)
    assert obs.shape == (5,)


def test_mcl_sweep_resume_skips_completed_cells(tmp_path, monkeypatch):
    """A tunnel hang can kill the sweep mid-matrix; on relaunch, cells whose
    metrics already sit in mcl_sweep.csv must be skipped, error rows and
    missing cells re-run (scripts/run_mcl_sweep.py resume path)."""
    import csv
    import importlib.util
    import sys
    import types

    spec = importlib.util.spec_from_file_location(
        "run_mcl_sweep", "scripts/run_mcl_sweep.py")
    sweep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep)

    logdir = tmp_path / "runs"
    logdir.mkdir()
    done_row = {"mcl_type": "nce_logistic", "lambda": "0.01", "epochs": "1",
                "val/dci_disentanglement": "0.83"}
    err_row = {"mcl_type": "fisher_sm", "lambda": "0.01", "epochs": "1",
               "val/dci_disentanglement": "", "error": "RuntimeError: x"}
    with open(logdir / "mcl_sweep.csv", "w", newline="") as fh:
        keys = sorted(set(done_row) | set(err_row))
        w = csv.DictWriter(fh, fieldnames=keys)
        w.writeheader()
        w.writerows([done_row, err_row])

    ran = []

    class _FakeTrainer:
        last_val_metrics = {"val/dci_disentanglement": 0.9}

    fake_harness = types.SimpleNamespace(
        main=lambda argv: ran.append(argv) or _FakeTrainer())
    fake_train = types.ModuleType("encdiff_tpu.train")
    fake_train.harness = fake_harness
    monkeypatch.setitem(sys.modules, "encdiff_tpu.train", fake_train)
    monkeypatch.setitem(sys.modules, "encdiff_tpu.train.harness",
                        types.ModuleType("encdiff_tpu.train.harness"))
    sys.modules["encdiff_tpu.train.harness"].main = fake_harness.main

    rows = sweep.main(["--base", "b.yaml", "--ckpt", "c",
                       "--mcl_types", "nce_logistic,fisher_sm",
                       "--lambdas", "0.01", "-l", str(logdir)])

    # only the errored cell re-ran; the completed one was skipped, and the
    # stale error row was replaced (no duplicate cell rows)
    assert len(ran) == 1
    assert any("mcl_type=fisher_sm" in a for a in ran[0])
    assert len(rows) == 2
    by_cell = {(r["mcl_type"], float(r["lambda"])): r for r in rows}
    assert by_cell[("nce_logistic", 0.01)]["val/dci_disentanglement"] == "0.83"
    assert by_cell[("fisher_sm", 0.01)]["val/dci_disentanglement"] == 0.9


def test_mcl_sweep_batch_override_and_skip_finale(tmp_path, monkeypatch):
    """The fisher_sm retry path (round 3): --batch_size/--accum must reach
    the harness argv (the Hutchinson grad-of-grad step needs a smaller
    per-dispatch batch on one chip), and --skip_finale must suppress the
    winner full-protocol re-score when re-running individual failed cells."""
    import importlib.util
    import sys
    import types

    spec = importlib.util.spec_from_file_location(
        "run_mcl_sweep", "scripts/run_mcl_sweep.py")
    sweep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep)

    ran = []

    class _FakeTrainer:
        last_val_metrics = {"val/dci_disentanglement": 0.9}
        logdir = str(tmp_path / "cellrun")

    fake_harness = types.SimpleNamespace(
        main=lambda argv: ran.append(argv) or _FakeTrainer())
    fake_train = types.ModuleType("encdiff_tpu.train")
    fake_train.harness = fake_harness
    monkeypatch.setitem(sys.modules, "encdiff_tpu.train", fake_train)
    monkeypatch.setitem(sys.modules, "encdiff_tpu.train.harness",
                        types.ModuleType("encdiff_tpu.train.harness"))
    sys.modules["encdiff_tpu.train.harness"].main = fake_harness.main

    common = ["--base", "b.yaml", "--ckpt", "c", "--mcl_types", "fisher_sm",
              "--lambdas", "0.01", "--batch_size", "64", "--accum", "2"]

    sweep.main(common + ["-l", str(tmp_path / "a"), "--skip_finale"])
    # one cell run, no finale run (finale argv starts with "-r")
    assert len(ran) == 1
    assert "data.params.batch_size=64" in ran[0]
    i = ran[0].index("--accumulate_grad_batches")
    assert ran[0][i + 1] == "2"
    assert "-r" not in ran[0]

    ran.clear()
    sweep.main(common + ["-l", str(tmp_path / "b")])
    # without --skip_finale the winner is re-scored via harness.main(["-r"...])
    assert len(ran) == 2 and ran[1][0] == "-r"
