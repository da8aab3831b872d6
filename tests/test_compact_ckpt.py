"""Compact (fp16 npz) checkpoints: round-trip, eval loading, resume.

The box loses gitignored ``runs_*/`` trees on reboot, so flagship weights
are snapshotted into ``demo_artifacts/`` as fp16 npz files
(``encdiff_tpu/core/compact_ckpt.py``). These tests pin the contract:
lossless-modulo-fp16 round-trip, `load_model_variables` accepting ``.npz``,
and `Trainer.restore_checkpoint` strict=False merge from ``.npz``.
"""

import os

import numpy as np
import pytest


def test_compact_roundtrip_tree_structure(tmp_path):
    from encdiff_tpu.core.compact_ckpt import load_compact, save_compact

    state = {
        "params": {"unet": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                            "b": np.zeros((3,), np.float32)},
                   "cond": {"k": np.full((4,), 0.25, np.float32)}},
        "batch_stats": {"cond": {"mean": np.ones((4,), np.float32)}},
        "scale_factor": np.float32(1.5),
        "step": np.int64(42),
        "ema": {"params": {"unet": {"w": np.ones((2, 3), np.float32)}}},
    }
    frozen = {"first_stage": {"params": {"q": np.eye(3, dtype=np.float32)}}}
    path = os.path.join(str(tmp_path), "c.npz")
    save_compact(path, state, frozen)

    tree = load_compact(path)
    st, fz = tree["state"], tree["frozen"]
    # fp32 restored (values survive fp16 narrowing exactly for these inputs)
    np.testing.assert_array_equal(st["params"]["unet"]["w"],
                                  state["params"]["unet"]["w"])
    assert st["params"]["unet"]["w"].dtype == np.float32
    np.testing.assert_array_equal(fz["first_stage"]["params"]["q"], np.eye(3))
    assert float(st["scale_factor"]) == 1.5
    assert int(st["step"]) == 42
    np.testing.assert_array_equal(st["ema"]["params"]["unet"]["w"],
                                  np.ones((2, 3)))


def test_compact_fp16_narrowing_tolerance(tmp_path):
    from encdiff_tpu.core.compact_ckpt import load_compact, save_compact

    rng = np.random.default_rng(0)
    w = rng.normal(size=(32, 32)).astype(np.float32)
    path = os.path.join(str(tmp_path), "c.npz")
    save_compact(path, {"params": {"unet": {"w": w}}, "scale_factor": 1.0,
                        "step": 0}, {"first_stage": {}})
    back = load_compact(path)["state"]["params"]["unet"]["w"]
    # fp16 relative error bound for O(1) weights
    assert np.max(np.abs(back - w)) < 1e-3


@pytest.mark.slow
def test_compact_export_eval_and_resume(tmp_path):
    """Train 2 steps -> export npz -> eval-load + resume-restore from it."""
    import jax.numpy as jnp

    from tests.test_harness import _tiny_cfg
    from encdiff_tpu.core.checkpoints import restore_pytree
    from encdiff_tpu.core.compact_ckpt import save_compact
    from encdiff_tpu.core.config import instantiate_from_config, to_plain
    from encdiff_tpu.core.yamlcfg import OmegaConf
    from encdiff_tpu.train import harness
    from encdiff_tpu.train.checkpoint_io import load_model_variables

    cfg_path = _tiny_cfg(str(tmp_path))
    logdir = os.path.join(str(tmp_path), "logs")
    trainer = harness.main([
        "-b", cfg_path, "-t", "true", "--max_steps", "2",
        "-l", logdir, "-s", "7"])
    ckpt = os.path.join(trainer.logdir, "checkpoints", "last")

    npz = os.path.join(str(tmp_path), "compact.npz")
    tree = restore_pytree(os.path.abspath(ckpt))
    save_compact(npz, tree["state"], tree["frozen"])

    # eval-side consumer
    model_cfg = to_plain(OmegaConf.load(cfg_path)["model"])
    model = instantiate_from_config(
        {"target": model_cfg["target"], "params": model_cfg["params"]})
    variables, scale_factor = load_model_variables(model, npz)
    ref_vars, ref_scale = load_model_variables(model, ckpt)
    assert np.isclose(scale_factor, ref_scale)
    cond_vars = {"params": variables["cond"]["params"],
                 "batch_stats": variables["cond"]["batch_stats"]}
    x = jnp.zeros((2, 16, 16, 3))
    u = model.cond_encoding(cond_vars, x)
    u_ref = model.cond_encoding(
        {"params": ref_vars["cond"]["params"],
         "batch_stats": ref_vars["cond"]["batch_stats"]}, x)
    assert np.max(np.abs(np.asarray(u) - np.asarray(u_ref))) < 1e-2

    # resume consumer: strict=False merge leaves optimizer slots at init;
    # one further step on the restored weights proves the path executes
    # (max_steps=1 stops as soon as the restored step counter exceeds it)
    trainer2 = harness.main([
        "-b", cfg_path, "-t", "true", "--max_steps", "1",
        "-l", os.path.join(str(tmp_path), "logs2"), "-s", "8",
        "--resume_ckpt", npz])
    w2 = np.asarray(jnp.asarray(
        next(iter(_leaves(trainer2.state.params["unet"])))))
    assert np.isfinite(w2).all()
    assert int(np.asarray(trainer2.state.step)) >= 2


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


def test_compact_vq_roundtrip_and_first_stage_load(tmp_path):
    """save_compact_vq drops the Adam slots and the npz loads back through
    VQModel.load_reference_checkpoint's .npz branch (round-5: VQ stages get
    the same reboot insurance as LDM states)."""
    from encdiff_tpu.core.compact_ckpt import load_compact, save_compact_vq

    state = {
        "gen_params": {"encoder": {
            "w": np.arange(8, dtype=np.float32).reshape(2, 4)}},
        "disc_params": {"d": np.full((3,), 0.5, np.float32)},
        "disc_batch_stats": {"d": {"mean": np.zeros((3,), np.float32)}},
        "gen_opt": {"mu": np.ones((2, 4), np.float32)},   # must be dropped
        "disc_opt": {"nu": np.ones((3,), np.float32)},    # must be dropped
        "loss_vars": {},
        "step": np.int64(7),
    }
    path = os.path.join(str(tmp_path), "vq.npz")
    save_compact_vq(path, state)
    tree = load_compact(path)["state"]
    assert "gen_opt" not in tree and "disc_opt" not in tree
    np.testing.assert_allclose(
        tree["gen_params"]["encoder"]["w"],
        state["gen_params"]["encoder"]["w"], rtol=1e-3)
    assert int(tree["step"]) == 7
