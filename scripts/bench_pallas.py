"""Pallas kernel in-situ benchmarks on the real chip.

Measures (with honest host-fetch barriers — BENCH_NOTES.md round-2
correction):
  1. flagship train step + DDIM forward with/without the fused GN+SiLU
     kernels (ENCDIFF_PALLAS=gn),
  2. the CelebA-scale 4096-token UNet fwd+bwd with/without the blockwise
     flash self-attention (ENCDIFF_PALLAS=flash).

Each variant runs in a fresh subprocess so the env flag is set before any
module traces. Results print as one JSON block for BENCH_NOTES.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import os, sys, time, json
import numpy as np
sys.path.insert(0, os.environ["ENCDIFF_REPO"])
import jax, jax.numpy as jnp
from encdiff_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
from __graft_entry__ import _flagship_config
from encdiff_tpu.core.config import instantiate_from_config
from encdiff_tpu.train import loop as train_loop

MODE = os.environ["BENCH_MODE"]
ITERS = int(os.environ.get("BENCH_ITERS", "20"))
out = {"mode": MODE, "pallas": os.environ.get("ENCDIFF_PALLAS", "")}

if MODE == "flagship":
    dtype = jnp.bfloat16
    cfg = _flagship_config()
    cfg["params"]["unet_config"]["params"]["dtype"] = dtype
    cfg["params"]["first_stage_config"]["params"]["dtype"] = dtype
    model = instantiate_from_config(cfg, dtype=dtype)
    opt = train_loop.build_optimizer(model, learning_rate=1e-4)
    state, frozen = train_loop.create_train_state(
        model, jax.random.PRNGKey(0), opt, image_resolution=64)
    step = train_loop.build_train_step(model, opt, donate=True)
    batch = jnp.asarray(np.random.RandomState(0)
                        .uniform(-1, 1, (128, 64, 64, 3)).astype(np.float32))
    state, m = step(state, frozen, batch, jax.random.PRNGKey(0))
    jax.device_get(m)
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, m = step(state, frozen, batch, jax.random.PRNGKey(1 + i))
    jax.device_get(m)
    out["train_steps_per_s"] = round(ITERS / (time.perf_counter() - t0), 2)

    # DDIM forward (kernels matter most in the fwd-only path: no custom-vjp
    # boundary effects)
    from encdiff_tpu.core.schedules import DDIMSchedule
    from encdiff_tpu.diffusion import ddim as ddim_lib

    cond_vars = {"params": state.params["cond"],
                 "batch_stats": state.batch_stats}
    dsched = DDIMSchedule.create(model.schedule, 200, eta=1.0)

    def sample_fn(unet_params, cond_vars, fs_vars, images, rng):
        u = model.cond_encoding(cond_vars, images)
        tokens = model.cond_warp(cond_vars, u)
        if tokens.ndim == 3:
            tokens = tokens.reshape(tokens.shape[0], -1)
        shape = (128, model.image_size, model.image_size, model.channels)
        denoise = lambda x, t: model.apply_model(
            {"params": unet_params}, x, t, tokens)
        z, _ = ddim_lib.ddim_sample(dsched, denoise, shape, rng)
        return model.decode_first_stage(fs_vars, z, scale_factor=1.0)

    sj = jax.jit(sample_fn)
    o = sj(state.params["unet"], cond_vars, frozen["first_stage"], batch,
           jax.random.PRNGKey(7))
    np.asarray(o)
    t0 = time.perf_counter()
    for i in range(3):
        o = sj(state.params["unet"], cond_vars, frozen["first_stage"],
               batch, jax.random.PRNGKey(11 + i))
    np.asarray(o)
    out["ddim200_samples_per_s"] = round(3 * 128 / (time.perf_counter() - t0),
                                         1)
elif MODE == "celeba_unet":
    # CelebA f=4 denoiser: 64x64x3 latents, 4096-token self-attention
    from encdiff_tpu.nn.unet import UNetModel

    dtype = jnp.bfloat16
    unet = UNetModel(image_size=64, in_channels=3, out_channels=3,
                     model_channels=64, attention_resolutions=[1, 2, 4],
                     num_res_blocks=2, channel_mult=[1, 2, 4, 4],
                     num_heads=8, use_scale_shift_norm=True,
                     resblock_updown=True, use_spatial_transformer=True,
                     context_dim=16, latent_unit=20, dtype=dtype)
    B = int(os.environ.get("BENCH_CELEBA_BS", "8"))
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(B, 64, 64, 3).astype(np.float32))
    t = jnp.zeros((B,), jnp.int32) + 500
    ctx = jnp.asarray(np.random.RandomState(1)
                      .randn(B, 320).astype(np.float32))
    variables = unet.init(jax.random.PRNGKey(0), x, t, ctx)

    def loss(params):
        return jnp.mean(jnp.abs(unet.apply({"params": params}, x, t, ctx)))

    g = jax.jit(jax.grad(loss))
    r = g(variables["params"])
    jax.device_get(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = g(variables["params"])
    jax.device_get(jax.tree_util.tree_leaves(r)[0])
    out["unet_fwdbwd_iters_per_s"] = round(ITERS / (time.perf_counter() - t0),
                                           2)
    out["batch"] = B
print("RESULT " + json.dumps(out))
"""


def run(mode: str, pallas: str, iters: int = 20):
    env = dict(os.environ)
    env["BENCH_MODE"] = mode
    env["BENCH_ITERS"] = str(iters)
    env["ENCDIFF_REPO"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    if pallas:
        env["ENCDIFF_PALLAS"] = pallas
    else:
        env.pop("ENCDIFF_PALLAS", None)
    p = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                       capture_output=True, text=True, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print(p.stdout[-2000:], file=sys.stderr)
    print(p.stderr[-2000:], file=sys.stderr)
    return {"mode": mode, "pallas": pallas, "error": p.returncode}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="flagship,celeba_unet")
    ap.add_argument("--iters", type=int, default=20)
    opt = ap.parse_args()
    results = []
    for mode in opt.modes.split(","):
        variants = ["", "gn"] if mode == "flagship" else ["", "flash"]
        for pallas in variants:
            print(f"--- {mode} ENCDIFF_PALLAS={pallas!r} ---", flush=True)
            res = run(mode, pallas, opt.iters)
            print(json.dumps(res), flush=True)
            results.append(res)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
