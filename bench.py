"""Benchmark: flagship EncDiff train step throughput on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric (BASELINE.json): UNet denoise train steps/sec/chip at the
reference's flagship setup — Shapes3D 64px images, bs=128, VQ-4-16 first
stage, 20 concept tokens, full jitted train step (frozen VQ encode +
Encoder4 + UNet eps-loss + AdamW + EMA). The reference publishes no
throughput numbers (SURVEY.md §6), so vs_baseline is reported against the
recorded value of the previous round when available (BENCH_r*.json), else 1.0.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: first compile over the remote-compile tunnel
# is minutes-slow; subsequent bench runs reuse it
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
WARMUP = 3
ITERS = int(os.environ.get("BENCH_ITERS", "20"))
# bf16 activations / fp32 params measured faster at the flagship batch
# (58.3 vs 55.6 steps/s at bs=128; see BENCH_NOTES.md). BENCH_DTYPE=float32
# selects the bit-parity mode.
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")


def main():
    from __graft_entry__ import _flagship_config
    from encdiff_tpu.core.config import instantiate_from_config
    from encdiff_tpu.train import loop as train_loop

    dtype = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32
    cfg = _flagship_config()
    cfg["params"]["unet_config"]["params"]["dtype"] = dtype
    cfg["params"]["first_stage_config"]["params"]["dtype"] = dtype
    model = instantiate_from_config(cfg, dtype=dtype)
    optimizer = train_loop.build_optimizer(model, learning_rate=1e-4)
    state, frozen = train_loop.create_train_state(
        model, jax.random.PRNGKey(0), optimizer, image_resolution=64)
    step_fn = train_loop.build_train_step(model, optimizer, donate=True)

    batch = jnp.asarray(
        np.random.RandomState(0)
        .uniform(-1, 1, size=(BATCH, 64, 64, 3))
        .astype(np.float32))
    rngs = [jax.random.PRNGKey(i) for i in range(WARMUP + ITERS)]

    for i in range(WARMUP):
        state, metrics = step_fn(state, frozen, batch, rngs[i])
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = step_fn(state, frozen, batch, rngs[WARMUP + i])
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    steps_per_s = ITERS / dt

    prev = None
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__),
                                           "BENCH_r*.json"))):
        try:
            with open(f) as fh:
                rec = json.load(fh)
            if rec.get("unit", "").startswith("train_steps"):
                prev = rec.get("value")
        except Exception:
            pass
    vs = steps_per_s / prev if prev else 1.0

    print(json.dumps({
        "metric": f"encdiff_shapes3d_train_step_throughput_bs{BATCH}",
        "value": round(steps_per_s, 3),
        "unit": "train_steps/sec/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
