"""The jitted LDM training loop: optimizer, EMA, scale-by-std, sharding.

TPU-native replacement for the reference's Lightning training plumbing
(``ddpm_enc.py:360-401`` training_step/on_train_batch_end,
``:1598-1648`` configure_optimizers, ``main_val.py:834-838`` LR scaling).
Everything Lightning spreads across framework hooks — forward, backward,
optimizer step, EMA update, LR schedule, grad accumulation, DDP all-reduce —
is ONE XLA program here: ``build_train_step`` returns a jitted function whose
gradient all-reduce is inserted by GSPMD because the batch is sharded over
the mesh ``data`` axis while params/grads are replicated.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from encdiff_tpu.core import ema as ema_lib
from encdiff_tpu.core.config import instantiate_from_config, to_plain
from encdiff_tpu.core.lr_scheduler import as_optax_schedule
from jax.sharding import NamedSharding

from encdiff_tpu.parallel.mesh import batch_sharding, replicated


def _as_images(batch):
    """uint8 device batches -> [-1,1] float32 (on-device normalize)."""
    if jnp.issubdtype(batch.dtype, jnp.integer):
        return batch.astype(jnp.float32) / 127.5 - 1.0
    return batch.astype(jnp.float32)


def flatten_for_device(images):
    """Flatten a (N, H, W, 3) host image array to (N, H*W*3) before
    ``device_put``: the TPU tiled layout pads a trailing dim of 3 to ~2x
    the bytes (u8[480k,64,64,3] padded 5.49G -> 10.99G, an HBM OOM with
    the program), while a last dim that's a multiple of 128 is packed
    tight. ``gather_images`` undoes it after the per-batch gather."""
    return images.reshape(len(images), -1)


def gather_images(images, idx, hwc=None):
    """Device-side batch gather; restores (B, H, W, C) from the flat
    layout. ``hwc`` gives the per-row shape explicitly (latent caches with
    C != 3); default infers square 3-channel images — every supported
    image dataset."""
    batch = jnp.take(images, idx, axis=0)
    if batch.ndim == 2:
        if hwc is None:
            hw = batch.shape[1] // 3
            side = round(float(np.sqrt(hw)))
            assert side * side * 3 == batch.shape[1], batch.shape
            hwc = (side, side, 3)
        batch = batch.reshape(batch.shape[0], *hwc)
    return batch


def gather_batch(images, idx, latent_hwc=None):
    """``gather_images`` over the device cache: a plain image array, or the
    precomputed-latent dict ``{"image": flat imgs, "z": flat codes}``
    (harness --cache_latents). Returns the batch in the shape
    ``LatentDiffusion.split_batch`` expects."""
    if isinstance(images, dict):
        return {"image": gather_images(images["image"], idx),
                "z": gather_images(images["z"], idx, hwc=latent_hwc)}
    return gather_images(images, idx)


def precompute_latents(model, frozen, images_dev, chunk: int = 2048):
    """One-time frozen first-stage encode of the whole device-resident image
    cache (precomputed-latent training; see ``LatentDiffusion.split_batch``).

    The VQModelInterface encode is a pure conv stack — deterministic — so
    this trades the per-step encode (the largest-activation convs in the
    train step, ~14% of its FLOPs at 64px) for one pass at startup plus
    N*h*w*c latents resident in HBM (0.7 GB at 480k/16x16x3/f32 — next to
    the 5.5 GB uint8 image cache itself).

    Returns ``({"image": images_dev, "z": flat z}, (h, w, c))`` ready for
    ``build_epoch_train_step(..., latent_hwc=...)``. One compiled program,
    ceil(N/chunk) dispatches; the final chunk re-encodes overlapping rows
    so every dispatch has static shapes.
    """
    n, d = images_dev.shape
    side = round(float(np.sqrt(d // 3)))
    assert side * side * 3 == d, images_dev.shape
    # Encoder activations scale with side^2 (first-conv fp32 activations are
    # side*side*ch*4 per image); chunk=2048 is proven at 64px, so shrink
    # quadratically for larger inputs (256px -> 128/chunk) to keep the
    # one-time encode inside single-chip HBM.
    if side > 64:
        chunk = max(64, int(chunk * (64.0 / side) ** 2))
    chunk = int(min(chunk, n))
    is_int = jnp.issubdtype(images_dev.dtype, jnp.integer)

    hwc_box = []

    @jax.jit
    def enc(fs_vars, flat, start):
        rows = jax.lax.dynamic_slice(flat, (start, 0), (chunk, d))
        x = rows.reshape(chunk, side, side, 3)
        x = (x.astype(jnp.float32) / 127.5 - 1.0) if is_int \
            else x.astype(jnp.float32)
        z = model.encode_first_stage(fs_vars, x)
        hwc_box.append(tuple(int(v) for v in z.shape[1:]))  # trace-time
        return z.reshape(chunk, -1)

    starts = list(range(0, n - chunk + 1, chunk))
    if starts[-1] + chunk < n:
        starts.append(n - chunk)  # overlapping final chunk, trimmed below
    parts = []
    prev_end = 0
    for i, s in enumerate(starts):
        zc = enc(frozen["first_stage"], images_dev, jnp.int32(s))
        parts.append(zc[prev_end - s:] if s < prev_end else zc)
        prev_end = s + chunk
        if i % 50 == 0:  # keep stall watchdogs fed on long chunked encodes
            print(f"[precompute_latents] chunk {i + 1}/{len(starts)}",
                  flush=True)
    z_flat = jnp.concatenate(parts, axis=0)
    assert z_flat.shape[0] == n, (z_flat.shape, n)
    return {"image": images_dev, "z": z_flat}, hwc_box[0]


class TrainState(NamedTuple):
    """Carry for the jitted train step. A pure pytree (orbax-serializable)."""

    step: jnp.ndarray                 # int32 global step
    params: Any                       # {"unet","cond"[,"logvar"][,"mcl"]}
    batch_stats: Any                  # cond-stage BatchNorm running stats
    opt_state: Any
    ema: ema_lib.EmaState | None      # EMA over the unet subtree only
    scale_factor: jnp.ndarray         # f32 scalar (scale_by_std fills step 0)


def scaled_learning_rate(base_lr: float, global_batch: int, ngpu: int = 1,
                         accumulate: int = 1) -> float:
    """Reference LR scaling rule: accum x ndev x bs x base_lr
    (``main_val.py:834-838``). ``global_batch`` here is the per-device batch
    in the reference's convention; we pass per-device bs and mesh size."""
    return accumulate * ngpu * global_batch * base_lr


def build_optimizer(model, learning_rate: float, accumulate: int = 1):
    """AdamW + optional reference LR-lambda schedule
    (``ddpm_enc.py:1598-1648``: torch.optim.AdamW + LambdaLR)."""
    if getattr(model, "scheduler_config", None) is not None:
        sched_obj = instantiate_from_config(to_plain(model.scheduler_config))
        lr = as_optax_schedule(sched_obj, learning_rate)
    else:
        lr = learning_rate
    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2)
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx


def create_train_state(model, rng, optimizer, image_resolution: int = 64,
                       ema_decay: float = 0.9999) -> tuple[TrainState, Any]:
    """Init params + opt state. Returns (state, frozen) where ``frozen`` holds
    the first-stage variables (never optimized, passed alongside the state)."""
    variables = model.init_variables(rng, image_resolution=image_resolution)
    trainable = {"unet": variables["unet"]["params"]}
    batch_stats = {}
    if "cond" in variables:
        trainable["cond"] = variables["cond"]["params"]
        batch_stats = variables["cond"].get("batch_stats", {})
    if model.learn_logvar:
        trainable["logvar"] = jnp.asarray(model.logvar)
    if "mcl" in variables:
        trainable["mcl"] = variables["mcl"]
    opt_state = optimizer.init(trainable)
    ema = ema_lib.init(trainable["unet"]) if model.use_ema else None
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=trainable,
        batch_stats=batch_stats,
        opt_state=opt_state,
        ema=ema,
        scale_factor=jnp.asarray(model.scale_factor, jnp.float32),
    )
    frozen = {"first_stage": variables["first_stage"]}
    return state, frozen


def build_train_step(model, optimizer, mesh=None, ema_decay: float = 0.9999,
                     donate: bool = True, state_sharding=None):
    """Returns ``train_step(state, frozen, batch, rng) -> (state, metrics)``.

    - scale_by_std: on global step 0, scale_factor <- 1/std(encode(batch))
      (reference ``on_train_batch_start``, ``ddpm_enc.py:650-660``), folded
      into the same XLA program via ``lax.cond``.
    - EMA update on the unet subtree after the optimizer step
      (``ddpm_enc.py:399-401`` on_train_batch_end).
    - With a mesh: batch sharded over ``data``, state replicated; GSPMD
      emits the gradient all-reduce (the reference's NCCL allreduce).
    - ``state_sharding``: optional NamedSharding tree over the TrainState
      (``parallel.tp.tp_shardings``) for dp+tp meshes; defaults to
      replicated.
    """

    def train_step(state: TrainState, frozen, batch, rng):
        if model.scale_by_std:
            sf = jax.lax.cond(
                state.step == 0,
                lambda: model.compute_scale_factor(frozen, batch),
                lambda: state.scale_factor)
        else:
            sf = state.scale_factor

        frozen_in = {"first_stage": frozen["first_stage"],
                     "cond_batch_stats": state.batch_stats}
        grad_fn = jax.value_and_grad(
            lambda p: model.loss_fn(p, frozen_in, batch, rng, sf, train=True),
            has_aux=True)
        (loss, (loss_dict, new_stats)), grads = grad_fn(state.params)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)

        ema = state.ema
        if ema is not None:
            ema = ema_lib.update(ema, params["unet"], decay=ema_decay)

        metrics = dict(loss_dict)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1, params=params, batch_stats=new_stats,
            opt_state=opt_state, ema=ema, scale_factor=sf)
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    ss = state_sharding if state_sharding is not None else repl
    return jax.jit(
        train_step,
        in_shardings=(ss, repl, bsh, repl),
        out_shardings=(ss, repl),
        donate_argnums=(0,) if donate else (),
    )


def build_split_mcl_train_step(model, optimizer, mesh=None,
                               ema_decay: float = 0.9999):
    """MCL fine-tune step as THREE XLA programs instead of one.

    The fused MCL step (UNet fwd+bwd + nested grads through the frozen VQ
    decoder + critic) lowers to an HLO proto past the ~8 MB body limit of
    HTTP remote-compile tunnels (round-1 413; BENCH_NOTES.md). Splitting
    puts each program well under the limit while computing bit-identical
    gradients — the losses are additive, so

        d(loss_diff + lambda*mcl)/dp = grads_diff + grads_mcl.

    Programs: (A) diffusion loss grads (loss_fn with_mcl=False, ~the plain
    step's program), (B) lambda*mcl grads wrt the same param tree (no UNet —
    cond encoder + VQ decode + nested critic grads only), (C) grad sum +
    AdamW + EMA + state update (tiny). Same call signature as
    ``build_train_step``; ~3 dispatches/step (dispatch is async, so the
    overhead is pipelined away on a busy device).

    Reference behavior match: ddpm_enc.py:1216-1248 (single fused loss) +
    the per-group grad-norm logging of on_before_optimizer_step
    (ddpm_enc.py:1023-1038) — split grads give us grad_norm_diffusion /
    grad_norm_mcl for free.
    """

    def diff_fn(state: TrainState, frozen, batch, rng):
        if model.scale_by_std:
            sf = jax.lax.cond(
                state.step == 0,
                lambda: model.compute_scale_factor(frozen, batch),
                lambda: state.scale_factor)
        else:
            sf = state.scale_factor
        frozen_in = {"first_stage": frozen["first_stage"],
                     "cond_batch_stats": state.batch_stats}
        grad_fn = jax.value_and_grad(
            lambda p: model.loss_fn(p, frozen_in, batch, rng, sf,
                                    train=True, with_mcl=False),
            has_aux=True)
        (loss, (loss_dict, new_stats)), grads = grad_fn(state.params)
        return sf, grads, loss, loss_dict, new_stats

    def mcl_fn(params, batch_stats, frozen, batch, rng, sf):
        frozen_in = {"first_stage": frozen["first_stage"],
                     "cond_batch_stats": batch_stats}
        grad_fn = jax.value_and_grad(
            lambda p: model.mcl_loss_fn(p, frozen_in, batch, rng, sf),
            has_aux=True)
        (_, mcl_dict), grads = grad_fn(params)
        return grads, mcl_dict

    def apply_fn(state: TrainState, grads_d, grads_m, loss, loss_dict,
                 mcl_dict, new_stats, sf):
        grads = jax.tree.map(jnp.add, grads_d, grads_m)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if ema is not None:
            ema = ema_lib.update(ema, params["unet"], decay=ema_decay)
        metrics = dict(loss_dict)
        metrics.update(mcl_dict)
        mcl_val = mcl_dict["train/loss_mcl"]
        total = loss + model.lambda_mcl * mcl_val
        metrics["train/loss"] = total
        metrics["train/mcl_diffusion_ratio"] = mcl_val / jnp.maximum(
            loss_dict["train/loss_simple"], 1e-12)
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["grad_norm_diffusion"] = optax.global_norm(grads_d)
        metrics["grad_norm_mcl"] = optax.global_norm(grads_m)
        new_state = TrainState(
            step=state.step + 1, params=params, batch_stats=new_stats,
            opt_state=opt_state, ema=ema, scale_factor=sf)
        return new_state, metrics

    if mesh is None:
        diff_jit = jax.jit(diff_fn)
        mcl_jit = jax.jit(mcl_fn)
        apply_jit = jax.jit(apply_fn, donate_argnums=(0, 1, 2))
    else:
        repl = replicated(mesh)
        bsh = batch_sharding(mesh)
        diff_jit = jax.jit(diff_fn,
                           in_shardings=(repl, repl, bsh, repl),
                           out_shardings=repl)
        mcl_jit = jax.jit(mcl_fn,
                          in_shardings=(repl, repl, repl, bsh, repl, repl),
                          out_shardings=repl)
        apply_jit = jax.jit(apply_fn, in_shardings=repl,
                            out_shardings=(repl, repl),
                            donate_argnums=(0, 1, 2))

    def train_step(state: TrainState, frozen, batch, rng):
        sf, grads_d, loss, loss_dict, new_stats = diff_jit(
            state, frozen, batch, rng)
        grads_m, mcl_dict = mcl_jit(state.params, state.batch_stats,
                                    frozen, batch, rng, sf)
        return apply_jit(state, grads_d, grads_m, loss, loss_dict,
                         mcl_dict, new_stats, sf)

    return train_step


def build_split_mcl_epoch_step(model, optimizer, steps_per_epoch: int,
                               mesh=None, ema_decay: float = 0.9999,
                               latent_hwc=None):
    """Device-resident-data variant of ``build_split_mcl_train_step`` with
    the epoch-step call signature ``step(state, frozen, images, perm,
    rng_base)``: a fourth (tiny) program slices the epoch permutation and
    gathers the batch on device, so split-MCL mode keeps the
    one-upload-per-epoch input path instead of streaming host batches."""
    split = build_split_mcl_train_step(model, optimizer, mesh=mesh,
                                       ema_decay=ema_decay)

    def gather_fn(state_step, images, perm):
        i = (state_step % steps_per_epoch).astype(jnp.int32)
        b = perm.shape[0] // steps_per_epoch
        idx = jax.lax.dynamic_slice(perm, (i * b,), (b,))
        return gather_batch(images, idx, latent_hwc=latent_hwc)

    if mesh is None:
        gather_jit = jax.jit(gather_fn)
    else:
        repl = replicated(mesh)
        gather_jit = jax.jit(gather_fn, in_shardings=(repl, repl, repl),
                             out_shardings=batch_sharding(mesh))

    def step(state: TrainState, frozen, images, perm, rng_base):
        batch = gather_jit(state.step, images, perm)
        rng = jax.random.fold_in(rng_base, state.step)
        return split(state, frozen, batch, rng)

    return step


def build_indexed_train_step(model, optimizer, mesh=None,
                             ema_decay: float = 0.9999, donate: bool = True):
    """Device-resident-data variant: the WHOLE uint8 dataset lives in HBM
    (Shapes3D is 5.9 GB — fits a v5e's 16 GB) and each step receives only a
    (B,) index vector; the batch gather runs on device. Removes the
    per-step host->HBM image transfer entirely — the TPU-first answer to
    the reference's num_workers tuning (SURVEY.md H2).

    ``images`` is an explicit argument of the returned
    ``step(state, frozen, images, idx, rng)`` — closing over the array
    would embed it as an HLO constant (and, on remote-compile setups, ship
    the whole dataset with every compile request).
    """

    def train_step(state: TrainState, frozen, images, idx, rng):
        batch = gather_images(images, idx)
        if model.scale_by_std:
            sf = jax.lax.cond(
                state.step == 0,
                lambda: model.compute_scale_factor(frozen, batch),
                lambda: state.scale_factor)
        else:
            sf = state.scale_factor
        frozen_in = {"first_stage": frozen["first_stage"],
                     "cond_batch_stats": state.batch_stats}
        grad_fn = jax.value_and_grad(
            lambda p: model.loss_fn(p, frozen_in, batch, rng, sf, train=True),
            has_aux=True)
        (loss, (loss_dict, new_stats)), grads = grad_fn(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if ema is not None:
            ema = ema_lib.update(ema, params["unet"], decay=ema_decay)
        metrics = dict(loss_dict)
        new_state = TrainState(
            step=state.step + 1, params=params, batch_stats=new_stats,
            opt_state=opt_state, ema=ema, scale_factor=sf)
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())
    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(train_step,
                   in_shardings=(repl, repl, repl, bsh, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,) if donate else ())


def build_epoch_train_step(model, optimizer, steps_per_epoch: int,
                           mesh=None, ema_decay: float = 0.9999,
                           donate: bool = True, latent_hwc=None):
    """Fully device-driven step: ONE dispatch per step, zero per-step host
    work. The epoch permutation lives on device; the step slices its batch
    indices at ``state.step % steps_per_epoch`` and derives its rng with
    ``fold_in(rng_base, state.step)`` — no host-side ``random.split`` or
    index upload (each of those costs a dispatch round-trip, which
    dominates on remote/tunneled TPUs).

    Returns ``step(state, frozen, images, perm, rng_base)``; upload a fresh
    ``perm`` once per epoch. ``images`` may be the precomputed-latent dict
    (see ``gather_batch``); pass its row shape as ``latent_hwc``.
    """

    def train_step(state: TrainState, frozen, images, perm, rng_base):
        i = (state.step % steps_per_epoch).astype(jnp.int32)
        b = perm.shape[0] // steps_per_epoch
        idx = jax.lax.dynamic_slice(perm, (i * b,), (b,))
        batch = gather_batch(images, idx, latent_hwc=latent_hwc)
        rng = jax.random.fold_in(rng_base, state.step)
        if model.scale_by_std:
            sf = jax.lax.cond(
                state.step == 0,
                lambda: model.compute_scale_factor(frozen, batch),
                lambda: state.scale_factor)
        else:
            sf = state.scale_factor
        frozen_in = {"first_stage": frozen["first_stage"],
                     "cond_batch_stats": state.batch_stats}
        grad_fn = jax.value_and_grad(
            lambda p: model.loss_fn(p, frozen_in, batch, rng, sf, train=True),
            has_aux=True)
        (loss, (loss_dict, new_stats)), grads = grad_fn(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if ema is not None:
            ema = ema_lib.update(ema, params["unet"], decay=ema_decay)
        new_state = TrainState(
            step=state.step + 1, params=params, batch_stats=new_stats,
            opt_state=opt_state, ema=ema, scale_factor=sf)
        return new_state, loss_dict

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())
    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(train_step,
                   in_shardings=(repl, repl, repl, repl, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,) if donate else ())


def build_scan_train_step(model, optimizer, k: int = 4, mesh=None,
                          ema_decay: float = 0.9999, donate: bool = True):
    """K training steps fused into ONE XLA program via lax.scan over a
    (K, B) index matrix. Metrics are returned per sub-step (stacked).
    Requires device-resident ``images`` (uint8, HBM).

    MEASURED SLOWER than the single-step path at the flagship config
    (23.9 vs 55.6 steps/s, k=8, bs=128 on one v5e): the scan carry holds
    the full param+Adam state and XLA materializes carry copies per
    iteration, outweighing the k-fold dispatch amortization. Useful only
    for small models where per-step dispatch dominates; the harness
    default stays the single-step donated path.
    """

    def one_step(carry, idx):
        state, rng, images = carry
        rng, srng = jax.random.split(rng)
        batch = gather_images(images, idx)
        if model.scale_by_std:
            sf = jax.lax.cond(
                state.step == 0,
                lambda: model.compute_scale_factor(
                    {"first_stage": frozen_holder[0]}, batch),
                lambda: state.scale_factor)
        else:
            sf = state.scale_factor
        frozen_in = {"first_stage": frozen_holder[0],
                     "cond_batch_stats": state.batch_stats}
        grad_fn = jax.value_and_grad(
            lambda p: model.loss_fn(p, frozen_in, batch, srng, sf,
                                    train=True), has_aux=True)
        (loss, (loss_dict, new_stats)), grads = grad_fn(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if ema is not None:
            ema = ema_lib.update(ema, params["unet"], decay=ema_decay)
        new_state = TrainState(
            step=state.step + 1, params=params, batch_stats=new_stats,
            opt_state=opt_state, ema=ema, scale_factor=sf)
        return (new_state, rng, images), loss_dict

    frozen_holder = [None]

    def train_k_steps(state: TrainState, frozen, images, idx_matrix, rng):
        # frozen rides through a mutable closure cell so one_step stays a
        # clean scan body (it is re-traced per call anyway)
        frozen_holder[0] = frozen["first_stage"]
        (state, _, _), metrics = jax.lax.scan(one_step, (state, rng, images),
                                              idx_matrix)
        return state, metrics

    if mesh is None:
        return jax.jit(train_k_steps, donate_argnums=(0,) if donate else ())
    repl = replicated(mesh)
    bsh = NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data"))
    return jax.jit(train_k_steps,
                   in_shardings=(repl, repl, repl, bsh, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,) if donate else ())


def build_unrolled_train_step(model, optimizer, k: int = 4, mesh=None,
                              ema_decay: float = 0.9999, donate: bool = True):
    """K training steps per dispatch with the loop UNROLLED inside one jit.

    Same signature as ``build_scan_train_step``:
    ``step(state, frozen, images, idx_matrix, rng) -> (state, metrics)``
    with ``idx_matrix`` of shape (K, B) and device-resident ``images``;
    ``metrics`` is the last sub-step's loss dict.

    Unlike the scan variant, XLA sees straight-line code, so the param/Adam
    state threads through in place instead of the while-loop's
    double-buffered carry (the measured cost of ``build_scan_train_step``'s
    23.9 steps/s). The price is an HLO ~k`x` the single step — keep k small
    on remote-compile tunnels (~8 MB proto cap, BENCH_NOTES.md).
    """

    def train_k_steps(state: TrainState, frozen, images, idx_matrix, rng):
        metrics = None
        for j in range(k):
            batch = gather_images(images, idx_matrix[j])
            srng = jax.random.fold_in(rng, j)
            if model.scale_by_std:
                sf = jax.lax.cond(
                    state.step == 0,
                    lambda b=batch: model.compute_scale_factor(frozen, b),
                    lambda: state.scale_factor)
            else:
                sf = state.scale_factor
            frozen_in = {"first_stage": frozen["first_stage"],
                         "cond_batch_stats": state.batch_stats}
            grad_fn = jax.value_and_grad(
                lambda p, b=batch, r=srng, s=sf: model.loss_fn(
                    p, frozen_in, b, r, s, train=True), has_aux=True)
            (loss, (loss_dict, new_stats)), grads = grad_fn(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            ema = state.ema
            if ema is not None:
                ema = ema_lib.update(ema, params["unet"], decay=ema_decay)
            state = TrainState(
                step=state.step + 1, params=params, batch_stats=new_stats,
                opt_state=opt_state, ema=ema, scale_factor=sf)
            metrics = loss_dict
        return state, metrics

    if mesh is None:
        return jax.jit(train_k_steps, donate_argnums=(0,) if donate else ())
    repl = replicated(mesh)
    bsh = NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data"))
    return jax.jit(train_k_steps,
                   in_shardings=(repl, repl, repl, bsh, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,) if donate else ())


def build_eval_step(model, mesh=None):
    """validation_step equivalent (``ddpm_enc.py:378-390``): returns the val
    loss dict plus the (B, latent_unit) raw scalars used by the
    disentanglement eval driver."""

    def eval_step(state: TrainState, frozen, batch):
        frozen_in = {"first_stage": frozen["first_stage"],
                     "cond_batch_stats": state.batch_stats}
        rng = jax.random.PRNGKey(0)  # val loss uses fixed noise stream
        _, (loss_dict, _) = model.loss_fn(
            state.params, frozen_in, batch, rng, state.scale_factor,
            train=False)
        cond_vars = {"params": state.params["cond"],
                     "batch_stats": state.batch_stats}
        u = model.cond_encoding(cond_vars, _as_images(batch))
        return loss_dict, u

    if mesh is None:
        return jax.jit(eval_step)
    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(eval_step, in_shardings=(repl, repl, bsh),
                   out_shardings=(repl, bsh))


def build_encode_step(model, mesh=None):
    """Batched representation extraction for the metric suite: images ->
    (B, latent_unit) scalars, on-device (SURVEY.md §3.2 TPU plan)."""

    def encode(state: TrainState, batch):
        cond_vars = {"params": state.params["cond"],
                     "batch_stats": state.batch_stats}
        return model.cond_encoding(cond_vars, _as_images(batch))

    if mesh is None:
        return jax.jit(encode)
    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(encode, in_shardings=(repl, bsh), out_shardings=bsh)


def build_encode_sweep(model, n_chunks: int, chunk: int, mesh=None):
    """Whole-dataset representation extraction in ONE dispatch.

    ``sweep(state, images, order)`` scans ``n_chunks`` encoder forwards over
    a device-resident uint8 image array, gathering ``chunk`` rows per
    iteration from ``order`` (a padded index vector of length
    ``n_chunks*chunk``) and returning the stacked (n_chunks*chunk, U)
    scalars on device. Replaces 1000s of per-batch host->device uploads in
    the validation sweep — on tunneled/remote TPUs each of those costs a
    full round-trip (BENCH_NOTES.md input-pipeline note)."""

    def sweep(state: TrainState, images, order):
        cond_vars = {"params": state.params["cond"],
                     "batch_stats": state.batch_stats}

        def body(_, idx):
            batch = gather_images(images, idx)
            return None, model.cond_encoding(cond_vars, _as_images(batch))

        _, us = jax.lax.scan(body, None, order.reshape(n_chunks, chunk))
        return us.reshape(n_chunks * chunk, -1)

    if mesh is None:
        return jax.jit(sweep)
    repl = replicated(mesh)
    return jax.jit(sweep, in_shardings=(repl, repl, repl),
                   out_shardings=repl)
