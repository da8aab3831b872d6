"""VQ-VAE (first stage) GAN training: explicit two-optimizer step under jit.

Rebuild of ``ldm/models/autoencoder.py:189-272`` (VQModel.training_step +
configure_optimizers) without Lightning's optimizer_idx alternation: ONE
jitted function runs the generator update (rec + LPIPS + adaptive-weight GAN
+ codebook loss) and the discriminator update (hinge loss on the same batch,
reconstructions stop-gradiented) back to back, exactly the per-batch
schedule Lightning produces with two optimizers. Grad routing that torch
does with ``.detach()``/optimizer-param-group bookkeeping is explicit
``stop_gradient`` + separate param subtrees here.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from encdiff_tpu.nn.layers import TorchConv
from encdiff_tpu.parallel.mesh import batch_sharding, replicated


def _as_images(batch):
    if jnp.issubdtype(batch.dtype, jnp.integer):
        return batch.astype(jnp.float32) / 127.5 - 1.0
    return batch.astype(jnp.float32)


class VQTrainState(NamedTuple):
    step: jnp.ndarray
    gen_params: Any              # VQVAE module params (enc/dec/codebook/convs)
    disc_params: Any
    disc_batch_stats: Any
    loss_vars: Any               # frozen LPIPS variables
    gen_opt: Any
    disc_opt: Any


def make_optimizers(learning_rate: float, lr_g_factor: float = 1.0,
                    accumulate: int = 1):
    """Two Adam(0.5, 0.9) optimizers (autoencoder.py:241-272)."""
    gen_tx = optax.adam(learning_rate * lr_g_factor, b1=0.5, b2=0.9)
    disc_tx = optax.adam(learning_rate, b1=0.5, b2=0.9)
    if accumulate > 1:
        gen_tx = optax.MultiSteps(gen_tx, every_k_schedule=accumulate)
        disc_tx = optax.MultiSteps(disc_tx, every_k_schedule=accumulate)
    return gen_tx, disc_tx


def create_vq_train_state(vqmodel, loss_obj, rng, gen_tx, disc_tx,
                          image_resolution: int | None = None) -> VQTrainState:
    res = image_resolution or vqmodel.ddconfig["resolution"]
    r1, r2 = jax.random.split(rng)
    variables = vqmodel.init_variables(r1)
    loss_variables = loss_obj.init_variables(r2, image_size=res)
    gen_params = variables["params"]
    disc_vars = loss_variables["disc"]
    return VQTrainState(
        step=jnp.asarray(0, jnp.int32),
        gen_params=gen_params,
        disc_params=disc_vars["params"],
        disc_batch_stats=disc_vars.get("batch_stats", {}),
        loss_vars={"lpips": loss_variables.get("lpips")}
        if "lpips" in loss_variables else {},
        gen_opt=gen_tx.init(gen_params),
        disc_opt=disc_tx.init(disc_vars["params"]),
    )


def _make_vq_step_body(vqmodel, loss_obj, gen_tx, disc_tx):
    """The un-jitted two-optimizer step body shared by the streaming and
    device-resident step builders."""
    module = vqmodel.module
    out_ch = vqmodel.ddconfig["out_ch"]
    conv_out = TorchConv(out_ch, 3, padding=1, dtype=module.dtype)

    def conv_out_apply(w, h):
        return conv_out.apply({"params": w}, h)

    def step_fn(state: VQTrainState, batch):
        x = _as_images(batch)

        # ---- generator pass (optimizer_idx 0) ------------------------------
        def gen_loss_fn(params):
            (dec, qloss, ind), mut = module.apply(
                {"params": params}, x, None, True,
                mutable=["intermediates"])
            pre = mut["intermediates"]["decoder"]["pre_conv_out"][0]
            loss, log = loss_obj.generator_loss(
                state.loss_vars, state.disc_params, qloss, x, dec,
                state.step,
                conv_out_params=params["decoder"]["conv_out"],
                pre_conv_out=jax.lax.stop_gradient(pre),
                conv_out_apply=conv_out_apply,
                predicted_indices=ind,
                disc_batch_stats=state.disc_batch_stats,
                split="train")
            return loss, (log, dec)

        (g_total, (g_log, xrec)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params)
        g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt,
                                           state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        # ---- discriminator pass (optimizer_idx 1, same batch) --------------
        def disc_loss_fn(dparams):
            d_loss, d_log, new_stats = loss_obj.discriminator_loss(
                dparams, x, xrec, state.step,
                disc_batch_stats=state.disc_batch_stats, train=True,
                split="train")
            return d_loss, (d_log, new_stats)

        (d_total, (d_log, disc_stats)), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_params)
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt,
                                             state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        metrics = {**g_log, **d_log}
        new_state = VQTrainState(
            step=state.step + 1, gen_params=gen_params,
            disc_params=disc_params, disc_batch_stats=disc_stats,
            loss_vars=state.loss_vars, gen_opt=gen_opt, disc_opt=disc_opt)
        return new_state, metrics

    return step_fn


def build_vq_train_step(vqmodel, loss_obj, gen_tx, disc_tx, mesh=None,
                        donate: bool = True):
    """Returns ``step(state, batch) -> (state, metrics)``."""
    step_fn = _make_vq_step_body(vqmodel, loss_obj, gen_tx, disc_tx)
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(repl, bsh),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,) if donate else ())


def build_epoch_vq_train_step(vqmodel, loss_obj, gen_tx, disc_tx,
                              steps_per_epoch: int, mesh=None,
                              donate: bool = True):
    """Device-resident variant: ``step(state, images, perm)`` slices its
    batch indices from the on-device epoch permutation at
    ``state.step % steps_per_epoch`` — ONE dispatch per step, no per-batch
    host->device upload (same pattern as loop.build_epoch_train_step)."""
    inner = _make_vq_step_body(vqmodel, loss_obj, gen_tx, disc_tx)

    def step_fn(state: VQTrainState, images, perm):
        i = (state.step % steps_per_epoch).astype(jnp.int32)
        b = perm.shape[0] // steps_per_epoch
        idx = jax.lax.dynamic_slice(perm, (i * b,), (b,))
        from encdiff_tpu.train.loop import gather_images
        return inner(state, gather_images(images, idx))

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    repl = replicated(mesh)
    return jax.jit(step_fn, in_shardings=(repl, repl, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,) if donate else ())


def build_vq_eval_step(vqmodel, loss_obj, mesh=None):
    """validation_step parity (autoencoder.py:210-239): rec metrics only."""
    module = vqmodel.module

    def eval_fn(state: VQTrainState, batch):
        x = _as_images(batch)
        dec, qloss, ind = module.apply({"params": state.gen_params}, x, None,
                                       True)
        _, log = loss_obj.generator_loss(
            state.loss_vars, state.disc_params, qloss, x, dec, state.step,
            predicted_indices=ind,
            disc_batch_stats=state.disc_batch_stats, split="val")
        d_loss, d_log, _ = loss_obj.discriminator_loss(
            state.disc_params, x, dec, state.step,
            disc_batch_stats=state.disc_batch_stats, train=False, split="val")
        return {**log, **d_log}

    if mesh is None:
        return jax.jit(eval_fn)
    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(eval_fn, in_shardings=(repl, bsh), out_shardings=repl)
