"""Regenerate the config suite under configs/.

Hyperparameters mirror the reference EncDiff configs (SURVEY.md §6) but
target names point at the TPU-native rebuild. Run: python tools/gen_configs.py
"""
import os
import yaml


def ldm_config(dataset, eval_name, max_epochs=10, ae_ckpt=None,
               use_mcl=False, lam=None, mcl_type="infonce_mechgrad",
               base_lr=2.0e-6, warmup=10000, resolution=64,
               image_size=16, latent_unit=20):
    params = {
        "linear_start": 0.0015,
        "linear_end": 0.0155,
        "num_timesteps_cond": 1,
        "log_every_t": 200,
        "timesteps": 1000,
        "loss_type": "l1",
        "first_stage_key": "image",
        "cond_stage_key": "image",
        "image_size": image_size,
        "channels": 3,
        "cond_stage_trainable": True,
        "concat_mode": False,
        "scale_by_std": True,
        "monitor": "train/loss_simple",
        "conditioning_key": "crossattn",
        "eval_name": eval_name,
        "scheduler_config": {
            "target": "encdiff_tpu.core.lr_scheduler.LambdaLinearScheduler",
            "params": {"warm_up_steps": [warmup],
                       "cycle_lengths": [10000000000000],
                       "f_start": [1.0e-6], "f_max": [1.0], "f_min": [1.0]},
        },
        "unet_config": {
            "target": "encdiff_tpu.nn.unet.UNetModel",
            "params": {"image_size": image_size, "in_channels": 3,
                       "out_channels": 3, "model_channels": 64,
                       "attention_resolutions": [1, 2, 4],
                       "num_res_blocks": 2, "channel_mult": [1, 2, 4, 4],
                       "num_heads": 8, "use_scale_shift_norm": True,
                       "resblock_updown": True,
                       "use_spatial_transformer": True,
                       "context_dim": 16, "latent_unit": latent_unit},
        },
        "first_stage_config": {
            "target": "encdiff_tpu.models.autoencoder.VQModelInterface",
            "params": {"embed_dim": 3, "n_embed": 2048,
                       "use_disentangled_concat": True,
                       "disentangled_dim": latent_unit,
                       "monitor": "val/rec_loss",
                       **({"ckpt_path": ae_ckpt} if ae_ckpt else {}),
                       "ddconfig": {"double_z": False, "z_channels": 3,
                                    "resolution": resolution,
                                    "in_channels": 3, "out_ch": 3, "ch": 32,
                                    "ch_mult": [1, 2, 4],
                                    "num_res_blocks": 2,
                                    "attn_resolutions": [], "dropout": 0.0},
                       "lossconfig": {"target": "torch.nn.Identity"}},
        },
        "cond_stage_config": {
            "target": "encdiff_tpu.nn.encoder4.Encoder4",
            "params": {"d": 128, "context_dim": 16,
                       "latent_unit": latent_unit},
        },
    }
    if use_mcl:
        params.update({"use_mcl": True, "lambda_mcl": lam,
                       "mcl_tau": 0.1, "mcl_proj_dim": 128,
                       "mcl_sigma": 0.1, "mcl_neg_mode": "shuffle_u",
                       "mcl_type": mcl_type})
    cfg = {
        "model": {"base_learning_rate": base_lr,
                  "target": "encdiff_tpu.models.latent_diffusion.LatentDiffusion",
                  "params": params},
        "data": {"target": "encdiff_tpu.train.data.DataModuleFromConfig",
                 "params": {"batch_size": 128, "num_workers": 8, "wrap": True,
                            "train": {"target": f"encdiff_tpu.data.datasets.{dataset}"},
                            "validation": {"target": f"encdiff_tpu.data.datasets.{dataset}"}}},
        "lightning": {
            "callbacks": {
                "image_logger": {
                    "target": "encdiff_tpu.train.callbacks.ImageLogger",
                    "params": {"log_config": {
                                   "target": "encdiff_tpu.train.callbacks.Record",
                                   "params": {"plot_image": True}},
                               "batch_frequency": 10000, "max_images": 8,
                               "increase_log_steps": False,
                               "log_images_kwargs": {"inpaint": False,
                                                     "sample_swap": True,
                                                     "plot_progressive_rows": False}}},
                "best_vae_checkpoint": {
                    "target": "encdiff_tpu.train.callbacks.ModelCheckpoint",
                    "params": {"monitor": "val/factor_vae_score", "mode": "max",
                               "filename": "best_vae_{epoch:03d}_{val/factor_vae_score:.4f}",
                               "save_top_k": 1}},
                "best_dci_checkpoint": {
                    "target": "encdiff_tpu.train.callbacks.ModelCheckpoint",
                    "params": {"monitor": "val/dci_disentanglement", "mode": "max",
                               "filename": "best_dci_{epoch:03d}_{val/dci_disentanglement:.4f}",
                               "save_top_k": 1}},
            },
            "trainer": {"benchmark": True, "max_epochs": max_epochs,
                        "check_val_every_n_epoch": 1},
        },
    }
    if use_mcl:
        cfg["lightning"]["callbacks"]["swap_visualization"] = {
            "target": "encdiff_tpu.train.callbacks.SwapVisualizationCallback",
            "params": {"num_samples": 8, "ddim_steps": 200}}
    return cfg


def ae_config(dataset, accumulate=2):
    return {
        "model": {"base_learning_rate": 4.5e-6,
                  "target": "encdiff_tpu.models.autoencoder.VQModel",
                  "params": {"embed_dim": 3, "n_embed": 2048,
                             "monitor": "val/rec_loss",
                             "ddconfig": {"double_z": False, "z_channels": 3,
                                          "resolution": 64, "in_channels": 3,
                                          "out_ch": 3, "ch": 32,
                                          "ch_mult": [1, 2, 4],
                                          "num_res_blocks": 2,
                                          "attn_resolutions": [],
                                          "dropout": 0.0},
                             "lossconfig": {
                                 "target": "encdiff_tpu.losses.gan.VQLPIPSWithDiscriminator",
                                 "params": {"disc_conditional": False,
                                            "disc_in_channels": 3,
                                            "disc_start": 0,
                                            "disc_weight": 0.75,
                                            "codebook_weight": 1.0}}}},
        "data": {"target": "encdiff_tpu.train.data.DataModuleFromConfig",
                 "params": {"batch_size": 128, "num_workers": 8, "wrap": True,
                            "train": {"target": f"encdiff_tpu.data.datasets.{dataset}"},
                            "validation": {"target": f"encdiff_tpu.data.datasets.{dataset}"}}},
        "lightning": {"callbacks": {"image_logger": {
                          "target": "encdiff_tpu.train.callbacks.ImageLogger",
                          "params": {"batch_frequency": 1000, "max_images": 8,
                                     "increase_log_steps": True}}},
                      "trainer": {"benchmark": True,
                                  "accumulate_grad_batches": accumulate}},
    }


HEADER = """# encdiff_tpu config — regenerated by tools/gen_configs.py
# Hyperparameter parity with the reference EncDiff configs (SURVEY.md section 6);
# target names point at the TPU-native rebuild (reference ldm.* names are
# also accepted via the registry aliases in encdiff_tpu/core/config.py).
"""


def dump(path, cfg):
    with open(path, "w") as f:
        f.write(HEADER)
        yaml.safe_dump(cfg, f, sort_keys=False)


def main(root="configs"):
    for sub in ("latent-diffusion", "autoencoder", "mcl"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for ds, name, eval_name, epochs in [
            ("Shapes3DTrain", "shapes3d", "shapes3d", 10),
            ("MPI3DTrain", "mpi3d", "mpi3d", 10),
            ("Cars3DTrain", "cars3d", "cars3d", 15)]:
        dump(f"{root}/latent-diffusion/{name}-vq-4-16-encdiff.yaml",
             ldm_config(ds, eval_name, max_epochs=epochs,
                        ae_ckpt=f"pretrained_models/{name}_autoencoder.ckpt"))
        dump(f"{root}/autoencoder/{name.replace('-', '_')}_vq_4_16.yaml",
             ae_config(ds))
        for lam, tag in [(0.01, "lambda001"), (0.05, "lambda005"),
                         (0.1, "lambda010"), (0.5, "lambda050")]:
            cfg = ldm_config(ds, eval_name, max_epochs=3,
                             ae_ckpt=f"pretrained_models/{name}_autoencoder.ckpt",
                             use_mcl=True, lam=lam, base_lr=2.0e-7,
                             warmup=1000)
            dump(f"{root}/mcl/{name}-vq-4-16-encdiff-mcl-{tag}.yaml", cfg)
        if name == "mpi3d":
            for mt, short in [("nce_logistic", "nce"), ("fisher_sm", "fisher"),
                              ("denoise_sm", "denoise"),
                              ("jacobian_vjp_infonce", "jacobian"),
                              ("infonce_mechgrad", "infonce")]:
                for lam, tag in [(0.01, "lambda001"), (0.05, "lambda005")]:
                    cfg = ldm_config(
                        ds, eval_name, max_epochs=3,
                        ae_ckpt=f"pretrained_models/{name}_autoencoder.ckpt",
                        use_mcl=True, lam=lam, mcl_type=mt,
                        base_lr=2.0e-7, warmup=1000)
                    dump(f"{root}/mcl/{name}-mcl-{short}-{tag}.yaml", cfg)

    celeba = ldm_config("CelebaTrain", "celeba", max_epochs=10,
                        ae_ckpt="pretrained_models/celeba_autoencoder.ckpt",
                        resolution=256, image_size=64)
    celeba["model"]["params"]["eval_name"] = None
    celeba["data"]["params"]["train"]["params"] = {"image_size": 256}
    celeba["data"]["params"]["validation"]["params"] = {"image_size": 256}
    celeba["data"]["params"]["batch_size"] = 32
    dump(f"{root}/latent-diffusion/celeba-vq-4-64-encdiff.yaml", celeba)


if __name__ == "__main__":
    main()
