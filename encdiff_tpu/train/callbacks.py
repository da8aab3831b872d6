"""Host-side training callbacks.

Rebuilds of the reference harness callbacks (``main_val.py:321-520``,
``ldm/tools.py:4-27``, ``swap_training_end.py:10-252``) without Lightning:
each callback is a plain object with ``on_train_batch_end`` /
``on_validation_epoch_end`` hooks the harness invokes; device arrays arrive
as host numpy. The Wandb dependency of the reference swap callback (used
without being imported — SURVEY.md §2.5 wart) is dropped; everything writes
to the logdir.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Any

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1,1] float -> uint8, clamped (main_val.py:427-437 semantics)."""
    img = np.clip((np.asarray(img, np.float32) + 1.0) / 2.0, 0.0, 1.0)
    return (img * 255).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 4, pad: int = 2) -> np.ndarray:
    """(N,H,W,C) -> one (gh*H, gw*W, C) grid (torchvision.make_grid stand-in)."""
    n, h, w, c = images.shape
    ncol = nrow
    nrows = -(-n // ncol)
    grid = np.zeros((nrows * (h + pad) + pad, ncol * (w + pad) + pad, c),
                    images.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[pad + r * (h + pad):pad + r * (h + pad) + h,
             pad + col * (w + pad):pad + col * (w + pad) + w] = images[i]
    return grid


def save_image_grid(images: np.ndarray, path: str, nrow: int = 4) -> None:
    from PIL import Image

    grid = make_grid(to_uint8(images), nrow=nrow)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(grid).save(path)


class Record:
    """CSV loss logger, one row per ``interval`` steps (ldm/tools.py:4-27)."""

    def __init__(self, path: str | None = None, interval: int = 200,
                 plot_image: bool = False, **kwargs):
        del kwargs
        self.path = path
        self.interval = interval
        self.plot_image = plot_image
        self._keys: list[str] | None = None

    def bind(self, logdir: str):
        if self.path is None:
            self.path = os.path.join(logdir, "record.csv")
        return self

    def log(self, step: int, metrics: dict[str, Any]):
        if step % self.interval != 0 or self.path is None:
            return
        row = {"step": step,
               **{k: float(v) for k, v in metrics.items()
                  if np.ndim(v) == 0}}
        write_header = not os.path.exists(self.path)
        if self._keys is None:
            self._keys = list(row.keys())
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._keys, extrasaction="ignore")
            if write_header:
                w.writeheader()
            w.writerow(row)


class ImageLogger:
    """Periodic ``log_images`` PNG dumps (main_val.py:370-495).

    ``increase_log_steps`` adds power-of-2 warmup steps exactly like the
    reference (`:381`).
    """

    def __init__(self, batch_frequency=2000, max_images=8, clamp=True,
                 increase_log_steps=True, rescale=True,
                 disabled=False, log_on_batch_idx=False, log_first_step=False,
                 log_images_kwargs=None, log_config=None, **kwargs):
        del kwargs
        self.batch_freq = batch_frequency
        self.max_images = max_images
        self.clamp = clamp
        self.rescale = rescale
        self.disabled = disabled
        self.log_on_batch_idx = log_on_batch_idx
        self.log_first_step = log_first_step
        self.log_images_kwargs = dict(log_images_kwargs or {})
        self.log_steps = ([2 ** n for n in range(int(np.log2(self.batch_freq)) + 1)]
                          if increase_log_steps else [self.batch_freq])
        self.record = None
        if log_config is not None:
            from encdiff_tpu.core.config import instantiate_from_config
            self.record = instantiate_from_config(log_config)
        self.logdir = None

    def bind(self, logdir: str):
        self.logdir = logdir
        if self.record is not None:
            self.record.bind(logdir)
        return self

    def due(self, step: int) -> bool:
        """Side-effect-free peek at check_frequency."""
        return step % self.batch_freq == 0 or step in self.log_steps

    def check_frequency(self, step: int) -> bool:
        if step % self.batch_freq == 0 or step in self.log_steps:
            try:
                self.log_steps.pop(0)
            except IndexError:
                pass
            return True
        return False

    def wants_metrics(self, step: int) -> bool:
        """True when this step's metrics will actually be consumed — lets
        the train loop skip the device->host metric sync on other steps
        (a per-step blocking fetch serializes dispatch on remote TPUs)."""
        return self.record is not None and step % self.record.interval == 0

    def maybe_log(self, step: int, split: str, log_images_fn, batch,
                  metrics=None):
        if self.record is not None and metrics is not None and callable(metrics):
            if self.wants_metrics(step):
                self.record.log(step, metrics())
        elif self.record is not None and metrics is not None:
            self.record.log(step, metrics)
        if self.disabled or not self.check_frequency(step):
            return
        images = log_images_fn(batch, N=self.max_images,
                               **self.log_images_kwargs)
        root = os.path.join(self.logdir or ".", "images", split)
        for k, v in images.items():
            v = np.asarray(v)
            if v.ndim == 5:  # row-strips (b, t, h, w, c) -> flatten rows
                v = v.reshape(-1, *v.shape[2:])
            if v.ndim != 4 or v.shape[0] == 0:
                continue
            nrow = (self.max_images
                    if k == "samples_swapping" else min(4, v.shape[0]))
            save_image_grid(
                v, os.path.join(root, f"{k}_gs-{step:06}.png"), nrow=nrow)


class ModelCheckpoint:
    """Top-k checkpointing on a monitored metric (Lightning ModelCheckpoint
    surface used by the configs: monitor/mode/save_top_k/filename/save_last)."""

    def __init__(self, dirpath=None, filename="{step}", monitor=None,
                 mode="min", save_top_k=1, save_last=False, verbose=False,
                 every_n_train_steps=None, save_weights_only=False, **kwargs):
        del kwargs
        self.dirpath = dirpath
        self.filename = filename
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.save_last = save_last
        self.verbose = verbose
        self.every_n_train_steps = every_n_train_steps
        self.save_weights_only = save_weights_only
        self.best: list[tuple[float, str]] = []  # (score, path)

    def bind(self, ckptdir: str):
        if self.dirpath is None:
            self.dirpath = ckptdir
        return self

    def _fname(self, step: int, epoch: int, score: float | None) -> str:
        name = (self.filename
                .replace("{step}", f"{step:09}")
                .replace("{epoch:03d}", f"{epoch:03d}")
                .replace("{epoch}", f"{epoch}"))
        if score is not None and "{" in name:
            import re
            name = re.sub(r"\{[^}]*:\.4f\}", f"{score:.4f}", name)
        return name

    def maybe_save(self, save_fn, step: int, epoch: int,
                   metrics: dict[str, Any] | None = None):
        """save_fn(path) persists the state. Called on val-epoch-end (monitored)
        or per-step (every_n_train_steps)."""
        if self.every_n_train_steps:
            if step % self.every_n_train_steps == 0 and step > 0:
                path = os.path.join(self.dirpath,
                                    self._fname(step, epoch, None))
                save_fn(path)
            return
        if self.monitor is None or metrics is None:
            path = os.path.join(self.dirpath, self._fname(step, epoch, None))
            save_fn(path)
            return
        if self.monitor not in metrics:
            # Still honor save_last: runs whose monitor never shows up in
            # val metrics (e.g. a train-loss monitor with eval_name null,
            # the 256px faces config) must checkpoint for resume-on-retry.
            if self.save_last:
                save_fn(os.path.join(self.dirpath, "last"))
            return
        score = float(metrics[self.monitor])
        sign = 1.0 if self.mode == "max" else -1.0
        # self.best is kept sorted best-first by signed score
        if len(self.best) < self.save_top_k or \
                sign * score > sign * self.best[-1][0]:
            path = os.path.join(self.dirpath,
                                self._fname(step, epoch, score))
            save_fn(path)
            self.best.append((score, path))
            self.best.sort(key=lambda t: -sign * t[0])
            while len(self.best) > self.save_top_k:
                _, stale = self.best.pop()
                import shutil
                shutil.rmtree(stale, ignore_errors=True)
        if self.save_last:
            save_fn(os.path.join(self.dirpath, "last"))


class LearningRateMonitor:
    """Records the scheduled LR each logging step (Lightning parity)."""

    def __init__(self, logging_interval="step", **kwargs):
        del kwargs
        self.logging_interval = logging_interval
        self.history: list[tuple[int, float]] = []

    def log(self, step: int, lr: float):
        self.history.append((step, float(lr)))


class SetupCallback:
    """Creates logdir/ckptdir/cfgdir + dumps merged configs
    (main_val.py:321-367)."""

    def __init__(self, logdir, ckptdir, cfgdir, config=None,
                 lightning_config=None, now=""):
        self.logdir, self.ckptdir, self.cfgdir = logdir, ckptdir, cfgdir
        self.config = config
        self.lightning_config = lightning_config
        self.now = now

    def setup(self):
        for d in (self.logdir, self.ckptdir, self.cfgdir):
            os.makedirs(d, exist_ok=True)
        from encdiff_tpu.core.yamlcfg import OmegaConf

        if self.config is not None:
            OmegaConf.save(self.config, os.path.join(
                self.cfgdir, f"{self.now}-project.yaml"))
        if self.lightning_config is not None:
            OmegaConf.save(self.lightning_config, os.path.join(
                self.cfgdir, f"{self.now}-lightning.yaml"))


class DeviceStatsCallback:
    """Per-epoch wall time + device memory (the CUDACallback,
    main_val.py:498-520, on TPU memory_stats)."""

    def __init__(self):
        self.epoch_start = None

    def on_epoch_start(self):
        self.epoch_start = time.time()

    def on_epoch_end(self, epoch: int) -> dict:
        import jax

        dt = time.time() - (self.epoch_start or time.time())
        stats = {}
        try:
            ms = jax.local_devices()[0].memory_stats() or {}
            stats["peak_bytes_in_use"] = ms.get("peak_bytes_in_use", 0)
        except Exception:
            pass
        out = {"epoch": epoch, "epoch_time_s": dt, **stats}
        print(f"[epoch {epoch}] time {dt:.1f}s "
              + (f"peak_mem {stats.get('peak_bytes_in_use', 0)/2**20:.0f}MiB"
                 if stats else ""))
        return out


class SwapVisualizationCallback:
    """Fixed-seed swap grids at val-epoch-end (swap_training_end.py:10-252):
    8 fixed samples (seed 42), DDIM 200, full grid + per-factor labeled
    pages."""

    def __init__(self, num_samples=8, ddim_steps=200, eta=1.0, seed=42,
                 every_n_epochs=1, **kwargs):
        del kwargs
        self.num_samples = num_samples
        self.ddim_steps = ddim_steps
        self.eta = eta
        self.seed = seed
        self.every_n_epochs = every_n_epochs
        self.logdir = None

    def bind(self, logdir: str):
        self.logdir = logdir
        return self

    def on_validation_epoch_end(self, model, variables, dataset, epoch: int,
                                step: int):
        if epoch % self.every_n_epochs:
            return
        import jax

        from encdiff_tpu.evalx import swap as swap_lib

        rs = np.random.RandomState(self.seed)
        idx = rs.choice(len(dataset), size=self.num_samples, replace=False)
        if hasattr(dataset, "batch_uint8"):
            batch = dataset.batch_uint8(idx).astype(np.float32) / 127.5 - 1.0
        else:
            batch = np.stack([np.asarray(dataset[int(i)]["image"])
                              for i in idx])
        x = swap_lib.swap_sample(
            model, variables, batch, jax.random.PRNGKey(self.seed),
            ddim_steps=self.ddim_steps, eta=self.eta)
        x = np.asarray(x)
        root = os.path.join(self.logdir or ".", "swap_visualization")
        save_image_grid(
            np.concatenate([batch, x], axis=0),
            os.path.join(root, f"swap_grid_e{epoch:03}_s{step:07}.png"),
            nrow=self.num_samples)
        # per-factor pages
        n_units = x.shape[0] // self.num_samples
        for cdx in range(n_units):
            blk = x[cdx * self.num_samples:(cdx + 1) * self.num_samples]
            save_image_grid(
                np.concatenate([batch, blk], axis=0),
                os.path.join(root, f"factor_{cdx:02}_e{epoch:03}.png"),
                nrow=self.num_samples)
