"""Host input pipeline: DataModuleFromConfig + double-buffered device prefetch.

Replaces the reference's Lightning DataModule + torch DataLoader workers
(``main_val.py:214-318``). The reference spends worker processes running
PIL/ToTensor per item; here datasets are contiguous host uint8 arrays
(``encdiff_tpu.data.datasets``), a batch is ONE vectorized numpy gather, the
uint8 batch is placed on device asynchronously (sharded over the mesh
``data`` axis), and the [-1,1] normalize runs on device inside the jitted
step. A one-deep prefetch queue overlaps the next gather+transfer with the
current step — the TPU equivalent of ``num_workers`` prefetching.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Iterator

import jax
import numpy as np

from encdiff_tpu.core.config import instantiate_from_config, to_plain


class WrappedDataset:
    """Dict-wrap an arbitrary object as a dataset (``main_val.py:214-224``)."""

    def __init__(self, dataset):
        self.data = dataset

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return self.data[idx]


class DataModuleFromConfig:
    """Constructor parity with ``main_val.py:243-318``; ``num_workers`` is
    accepted and ignored (no worker processes — vectorized host gathers)."""

    def __init__(self, batch_size, train=None, validation=None, test=None,
                 predict=None, wrap=False, num_workers=None,
                 shuffle_test_loader=False, use_worker_init_fn=False,
                 shuffle_val_dataloader=False, **kwargs):
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.wrap = wrap
        self.dataset_configs = {}
        for name, cfg in (("train", train), ("validation", validation),
                          ("test", test), ("predict", predict)):
            if cfg is not None:
                self.dataset_configs[name] = to_plain(cfg)
        self.datasets: dict[str, Any] = {}
        del shuffle_test_loader, use_worker_init_fn, shuffle_val_dataloader
        del kwargs

    def setup(self, stage=None):
        del stage
        for name, cfg in self.dataset_configs.items():
            ds = instantiate_from_config(cfg)
            if self.wrap:
                ds = WrappedDataset(ds)
            self.datasets[name] = ds
        return self

    def _raw(self, name):
        if name not in self.datasets:
            self.setup()
        ds = self.datasets[name]
        return ds.data if isinstance(ds, WrappedDataset) else ds

    def train_loader(self, rng_seed=0, sharding=None, drop_last=True):
        return epoch_loader(self._raw("train"), self.batch_size,
                            shuffle=True, seed=rng_seed, sharding=sharding,
                            drop_last=drop_last)

    def val_loader(self, sharding=None):
        return epoch_loader(self._raw("validation"), self.batch_size,
                            shuffle=False, sharding=sharding, drop_last=True)


def epoch_loader(dataset, batch_size: int, shuffle: bool = True, seed: int = 0,
                 sharding=None, drop_last: bool = True,
                 epoch: int = 0) -> Iterator[Any]:
    """One epoch of uint8 device batches with one-step prefetch.

    ``dataset`` must expose ``batch_uint8(indices)`` (ArrayDataset protocol);
    falls back to stacking ``__getitem__`` images for foreign datasets.
    """
    n = len(dataset)
    if shuffle:
        order = np.random.RandomState(seed + epoch).permutation(n)
    else:
        order = np.arange(n)
    steps = n // batch_size if drop_last else -(-n // batch_size)

    gather = getattr(dataset, "batch_uint8", None)

    def host_batch(i):
        idx = order[i * batch_size:(i + 1) * batch_size]
        if gather is not None:
            return gather(idx)
        ims = np.stack([np.asarray(dataset[int(j)]["image"]) for j in idx])
        return ims

    put = (partial(jax.device_put, device=sharding) if sharding is not None
           else jax.device_put)

    pending = put(host_batch(0)) if steps > 0 else None
    for i in range(steps):
        nxt = put(host_batch(i + 1)) if i + 1 < steps else None
        yield pending
        pending = nxt


def infinite_loader(dataset, batch_size: int, seed: int = 0, sharding=None):
    """Endless stream over reshuffled epochs (the training input)."""
    epoch = 0
    while True:
        yield from epoch_loader(dataset, batch_size, shuffle=True, seed=seed,
                                sharding=sharding, epoch=epoch)
        epoch += 1
