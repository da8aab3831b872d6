"""LFW attribute regression probe.

Rebuild of ``eval_lfw.py`` + ``lfw_src/`` (LFWAttribute dataset,
eval_regression): a linear head on the frozen concept-encoder output
regresses the 73 continuous LFW attributes; quality is per-attribute
Pearson r and MSE on the test split.

The probe train loop is one jitted optax step over on-device features
(encode once, probe many epochs — the reference re-encodes every epoch).
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


class LFWAttribute:
    """LFW funneled images + lfw_attributes.txt continuous attributes
    (lfw_src/lfw_attribute.py protocol: splits by people-file)."""

    def __init__(self, root: str, split: str = "train", image_size: int = 64):
        self.root = os.path.expanduser(root)
        self.image_size = image_size
        attr_path = os.path.join(self.root, "lfw_attributes.txt")
        if not os.path.exists(attr_path):
            raise FileNotFoundError(attr_path)
        names, values = self._parse_attributes(attr_path)
        # deterministic split: hash person name parity like the reference's
        # people-file train/test partition (10-fold -> 90/10). md5, not
        # builtin hash(): the latter is salted per-process (PYTHONHASHSEED)
        # and would silently reshuffle the split between runs.
        import hashlib

        keep = []
        for i, (person, _num) in enumerate(names):
            digest = hashlib.md5(person.encode()).digest()
            is_test = (digest[0] % 10) == 0
            if (split == "test") == is_test:
                keep.append(i)
        self.names = [names[i] for i in keep]
        self.attributes = values[keep]
        self.num_attributes = values.shape[1]
        self._images: np.ndarray | None = None

    @staticmethod
    def _parse_attributes(path):
        names, rows = [], []
        with open(path) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                parts = line.rstrip("\n").split("\t")
                if len(parts) < 3:
                    continue
                try:
                    num = int(parts[1])
                except ValueError:
                    continue  # header line
                names.append((parts[0], num))
                rows.append(np.array([float(x) for x in parts[2:]],
                                     np.float32))
        return names, np.stack(rows)

    def load_images(self) -> np.ndarray:
        if self._images is not None:
            return self._images
        from PIL import Image

        size = self.image_size
        out = np.zeros((len(self.names), size, size, 3), np.uint8)
        for i, (person, num) in enumerate(self.names):
            p = person.replace(" ", "_")
            path = os.path.join(self.root, "lfw-deepfunneled", p,
                                f"{p}_{num:04d}.jpg")
            if not os.path.exists(path):
                path = os.path.join(self.root, "lfw", p, f"{p}_{num:04d}.jpg")
            img = Image.open(path).convert("RGB")
            # Resize(1.1x) + CenterCrop (eval_lfw.py:22-26)
            big = int(size * 1.1)
            img = img.resize((big, big), Image.BILINEAR)
            off = (big - size) // 2
            img = img.crop((off, off, off + size, off + size))
            out[i] = np.array(img)
        self._images = out
        return out


def pearson_r(preds: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Per-attribute Pearson correlation (lfw_src/eval_utils.py)."""
    p = preds - preds.mean(axis=0)
    l = labels - labels.mean(axis=0)
    num = (p * l).sum(axis=0)
    den = np.sqrt((p**2).sum(axis=0) * (l**2).sum(axis=0)) + 1e-12
    return num / den


def train_probe(train_feats, train_labels, test_feats, test_labels,
                epochs: int = 15, batch_size: int = 64, lr: float = 1e-3,
                seed: int = 0):
    """Linear probe: Adam + MSE (eval_lfw.py:64-115). Features pre-encoded.
    Returns (per-epoch pearson r lists, per-epoch mse arrays, best params)."""
    n, d = train_feats.shape
    a = train_labels.shape[1]
    rng = jax.random.PRNGKey(seed)
    params = {"w": jax.random.normal(rng, (d, a)) * (1.0 / np.sqrt(d)),
              "b": jnp.zeros((a,))}
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            pred = x @ p["w"] + p["b"]
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, x):
        return x @ params["w"] + params["b"]

    train_feats = jnp.asarray(train_feats)
    train_labels = jnp.asarray(train_labels)
    rs = np.random.RandomState(seed)
    rs_hist, mse_hist = [], []
    best_r, best_params = -1.0, params
    for epoch in range(epochs):
        order = rs.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            params, opt_state, _ = step(params, opt_state,
                                        train_feats[idx], train_labels[idx])
        preds = np.asarray(predict(params, jnp.asarray(test_feats)))
        r = pearson_r(preds, test_labels)
        mse = ((preds - test_labels) ** 2).mean(axis=0)
        rs_hist.append(r)
        mse_hist.append(mse)
        if r.mean() > best_r:
            best_r, best_params = float(r.mean()), jax.device_get(params)
    return rs_hist, mse_hist, best_params


def eval_lfw(encode_fn: Callable, dataset_root: str, image_size: int = 64,
             epochs: int = 15, batch_size: int = 256,
             probe_lr: float = 1e-3, probe_batch_size: int = 64) -> dict:
    """Full protocol: encode both splits, train probe, report curves."""
    train_set = LFWAttribute(dataset_root, "train", image_size)
    test_set = LFWAttribute(dataset_root, "test", image_size)

    def feats(ds):
        imgs = ds.load_images()
        out = []
        for i in range(0, len(imgs), batch_size):
            x = imgs[i:i + batch_size].astype(np.float32) / 127.5 - 1.0
            out.append(np.asarray(encode_fn(x)))
        return np.concatenate(out, axis=0)

    tr_f, te_f = feats(train_set), feats(test_set)
    rs_hist, mse_hist, _ = train_probe(
        tr_f, train_set.attributes, te_f, test_set.attributes, epochs=epochs,
        batch_size=probe_batch_size, lr=probe_lr)
    best_epoch = int(np.argmax([r.mean() for r in rs_hist]))
    return {
        "best_epoch": best_epoch,
        "best_avg_pearson_r": float(rs_hist[best_epoch].mean()),
        "best_avg_mse": float(mse_hist[best_epoch].mean()),
        "per_attribute_r": rs_hist[best_epoch].tolist(),
        "per_epoch_avg_r": [float(r.mean()) for r in rs_hist],
    }
