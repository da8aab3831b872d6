"""FID pipeline: flax InceptionV3 (FID variant) + Fréchet distance.

Rebuild of ``inception.py:18-342`` + ``celeba_fid.py:26-229``: the
pytorch-fid InceptionV3 (TF-compatible FID weights layout — InceptionA/C use
count_include_pad=False average pools, InceptionE_2 uses a max pool) up to
the 2048-d pool3 features, plus activation statistics and the Fréchet
distance (host scipy sqrtm, exactly like the reference).

Pretrained FID weights are not bundled (zero-egress image);
``load_torch_fid_inception`` ingests the standard ``pt_inception-2015-12-05``
state_dict when supplied. Without weights the pipeline is structurally
complete but scores are uncalibrated.

Input convention: NHWC float in [0,1]; ``normalize_input=True`` maps to
[-1,1] (inception.py:139-141); inputs are bilinearly resized to 299
(inception.py:133-137).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from encdiff_tpu.nn.layers import Dtype, TorchConv


class BasicConv2d(nn.Module):
    out_channels: int
    kernel_size: tuple[int, int] | int
    stride: int = 1
    padding: tuple[int, int] | int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks, ks)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        else:
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.out_channels, ks, strides=(self.stride, self.stride),
                    padding=pad, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        # torchvision BN eps=1e-3; inference mode with baked running stats
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=jnp.float32, param_dtype=jnp.float32,
                         name="bn")(x)
        return nn.relu(x)


def _avg_pool_3x3_nocountpad(x):
    """3x3 stride-1 avg pool, count_include_pad=False (the FID tweak)."""
    ones = jnp.ones_like(x[..., :1])
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), "SAME")
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), "SAME")
    return s / n


def _max_pool(x, ks=3, stride=2, padding="VALID"):
    return nn.max_pool(x, (ks, ks), strides=(stride, stride), padding=padding)


class FIDInceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, 1, name="branch1x1", dtype=self.dtype)(x)
        b5 = BasicConv2d(48, 1, name="branch5x5_1", dtype=self.dtype)(x)
        b5 = BasicConv2d(64, 5, padding=2, name="branch5x5_2",
                         dtype=self.dtype)(b5)
        b3 = BasicConv2d(64, 1, name="branch3x3dbl_1", dtype=self.dtype)(x)
        b3 = BasicConv2d(96, 3, padding=1, name="branch3x3dbl_2",
                         dtype=self.dtype)(b3)
        b3 = BasicConv2d(96, 3, padding=1, name="branch3x3dbl_3",
                         dtype=self.dtype)(b3)
        bp = _avg_pool_3x3_nocountpad(x)
        bp = BasicConv2d(self.pool_features, 1, name="branch_pool",
                         dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, 3, stride=2, name="branch3x3",
                         dtype=self.dtype)(x)
        bd = BasicConv2d(64, 1, name="branch3x3dbl_1", dtype=self.dtype)(x)
        bd = BasicConv2d(96, 3, padding=1, name="branch3x3dbl_2",
                         dtype=self.dtype)(bd)
        bd = BasicConv2d(96, 3, stride=2, name="branch3x3dbl_3",
                         dtype=self.dtype)(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class FIDInceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, 1, name="branch1x1", dtype=self.dtype)(x)
        b7 = BasicConv2d(c7, 1, name="branch7x7_1", dtype=self.dtype)(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2",
                         dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3",
                         dtype=self.dtype)(b7)
        bd = BasicConv2d(c7, 1, name="branch7x7dbl_1", dtype=self.dtype)(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2",
                         dtype=self.dtype)(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3",
                         dtype=self.dtype)(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4",
                         dtype=self.dtype)(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5",
                         dtype=self.dtype)(bd)
        bp = _avg_pool_3x3_nocountpad(x)
        bp = BasicConv2d(192, 1, name="branch_pool", dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, 1, name="branch3x3_1", dtype=self.dtype)(x)
        b3 = BasicConv2d(320, 3, stride=2, name="branch3x3_2",
                         dtype=self.dtype)(b3)
        b7 = BasicConv2d(192, 1, name="branch7x7x3_1", dtype=self.dtype)(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2",
                         dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3",
                         dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, 3, stride=2, name="branch7x7x3_4",
                         dtype=self.dtype)(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class FIDInceptionE(nn.Module):
    """use_max_pool selects the E_2 (final) variant (inception.py:312-342)."""

    use_max_pool: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, 1, name="branch1x1", dtype=self.dtype)(x)
        b3 = BasicConv2d(384, 1, name="branch3x3_1", dtype=self.dtype)(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a",
                          dtype=self.dtype)(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b",
                          dtype=self.dtype)(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, 1, name="branch3x3dbl_1", dtype=self.dtype)(x)
        bd = BasicConv2d(384, 3, padding=1, name="branch3x3dbl_2",
                         dtype=self.dtype)(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a",
                          dtype=self.dtype)(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b",
                          dtype=self.dtype)(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.use_max_pool:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        else:
            bp = _avg_pool_3x3_nocountpad(x)
        bp = BasicConv2d(192, 1, name="branch_pool", dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Pool3 (2048-d) feature extractor (inception.py:86-166 block layout)."""

    normalize_input: bool = True
    resize_input: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.resize_input and x.shape[1] != 299:
            x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[-1]),
                                 method="bilinear")
        if self.normalize_input:
            x = 2 * x - 1
        x = BasicConv2d(32, 3, stride=2, name="Conv2d_1a_3x3",
                        dtype=self.dtype)(x)
        x = BasicConv2d(32, 3, name="Conv2d_2a_3x3", dtype=self.dtype)(x)
        x = BasicConv2d(64, 3, padding=1, name="Conv2d_2b_3x3",
                        dtype=self.dtype)(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, 1, name="Conv2d_3b_1x1", dtype=self.dtype)(x)
        x = BasicConv2d(192, 3, name="Conv2d_4a_3x3", dtype=self.dtype)(x)
        x = _max_pool(x, 3, 2)
        x = FIDInceptionA(32, name="Mixed_5b", dtype=self.dtype)(x)
        x = FIDInceptionA(64, name="Mixed_5c", dtype=self.dtype)(x)
        x = FIDInceptionA(64, name="Mixed_5d", dtype=self.dtype)(x)
        x = InceptionB(name="Mixed_6a", dtype=self.dtype)(x)
        x = FIDInceptionC(128, name="Mixed_6b", dtype=self.dtype)(x)
        x = FIDInceptionC(160, name="Mixed_6c", dtype=self.dtype)(x)
        x = FIDInceptionC(160, name="Mixed_6d", dtype=self.dtype)(x)
        x = FIDInceptionC(192, name="Mixed_6e", dtype=self.dtype)(x)
        x = InceptionD(name="Mixed_7a", dtype=self.dtype)(x)
        x = FIDInceptionE(False, name="Mixed_7b", dtype=self.dtype)(x)
        x = FIDInceptionE(True, name="Mixed_7c", dtype=self.dtype)(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (B, 2048)


# --------------------------------------------------------------------------
# statistics + Fréchet distance (celeba_fid.py:26-229)
# --------------------------------------------------------------------------


def compute_activations(variables, images, batch_size: int = 64,
                        model=None) -> np.ndarray:
    """images: (N,H,W,3) in [0,1] (float) or uint8. Returns (N, D) feature
    activations — Inception pool3 (2048-d) by default, or any feature
    extractor passed as ``model`` (e.g. :class:`AttributeProbeCNN`)."""
    if model is None:
        model = InceptionV3FID()
    apply_fn = jax.jit(lambda v, x: model.apply(v, x))
    images = np.asarray(images)
    outs = []
    for i in range(0, len(images), batch_size):
        chunk = images[i:i + batch_size]
        if chunk.dtype == np.uint8:
            chunk = chunk.astype(np.float32) / 255.0
        outs.append(np.asarray(apply_fn(variables, jnp.asarray(chunk))))
    return np.concatenate(outs, axis=0)


def activation_statistics(acts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mu = np.mean(acts, axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians (celeba_fid.py parity: scipy
    sqrtm with eps-jitter retry)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError("Imaginary component in matrix sqrt")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def compute_fid(variables, images_a, images_b, batch_size: int = 64,
                model=None) -> float:
    mu1, s1 = activation_statistics(
        compute_activations(variables, images_a, batch_size, model=model))
    mu2, s2 = activation_statistics(
        compute_activations(variables, images_b, batch_size, model=model))
    return frechet_distance(mu1, s1, mu2, s2)


# --------------------------------------------------------------------------
# learned-feature fallback: attribute-supervised probe
# --------------------------------------------------------------------------


class AttributeProbeCNN(nn.Module):
    """Small conv net supervised on the dataset's binary attributes; its
    penultimate features define a *learned* Fréchet feature space when no
    pretrained Inception weights are available (zero-egress fallback for the
    ``celeba_fid.py:26-229`` protocol, which uses Inception pool3).

    Unlike the random-init Inception fallback, these features are trained to
    be discriminative for the dataset's semantic attributes, so the Fréchet
    distance in this space penalizes semantic (attribute-distribution)
    mismatch between real and generated sets. Scores are labeled
    ``mode="attribute_probe"`` — comparable across runs of the same probe,
    not against published Inception-FID numbers.
    """

    num_attrs: int = 18
    width: int = 64
    feat_dim: int = 256

    @nn.compact
    def __call__(self, x, return_logits: bool = False):
        # x: (B,H,W,3) in [0,1]; resize to 64x64 (attributes are global
        # appearance bits — low resolution suffices and keeps the probe
        # cheap at 256px inputs).
        if x.shape[1] != 64 or x.shape[2] != 64:
            x = jax.image.resize(x, (x.shape[0], 64, 64, x.shape[-1]),
                                 method="bilinear")
        x = 2.0 * x - 1.0
        for ch in (self.width, 2 * self.width, 4 * self.width,
                   4 * self.width):
            x = nn.Conv(ch, (3, 3), strides=(2, 2))(x)
            x = nn.GroupNorm(num_groups=8)(x)
            x = nn.silu(x)
        x = jnp.mean(x, axis=(1, 2))
        feats = nn.Dense(self.feat_dim, name="features")(x)
        if not return_logits:
            return feats  # FID feature space (pre-activation, like pool3)
        return nn.Dense(self.num_attrs, name="head")(nn.silu(feats))


def train_attribute_probe(images, attrs, *, steps: int = 1500,
                          batch_size: int = 64, lr: float = 1e-3,
                          seed: int = 0, holdout: int = 512,
                          width: int = 64, feat_dim: int = 256):
    """Train an :class:`AttributeProbeCNN` on (images, binary attrs).

    images: (N,H,W,3) uint8 or float in [0,1]; attrs: (N,A) in {0,1}.
    The last ``holdout`` examples are held out; returns
    ``(variables, info)`` where info carries ``holdout_auc`` (mean
    per-attribute AUROC) as the probe-quality certificate.
    """
    import optax

    images = np.asarray(images)
    attrs = np.asarray(attrs, np.float32)
    holdout = min(holdout, len(images) // 4)
    rs = np.random.RandomState(seed)
    perm = rs.permutation(len(images))
    train_idx, hold_idx = perm[:-holdout], perm[-holdout:]

    model = AttributeProbeCNN(num_attrs=attrs.shape[1], width=width,
                              feat_dim=feat_dim)
    rng = jax.random.PRNGKey(seed)
    sample = images[:1].astype(np.float32)
    if images.dtype == np.uint8:
        sample = sample / 255.0
    variables = model.init(rng, jnp.asarray(sample), return_logits=True)
    tx = optax.adam(lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x, return_logits=True)
            return optax.sigmoid_binary_cross_entropy(logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    loss = np.inf
    for it in range(steps):
        sel = rs.choice(train_idx, size=min(batch_size, len(train_idx)),
                        replace=False)
        x = images[sel].astype(np.float32)
        if images.dtype == np.uint8:
            x = x / 255.0
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x),
                                       jnp.asarray(attrs[sel]))

    # holdout AUROC per attribute (rank statistic, no sklearn needed)
    hx = images[hold_idx].astype(np.float32)
    if images.dtype == np.uint8:
        hx = hx / 255.0
    logits = []
    for i in range(0, len(hx), batch_size):
        logits.append(np.asarray(model.apply(
            {"params": params}, jnp.asarray(hx[i:i + batch_size]),
            return_logits=True)))
    logits = np.concatenate(logits, axis=0)
    hy = attrs[hold_idx]
    aucs = []
    for a in range(hy.shape[1]):
        pos, neg = logits[hy[:, a] > 0.5, a], logits[hy[:, a] < 0.5, a]
        if len(pos) == 0 or len(neg) == 0:
            continue
        ranks = np.argsort(np.argsort(np.concatenate([pos, neg]))) + 1
        auc = (ranks[:len(pos)].sum() - len(pos) * (len(pos) + 1) / 2) / (
            len(pos) * len(neg))
        aucs.append(float(auc))
    info = {"holdout_auc": float(np.mean(aucs)) if aucs else float("nan"),
            "final_loss": float(loss), "steps": steps,
            "num_attrs": int(attrs.shape[1])}
    return {"params": params}, info


def compute_probe_fid(probe_variables, images_a, images_b,
                      batch_size: int = 64, num_attrs: int = 18,
                      width: int = 64, feat_dim: int = 256) -> float:
    """Fréchet distance in a trained :class:`AttributeProbeCNN`'s feature
    space (the learned-feature fallback for zero-egress environments)."""
    model = AttributeProbeCNN(num_attrs=num_attrs, width=width,
                              feat_dim=feat_dim)
    return compute_fid(probe_variables, images_a, images_b,
                       batch_size=batch_size, model=model)


def init_fid_variables(rng):
    model = InceptionV3FID()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return model.init(rng, x)


def load_torch_fid_inception(variables, state_dict) -> dict:
    """Map a pt_inception-2015-12-05 (or torchvision inception_v3)
    state_dict onto the flax tree."""
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    def _np(t):
        return np.asarray(getattr(t, "detach", lambda: t)()).astype(np.float32)

    for key, val in state_dict.items():
        parts = key.split(".")
        if parts[0].startswith(("AuxLogits", "fc")):
            continue
        *mods, leaf_mod, pname = parts
        node_path = parts[:-2]  # e.g. ['Mixed_5b', 'branch1x1'] then conv/bn
        v = _np(val)
        # torch names: <block...>.conv.weight / .bn.{weight,bias,running_*}
        tgt = params
        st = stats
        for p in parts[:-2]:
            tgt = tgt[p]
            st = st[p]
        if parts[-2] == "conv" and pname == "weight":
            tgt["conv"]["kernel"] = v.transpose(2, 3, 1, 0)
        elif parts[-2] == "bn":
            if pname == "weight":
                tgt["bn"]["scale"] = v
            elif pname == "bias":
                tgt["bn"]["bias"] = v
            elif pname == "running_mean":
                st["bn"]["mean"] = v
            elif pname == "running_var":
                st["bn"]["var"] = v
    return {"params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, stats)}
