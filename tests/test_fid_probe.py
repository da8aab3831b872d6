"""Attribute-probe FID fallback (learned-feature Fréchet distance).

The zero-egress environment has no pretrained Inception weights, so
``scripts/celeba_fid.py --feature_probe_npz`` trains a small
attribute-supervised CNN and measures the Fréchet distance in its feature
space (protocol shape: ``celeba_fid.py:26-229`` with pool3 swapped for
learned features). These tests certify the fallback end-to-end on a tiny
synthetic problem with an analytically known answer: sets drawn from the
same attribute distribution must score near zero; sets with disjoint
attribute distributions must score far apart.
"""

from __future__ import annotations

import numpy as np

from encdiff_tpu.evalx import fid as fid_lib


def _make_images(n, bright_left, rs, size=16):
    """Images whose single binary attribute is 'left half bright'."""
    imgs = rs.rand(n, size, size, 3).astype(np.float32) * 0.2
    half = size // 2
    for i in range(n):
        side = slice(0, half) if bright_left[i] else slice(half, size)
        imgs[i, :, side, :] += 0.7
    return np.clip(imgs, 0.0, 1.0)


def test_attribute_probe_learns_and_separates():
    rs = np.random.RandomState(0)
    n = 256
    attr = (rs.rand(n) > 0.5).astype(np.float32)
    imgs = _make_images(n, attr > 0.5, rs)

    pvars, info = fid_lib.train_attribute_probe(
        imgs, attr[:, None], steps=120, batch_size=32, holdout=64,
        width=8, feat_dim=16, seed=0)
    assert info["holdout_auc"] > 0.95, info

    # fresh draws: same attribute mix vs all-left / all-right splits
    attr2 = (rs.rand(n) > 0.5).astype(np.float32)
    same = _make_images(n, attr2 > 0.5, rs)
    left = _make_images(n, np.ones(n, bool), rs)
    right = _make_images(n, np.zeros(n, bool), rs)

    kw = dict(batch_size=64, num_attrs=1, width=8, feat_dim=16)
    d_same = fid_lib.compute_probe_fid(pvars, imgs, same, **kw)
    d_diff = fid_lib.compute_probe_fid(pvars, left, right, **kw)
    assert d_diff > 10 * max(d_same, 1e-9), (d_same, d_diff)


def test_probe_fid_matched_sets_near_zero():
    rs = np.random.RandomState(1)
    n = 200
    attr = (rs.rand(n) > 0.5).astype(np.float32)
    imgs = _make_images(n, attr > 0.5, rs)
    pvars, _ = fid_lib.train_attribute_probe(
        imgs, attr[:, None], steps=60, batch_size=32, holdout=50,
        width=8, feat_dim=16, seed=1)
    kw = dict(batch_size=64, num_attrs=1, width=8, feat_dim=16)
    d_self = fid_lib.compute_probe_fid(pvars, imgs, imgs.copy(), **kw)
    assert d_self < 1e-6, d_self
