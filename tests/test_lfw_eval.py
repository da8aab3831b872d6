"""LFW attribute-regression protocol on the synthetic-faces LFW-format
writer (eval_lfw.py / lfw_src rebuild, runnable end-to-end without the
real LFW files in this zero-egress environment)."""

from __future__ import annotations

import os

import numpy as np

from encdiff_tpu.data.synthetic_faces import (FACE_LFW_ATTR_NAMES,
                                              write_lfw_format)
from encdiff_tpu.evalx.lfw import LFWAttribute, eval_lfw

TINY_GRID = [3, 3, 3, 2, 2, 2, 2]  # 432 images


def test_write_lfw_format_layout(tmp_path):
    root = write_lfw_format(str(tmp_path / "lfw"), image_size=32, num=60,
                            seed=0, factor_sizes=TINY_GRID)
    assert os.path.exists(os.path.join(root, "lfw_attributes.txt"))
    train = LFWAttribute(root, "train", image_size=32)
    test = LFWAttribute(root, "test", image_size=32)
    assert train.num_attributes == len(FACE_LFW_ATTR_NAMES)
    assert len(train.names) + len(test.names) == 60
    assert 0 < len(test.names) < len(train.names)
    imgs = test.load_images()
    assert imgs.shape == (len(test.names), 32, 32, 3)
    assert imgs.dtype == np.uint8

    # split must be stable across instantiations (md5, not salted hash())
    train2 = LFWAttribute(root, "train", image_size=32)
    assert [n for n, _ in train2.names] == [n for n, _ in train.names]


def test_eval_lfw_oracle_encoder_recovers_attributes(tmp_path):
    """A hand-built region-statistics encoder (hair band / face center /
    background corners mean colors) must let the linear probe regress the
    color-derived continuous attributes with high Pearson r."""
    root = write_lfw_format(str(tmp_path / "lfw"), image_size=32, num=432,
                            seed=1, factor_sizes=TINY_GRID)

    def encode(x):  # x: (B,32,32,3) in [-1,1]
        hair = x[:, 2:8, 8:24, :].mean(axis=(1, 2))
        face = x[:, 14:22, 12:20, :].mean(axis=(1, 2))
        bg = np.concatenate([x[:, :4, :4, :], x[:, :4, -4:, :]],
                            axis=2).mean(axis=(1, 2))
        mouth = x[:, 22:27, 12:20, :].mean(axis=(1, 2))
        eyes = x[:, 14:18, 8:24, :].std(axis=(1, 2))
        return np.concatenate([hair, face, bg, mouth, eyes], axis=1)

    results = eval_lfw(encode, root, image_size=32, epochs=150,
                       probe_lr=1e-2)
    per_attr = dict(zip(FACE_LFW_ATTR_NAMES, results["per_attribute_r"]))
    # color attributes are linearly decodable from region means
    assert per_attr["Background_Warmth"] > 0.8, per_attr
    assert per_attr["Skin_Tone"] > 0.6, per_attr
    # the 32px hand-built hair slice is an imperfect oracle — moderate bar
    assert per_attr["Hair_Darkness"] > 0.4, per_attr
    assert results["best_avg_pearson_r"] > 0.3, results
