"""Numerical parity of the torch->flax weight converters.

The pretrained LPIPS (VGG16) and FID (InceptionV3) weights cannot be
downloaded in this zero-egress image, but torch IS installed — so these
tests hand-build the torch reference networks with random init, export
their state_dicts through ``load_torch_lpips`` / ``load_torch_fid_inception``,
and assert the flax modules reproduce the torch outputs. This validates
both the converter key-mapping and the flax architectures bit-for-bit
against what the real pretrained checkpoints would produce.

Reference layouts: taming LPIPS (vqperceptual.py:59), pytorch-fid
InceptionV3 (inception.py:18-342).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-12)


# --------------------------------------------------------------------------
# LPIPS (VGG16 trunk + lin heads)
# --------------------------------------------------------------------------

_VGG_CFG = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class _TorchLPIPS(torch.nn.Module):
    """taming-style LPIPS: scaling layer, VGG16 features tapped at
    relu{1_2,2_2,3_3,4_3,5_3}, unit-norm, squared diff, 1x1 lin, mean."""

    def __init__(self):
        super().__init__()
        layers: list[torch.nn.Module] = []
        in_ch = 3
        for ch, n_convs in _VGG_CFG:
            for _ in range(n_convs):
                layers.append(torch.nn.Conv2d(in_ch, ch, 3, padding=1))
                layers.append(torch.nn.ReLU())
                in_ch = ch
            layers.append(torch.nn.MaxPool2d(2, 2))
        # torchvision vgg16.features layout (conv indices 0,2,5,...,28)
        self.features = torch.nn.Sequential(*layers[:-1])
        self.lins = torch.nn.ModuleList(
            [torch.nn.Conv2d(ch, 1, 1, bias=False) for ch, _ in _VGG_CFG])
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    def _taps(self, x):
        taps = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in (3, 8, 15, 22, 29):
                taps.append(x)
        return taps

    @staticmethod
    def _unit(feat, eps=1e-10):
        norm = torch.sqrt(torch.sum(feat**2, dim=1, keepdim=True))
        return feat / (norm + eps)

    def forward(self, x, y):
        fx = self._taps((x - self.shift) / self.scale)
        fy = self._taps((y - self.shift) / self.scale)
        total = 0.0
        for k, (a, b) in enumerate(zip(fx, fy)):
            d = (self._unit(a) - self._unit(b)) ** 2
            total = total + self.lins[k](d).mean(dim=(1, 2, 3))
        return total


def test_lpips_torch_parity():
    from encdiff_tpu.losses.lpips import LPIPS, load_torch_lpips

    torch.manual_seed(0)
    tmodel = _TorchLPIPS().eval()

    sd = tmodel.state_dict()
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    vgg_state = {}
    for i in conv_idx:
        vgg_state[f"features.{i}.weight"] = sd[f"features.{i}.weight"]
        vgg_state[f"features.{i}.bias"] = sd[f"features.{i}.bias"]
    lin_state = {f"lin{k}.model.1.weight": tmodel.lins[k].weight
                 for k in range(5)}

    lpips = LPIPS()
    variables = lpips.init_variables(jax.random.PRNGKey(0), image_size=64)
    variables = load_torch_lpips(variables, vgg_state, lin_state)

    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     torch.from_numpy(y.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(lpips(variables, jnp.asarray(x), jnp.asarray(y)))

    assert got.shape == ref.shape == (2,)
    assert _rel_err(got, ref) < 1e-4, (got, ref)


# --------------------------------------------------------------------------
# FID InceptionV3
# --------------------------------------------------------------------------


class _TBasicConv2d(torch.nn.Module):
    def __init__(self, in_ch, out_ch, **kw):
        super().__init__()
        self.conv = torch.nn.Conv2d(in_ch, out_ch, bias=False, **kw)
        self.bn = torch.nn.BatchNorm2d(out_ch, eps=1e-3)
        # randomize running stats so the batch_stats mapping is exercised
        with torch.no_grad():
            self.bn.running_mean.normal_(0, 0.1)
            self.bn.running_var.uniform_(0.5, 1.5)
            self.bn.weight.normal_(1.0, 0.1)
            self.bn.bias.normal_(0, 0.1)

    def forward(self, x):
        return torch.nn.functional.relu(self.bn(self.conv(x)))


def _avg3(x):
    return torch.nn.functional.avg_pool2d(x, 3, stride=1, padding=1,
                                          count_include_pad=False)


class _TInceptionA(torch.nn.Module):
    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = _TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = _TBasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = _TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = _TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _TBasicConv2d(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch1x1(x),
                          self.branch5x5_2(self.branch5x5_1(x)),
                          bd, self.branch_pool(_avg3(x))], 1)


class _TInceptionB(torch.nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = _TBasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = _TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = torch.nn.functional.max_pool2d(x, 3, stride=2)
        return torch.cat([self.branch3x3(x), bd, bp], 1)


class _TInceptionC(torch.nn.Module):
    def __init__(self, in_ch, c7):
        super().__init__()
        self.branch1x1 = _TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = _TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = _TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7_3 = _TBasicConv2d(c7, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7dbl_1 = _TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = _TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                            padding=(3, 0))
        self.branch7x7dbl_3 = _TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                            padding=(0, 3))
        self.branch7x7dbl_4 = _TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                            padding=(3, 0))
        self.branch7x7dbl_5 = _TBasicConv2d(c7, 192, kernel_size=(1, 7),
                                            padding=(0, 3))
        self.branch_pool = _TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg3(x))], 1)


class _TInceptionD(torch.nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = _TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = _TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = _TBasicConv2d(192, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7x3_3 = _TBasicConv2d(192, 192, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7x3_4 = _TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        bp = torch.nn.functional.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class _TInceptionE(torch.nn.Module):
    def __init__(self, in_ch, use_max_pool):
        super().__init__()
        self.use_max_pool = use_max_pool
        self.branch1x1 = _TBasicConv2d(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = _TBasicConv2d(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = _TBasicConv2d(384, 384, kernel_size=(1, 3),
                                          padding=(0, 1))
        self.branch3x3_2b = _TBasicConv2d(384, 384, kernel_size=(3, 1),
                                          padding=(1, 0))
        self.branch3x3dbl_1 = _TBasicConv2d(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = _TBasicConv2d(448, 384, kernel_size=3,
                                            padding=1)
        self.branch3x3dbl_3a = _TBasicConv2d(384, 384, kernel_size=(1, 3),
                                             padding=(0, 1))
        self.branch3x3dbl_3b = _TBasicConv2d(384, 384, kernel_size=(3, 1),
                                             padding=(1, 0))
        self.branch_pool = _TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.use_max_pool:
            bp = torch.nn.functional.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = _avg3(x)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class _TorchFIDInception(torch.nn.Module):
    """pytorch-fid InceptionV3 up to pool3 (2048-d), FID pooling variants."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = _TInceptionA(192, 32)
        self.Mixed_5c = _TInceptionA(256, 64)
        self.Mixed_5d = _TInceptionA(288, 64)
        self.Mixed_6a = _TInceptionB(288)
        self.Mixed_6b = _TInceptionC(768, 128)
        self.Mixed_6c = _TInceptionC(768, 160)
        self.Mixed_6d = _TInceptionC(768, 160)
        self.Mixed_6e = _TInceptionC(768, 192)
        self.Mixed_7a = _TInceptionD(768)
        self.Mixed_7b = _TInceptionE(1280, use_max_pool=False)
        self.Mixed_7c = _TInceptionE(2048, use_max_pool=True)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = torch.nn.functional.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = torch.nn.functional.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))


@pytest.mark.slow
def test_fid_inception_torch_parity():
    from encdiff_tpu.evalx.fid import InceptionV3FID, load_torch_fid_inception

    torch.manual_seed(0)
    tmodel = _TorchFIDInception().eval()

    model = InceptionV3FID(resize_input=False, normalize_input=False)
    x = np.random.RandomState(2).uniform(
        0, 1, size=(2, 75, 75, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = load_torch_fid_inception(variables, tmodel.state_dict())

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x)))

    assert got.shape == ref.shape == (2, 2048)
    assert _rel_err(got, ref) < 1e-3, _rel_err(got, ref)


# --------------------------------------------------------------------------
# CLIP (text + vision towers, OpenAI clip/model.py key layout)
# --------------------------------------------------------------------------


class _QuickGELU(torch.nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _TorchCLIPBlock(torch.nn.Module):
    def __init__(self, width, heads):
        super().__init__()
        from collections import OrderedDict

        self.attn = torch.nn.MultiheadAttention(width, heads,
                                                batch_first=True)
        self.ln_1 = torch.nn.LayerNorm(width)
        self.mlp = torch.nn.Sequential(OrderedDict([
            ("c_fc", torch.nn.Linear(width, width * 4)),
            ("gelu", _QuickGELU()),
            ("c_proj", torch.nn.Linear(width * 4, width)),
        ]))
        self.ln_2 = torch.nn.LayerNorm(width)

    def forward(self, x, attn_mask=None):
        h = self.ln_1(x)
        h = self.attn(h, h, h, need_weights=False, attn_mask=attn_mask)[0]
        x = x + h
        return x + self.mlp(self.ln_2(x))


class _TorchCLIP(torch.nn.Module):
    """Minimal replica of OpenAI clip.model.CLIP with its state_dict key
    layout (token_embedding, transformer.resblocks.N.*, visual.*)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.token_embedding = torch.nn.Embedding(cfg.vocab_size,
                                                  cfg.text_width)
        self.positional_embedding = torch.nn.Parameter(
            torch.randn(cfg.context_length, cfg.text_width) * 0.02)
        self.transformer = torch.nn.Module()
        self.transformer.resblocks = torch.nn.ModuleList(
            [_TorchCLIPBlock(cfg.text_width, cfg.text_heads)
             for _ in range(cfg.text_layers)])
        self.ln_final = torch.nn.LayerNorm(cfg.text_width)
        self.text_projection = torch.nn.Parameter(
            torch.randn(cfg.text_width, cfg.embed_dim) * 0.02)

        self.visual = torch.nn.Module()
        v = self.visual
        v.conv1 = torch.nn.Conv2d(3, cfg.vision_width, cfg.patch_size,
                                  stride=cfg.patch_size, bias=False)
        v.class_embedding = torch.nn.Parameter(
            torch.randn(cfg.vision_width) * 0.02)
        n_patches = (cfg.image_resolution // cfg.patch_size) ** 2
        v.positional_embedding = torch.nn.Parameter(
            torch.randn(n_patches + 1, cfg.vision_width) * 0.02)
        v.ln_pre = torch.nn.LayerNorm(cfg.vision_width)
        v.transformer = torch.nn.Module()
        v.transformer.resblocks = torch.nn.ModuleList(
            [_TorchCLIPBlock(cfg.vision_width, cfg.vision_heads)
             for _ in range(cfg.vision_layers)])
        v.ln_post = torch.nn.LayerNorm(cfg.vision_width)
        v.proj = torch.nn.Parameter(
            torch.randn(cfg.vision_width, cfg.embed_dim) * 0.02)

    def encode_text(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding[None]
        n = tokens.shape[1]
        mask = torch.full((n, n), float("-inf")).triu(1)
        for blk in self.transformer.resblocks:
            x = blk(x, attn_mask=mask)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return pooled @ self.text_projection

    def encode_image(self, images):
        v = self.visual
        x = v.conv1(images)                                # (B, W, H', W')
        b, w = x.shape[:2]
        x = x.reshape(b, w, -1).permute(0, 2, 1)           # (B, N, W)
        cls = v.class_embedding[None, None].expand(b, 1, w)
        x = torch.cat([cls, x], dim=1) + v.positional_embedding[None]
        x = v.ln_pre(x)
        for blk in v.transformer.resblocks:
            x = blk(x)
        return v.ln_post(x[:, 0]) @ v.proj


def test_clip_converter_parity():
    """Random-init torch CLIP replica -> load_torch_clip -> identical
    text/image embeddings from the flax towers (~1e-5)."""
    from encdiff_tpu.nn.clip import CLIP, CLIPConfig

    cfg = CLIPConfig(embed_dim=32, vocab_size=96, context_length=12,
                     text_width=48, text_heads=4, text_layers=2,
                     image_resolution=32, patch_size=8, vision_width=64,
                     vision_heads=4, vision_layers=2)
    torch.manual_seed(0)
    tmodel = _TorchCLIP(cfg).eval()

    clip = CLIP(cfg)
    variables = clip.init_variables(jax.random.PRNGKey(0))
    variables = clip.load_torch(variables, tmodel.state_dict())

    rs = np.random.RandomState(0)
    tokens = np.zeros((3, 12), np.int64)
    for i in range(3):
        ln = rs.randint(3, 12)
        tokens[i, :ln] = rs.randint(1, 94, size=ln)
        tokens[i, ln - 1] = 95  # EOT = max id
    images = rs.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        t_text = tmodel.encode_text(torch.from_numpy(tokens)).numpy()
        t_img = tmodel.encode_image(
            torch.from_numpy(images.transpose(0, 3, 1, 2))).numpy()

    f_text = np.asarray(clip.encode_text(variables, jnp.asarray(tokens)))
    # bypass preprocessing: feed the exact same pixels the torch side saw
    from encdiff_tpu.nn.clip import _CLIPModules

    f_img = np.asarray(clip.module.apply(
        variables, jnp.asarray(images), method=_CLIPModules.encode_image))

    assert _rel_err(f_text, t_text) < 1e-4, _rel_err(f_text, t_text)
    assert _rel_err(f_img, t_img) < 1e-4, _rel_err(f_img, t_img)


def test_frozen_clip_embedders_smoke():
    """The reference-facing embedder classes run end-to-end with random
    init: normalized text embeddings, n_repeat, image path with resize."""
    from encdiff_tpu.nn.clip import CLIPConfig
    from encdiff_tpu.nn.encoders import (FrozenCLIPTextEmbedder,
                                         FrozenClipImageEmbedder)

    cfg = CLIPConfig(embed_dim=16, vocab_size=64, context_length=8,
                     text_width=32, text_heads=2, text_layers=1,
                     image_resolution=32, patch_size=8, vision_width=32,
                     vision_heads=2, vision_layers=1)
    emb = FrozenCLIPTextEmbedder(cfg, max_length=8, n_repeat=2)
    v = emb.init_variables(jax.random.PRNGKey(0))
    z = emb.encode(v, ["a red cube", "blue sphere on floor"])
    assert z.shape == (2, 2, 16)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(z, axis=-1)), 1.0, rtol=1e-4)

    iemb = FrozenClipImageEmbedder(cfg)
    vi = iemb.init_variables(jax.random.PRNGKey(1))
    imgs = jnp.asarray(np.random.RandomState(0)
                       .rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    zi = iemb.encode(vi, imgs)
    assert zi.shape == (2, 16)
