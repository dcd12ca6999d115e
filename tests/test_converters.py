"""Numeric parity tests for the torch->flax weight converters.

No pretrained weights exist in the sandbox (zero egress), so the torch
module graphs are hand-built with the torchvision topologies, randomly
initialized, saved as state_dicts, converted, and the forwards compared —
the same technique as the generator parity suite. This pins the converter's
key mapping, kernel transposes, and BN stat routing so a silent bug can't
hide until real weights arrive (VERDICT round-1 weak #4).

Topologies mirrored: torchvision vgg19.features / inception_v3 (aux head
excluded, as the converter skips it) / lpips AlexNet+lin heads
(reference users: utils/util.py:49-94, IS.py:152-191, test_lpips.py:22-41).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


def _to_nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)).float()


# ---------------------------------------------------------------- VGG19 ----


def _torch_vgg19_features() -> nn.Sequential:
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for item in cfg:
        if item == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_ch, item, 3, padding=1), nn.ReLU(inplace=False)]
            in_ch = item
    return nn.Sequential(*layers)


def test_vgg19_converter_forward_parity(rng, tmp_path):
    from layout2img_tpu.losses.perceptual import (
        _TAP_AFTER_CONV,
        VGG19Features,
        load_torch_vgg19_features,
    )

    tnet = _torch_vgg19_features()
    for p in tnet.parameters():  # non-degenerate random weights
        nn.init.normal_(p, std=0.05)
    path = tmp_path / "vgg19_features.pth"
    torch.save(tnet.state_dict(), str(path))

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    # torch taps after relu1_1/2_1/3_1/4_1/5_1 == relu following conv ordinal
    taps_t, conv_idx = [], 0
    h = _to_nchw(x)
    with torch.no_grad():
        for layer in tnet:
            h = layer(h)
            if isinstance(layer, nn.ReLU):
                if conv_idx in _TAP_AFTER_CONV:
                    taps_t.append(h.numpy().transpose(0, 2, 3, 1))
                conv_idx += 1

    params = load_torch_vgg19_features(str(path))
    taps_f = VGG19Features().apply({"params": params}, jnp.asarray(x))
    assert len(taps_f) == len(taps_t) == 5
    for i, (tf_, tt) in enumerate(zip(taps_f, taps_t)):
        # activations grow to O(100) through the deep taps; tolerance scales
        # with magnitude (pure conv-accumulation-order float noise)
        atol = 1e-5 * max(1.0, float(np.abs(tt).max()))
        np.testing.assert_allclose(np.asarray(tf_), tt, rtol=1e-3, atol=atol), i


def test_vgg19_converter_accepts_model_prefixed_keys(rng, tmp_path):
    """torchvision full-model dicts use 'features.N.weight' keys."""
    from layout2img_tpu.losses.perceptual import load_torch_vgg19_features

    tnet = _torch_vgg19_features()
    sd = {f"features.{k}": v for k, v in tnet.state_dict().items()}
    path = tmp_path / "vgg19_full.pth"
    torch.save(sd, str(path))
    params = load_torch_vgg19_features(str(path))
    assert params["conv0"]["kernel"].shape == (3, 3, 3, 64)
    assert params["conv15"]["kernel"].shape == (3, 3, 512, 512)


# ---------------------------------------------------------- InceptionV3 ----


class _TBasicConv(nn.Module):
    def __init__(self, i, o, k, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(i, o, k, stride, padding, bias=False)
        self.bn = nn.BatchNorm2d(o, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class _TInceptionA(nn.Module):
    def __init__(self, i, pool_features):
        super().__init__()
        self.branch1x1 = _TBasicConv(i, 64, 1)
        self.branch5x5_1 = _TBasicConv(i, 48, 1)
        self.branch5x5_2 = _TBasicConv(48, 64, 5, padding=2)
        self.branch3x3dbl_1 = _TBasicConv(i, 64, 1)
        self.branch3x3dbl_2 = _TBasicConv(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = _TBasicConv(96, 96, 3, padding=1)
        self.branch_pool = _TBasicConv(i, pool_features, 1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1))
        return torch.cat([b1, b5, bd, bp], 1)


class _TInceptionB(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = _TBasicConv(i, 384, 3, stride=2)
        self.branch3x3dbl_1 = _TBasicConv(i, 64, 1)
        self.branch3x3dbl_2 = _TBasicConv(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = _TBasicConv(96, 96, 3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, 2)
        return torch.cat([b3, bd, bp], 1)


class _TInceptionC(nn.Module):
    def __init__(self, i, c7):
        super().__init__()
        self.branch1x1 = _TBasicConv(i, 192, 1)
        self.branch7x7_1 = _TBasicConv(i, c7, 1)
        self.branch7x7_2 = _TBasicConv(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7_3 = _TBasicConv(c7, 192, (7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _TBasicConv(i, c7, 1)
        self.branch7x7dbl_2 = _TBasicConv(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _TBasicConv(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _TBasicConv(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _TBasicConv(c7, 192, (1, 7), padding=(0, 3))
        self.branch_pool = _TBasicConv(i, 192, 1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
            self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1))
        return torch.cat([b1, b7, bd, bp], 1)


class _TInceptionD(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = _TBasicConv(i, 192, 1)
        self.branch3x3_2 = _TBasicConv(192, 320, 3, stride=2)
        self.branch7x7x3_1 = _TBasicConv(i, 192, 1)
        self.branch7x7x3_2 = _TBasicConv(192, 192, (1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _TBasicConv(192, 192, (7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _TBasicConv(192, 192, 3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(
            self.branch7x7x3_2(self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, 3, 2)
        return torch.cat([b3, b7, bp], 1)


class _TInceptionE(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch1x1 = _TBasicConv(i, 320, 1)
        self.branch3x3_1 = _TBasicConv(i, 384, 1)
        self.branch3x3_2a = _TBasicConv(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3_2b = _TBasicConv(384, 384, (3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _TBasicConv(i, 448, 1)
        self.branch3x3dbl_2 = _TBasicConv(448, 384, 3, padding=1)
        self.branch3x3dbl_3a = _TBasicConv(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _TBasicConv(384, 384, (3, 1), padding=(1, 0))
        self.branch_pool = _TBasicConv(i, 192, 1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1))
        return torch.cat([b1, b3, bd, bp], 1)


class _TInceptionV3(nn.Module):
    """torchvision inception_v3 topology (aux head omitted — the converter
    skips AuxLogits.* keys)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _TBasicConv(3, 32, 3, stride=2)
        self.Conv2d_2a_3x3 = _TBasicConv(32, 32, 3)
        self.Conv2d_2b_3x3 = _TBasicConv(32, 64, 3, padding=1)
        self.Conv2d_3b_1x1 = _TBasicConv(64, 80, 1)
        self.Conv2d_4a_3x3 = _TBasicConv(80, 192, 3)
        self.Mixed_5b = _TInceptionA(192, 32)
        self.Mixed_5c = _TInceptionA(256, 64)
        self.Mixed_5d = _TInceptionA(288, 64)
        self.Mixed_6a = _TInceptionB(288)
        self.Mixed_6b = _TInceptionC(768, 128)
        self.Mixed_6c = _TInceptionC(768, 160)
        self.Mixed_6d = _TInceptionC(768, 160)
        self.Mixed_6e = _TInceptionC(768, 192)
        self.Mixed_7a = _TInceptionD(768)
        self.Mixed_7b = _TInceptionE(1280)
        self.Mixed_7c = _TInceptionE(2048)
        self.fc = nn.Linear(2048, 1000)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                     "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                     "Mixed_7c"):
            x = getattr(self, name)(x)
        feats = x.mean(dim=(2, 3))
        return feats, self.fc(feats)


def _randomize_bn_stats(module: nn.Module, gen: torch.Generator):
    """Make running stats non-trivial so the stat routing is actually tested."""
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1, generator=gen)
            m.running_var.uniform_(0.5, 1.5, generator=gen)
            nn.init.normal_(m.weight, 1.0, 0.1)
            nn.init.normal_(m.bias, 0.0, 0.1)


def test_inception_converter_forward_parity(rng, tmp_path):
    from layout2img_tpu.eval.inception import InceptionV3, load_torch_inception_v3

    tnet = _TInceptionV3()
    gen = torch.Generator().manual_seed(0)
    for p in tnet.parameters():
        nn.init.normal_(p, std=0.05)
    _randomize_bn_stats(tnet, gen)
    tnet.eval()
    path = tmp_path / "inception_v3.pth"
    torch.save(tnet.state_dict(), str(path))

    # feed 299x299 so the flax-internal resize is the identity
    x = rng.standard_normal((2, 299, 299, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        feats_t, logits_t = tnet(_to_nchw(x))

    variables = load_torch_inception_v3(str(path))
    feats_f, logits_f = InceptionV3().apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(feats_f), feats_t.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits_f), logits_t.numpy(), rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------- LPIPS ----


_ALEX_LAYERS = [  # (torch features index, in, out, kernel, stride, padding)
    (0, 3, 64, 11, 4, 2),
    (3, 64, 192, 5, 1, 2),
    (6, 192, 384, 3, 1, 1),
    (8, 384, 256, 3, 1, 1),
    (10, 256, 256, 3, 1, 1),
]


def test_lpips_converter_forward_parity(rng, tmp_path):
    from layout2img_tpu.eval.lpips import _ALEX_CHANNELS, _SCALE, _SHIFT, LPIPS, load_torch_lpips

    gen = torch.Generator().manual_seed(0)
    sd = {}
    convs = []
    for idx, i, o, k, s, p in _ALEX_LAYERS:
        conv = nn.Conv2d(i, o, k, s, p)
        nn.init.normal_(conv.weight, std=0.05)
        nn.init.normal_(conv.bias, std=0.05)
        convs.append((conv, s))
        sd[f"features.{idx}.weight"] = conv.weight.detach().clone()
        sd[f"features.{idx}.bias"] = conv.bias.detach().clone()
    lins = []
    for li, c in enumerate(_ALEX_CHANNELS):
        w = torch.rand(1, c, 1, 1, generator=gen)
        lins.append(w[0, :, 0, 0].numpy())
        sd[f"lin{li}.model.1.weight"] = w
    path = tmp_path / "lpips_alex.pth"
    torch.save(sd, str(path))

    a = rng.standard_normal((2, 64, 64, 3)).astype(np.float32).clip(-1, 1)
    b = rng.standard_normal((2, 64, 64, 3)).astype(np.float32).clip(-1, 1)

    # torch-side LPIPS computation (lpips package semantics)
    def torch_feats(x_nhwc):
        shift = torch.tensor(np.asarray(_SHIFT)).view(1, 3, 1, 1)
        scale = torch.tensor(np.asarray(_SCALE)).view(1, 3, 1, 1)
        h = (_to_nchw(x_nhwc) - shift) / scale
        taps = []
        pool_after = {0, 1}  # maxpool follows relu after conv0 and conv1
        with torch.no_grad():
            for ci, (conv, _) in enumerate(convs):
                h = F.relu(conv(h))
                taps.append(h)
                if ci in pool_after:
                    h = F.max_pool2d(h, 3, 2)
        return taps

    fa, fb = torch_feats(a), torch_feats(b)
    want = np.zeros(2, np.float32)
    for f1, f2, lin in zip(fa, fb, lins):
        n1 = f1 / torch.sqrt((f1**2).sum(1, keepdim=True) + 1e-10)
        n2 = f2 / torch.sqrt((f2**2).sum(1, keepdim=True) + 1e-10)
        d = (n1 - n2) ** 2 * torch.tensor(lin).view(1, -1, 1, 1)
        want += d.sum(1).mean(dim=(1, 2)).numpy()

    metric = LPIPS(load_torch_lpips(str(path)))
    got = np.asarray(metric(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # same weights in the full lpips.LPIPS state_dict layout: slices keep the
    # GLOBAL torchvision features index (lpips add_module(str(x), features[x]))
    slice_of = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}
    sd_full = {f"lin{li}.model.1.weight": sd[f"lin{li}.model.1.weight"]
               for li in range(5)}
    for idx, *_ in _ALEX_LAYERS:
        for wb in ("weight", "bias"):
            sd_full[f"net.slice{slice_of[idx]}.{idx}.{wb}"] = sd[f"features.{idx}.{wb}"]
    path2 = tmp_path / "lpips_full.pth"
    torch.save(sd_full, str(path2))
    got2 = np.asarray(LPIPS(load_torch_lpips(str(path2)))(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got2, want, rtol=1e-4, atol=1e-5)

    # lins-only official .pth: clear error without a backbone, works with one
    sd_lins = {f"lin{li}.model.1.weight": sd[f"lin{li}.model.1.weight"]
               for li in range(5)}
    path3 = tmp_path / "lpips_lins.pth"
    torch.save(sd_lins, str(path3))
    with pytest.raises(ValueError, match="backbone"):
        load_torch_lpips(str(path3))
    sd_bb = {k: v for k, v in sd.items() if k.startswith("features.")}
    path_bb = tmp_path / "alexnet.pth"
    torch.save(sd_bb, str(path_bb))
    got3 = np.asarray(
        LPIPS(load_torch_lpips(str(path3), str(path_bb)))(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got3, want, rtol=1e-4, atol=1e-5)
