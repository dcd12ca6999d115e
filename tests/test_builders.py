"""Parity tests for nn/builders.py vs the reference string-spec builders.

Builds the ACTUAL reference ``model_layout2img/layers.py`` nets on CPU,
randomizes their weights, transfers them into the Flax modules, and matches
train-mode forwards. Same technique as tests/test_reference_parity.py.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layout2img_tpu.nn.builders import BuiltCNN, BuiltMLP, build_cnn, build_mlp, cnn_out_channels

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model_layout2img")),
    reason="reference repo not available",
)


@pytest.fixture(scope="module")
def ref_layers():
    import torch

    sys.path.insert(0, REF)
    import importlib

    mod = importlib.import_module("model_layout2img.layers")
    return torch, mod


def _randomize(torch, net, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)


def _conv_params(torch, conv):
    return {
        "kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }


def _bn_params(bn):
    params = {"scale": jnp.asarray(bn.weight.detach().numpy()),
              "bias": jnp.asarray(bn.bias.detach().numpy())}
    stats = {"mean": jnp.asarray(bn.running_mean.detach().numpy()),
             "var": jnp.asarray(bn.running_var.detach().numpy())}
    return params, stats


def _dense_params_from_flatten(torch, lin, h, w, c):
    # torch flattens (c, h, w); our NHWC flatten is (h, w, c)
    w_t = lin.weight.detach().numpy()  # (out, c*h*w)
    out = w_t.shape[0]
    w_t = w_t.reshape(out, c, h, w).transpose(0, 2, 3, 1).reshape(out, -1)
    return {"kernel": jnp.asarray(w_t.T),
            "bias": jnp.asarray(lin.bias.detach().numpy())}


def test_build_cnn_parity_torch(ref_layers):
    torch, mod = ref_layers
    arch = "I8,C3-16,R,C3-32-2,P2,U2,C3-16,FC-256-7"
    ref_net, ref_ch = mod.build_cnn(arch, normalization="batch",
                                    activation="leakyrelu-0.2", pooling="max")
    assert cnn_out_channels(arch) == ref_ch == 7
    _randomize(torch, ref_net)

    # walk the torch Sequential in build order:
    # [Conv, ResidualBlock, BN, Act, Conv, MaxPool, Upsample, BN, Act, Conv,
    #  Flatten, Linear]
    seq = list(ref_net)
    params = {}
    stats = {}
    params["conv_0"] = _conv_params(torch, seq[0])
    res = seq[1].net  # BN, act, conv, BN, act, conv
    p1, s1 = _bn_params(res[0])
    p2, s2 = _bn_params(res[3])
    params["res_1"] = {
        "norm1": {"BatchNorm_0": p1},
        "conv1": _conv_params(torch, res[2]),
        "norm2": {"BatchNorm_0": p2},
        "conv2": _conv_params(torch, res[5]),
    }
    stats["res_1"] = {"norm1": {"BatchNorm_0": s1}, "norm2": {"BatchNorm_0": s2}}
    p, s = _bn_params(seq[2])
    params["norm_2"] = {"BatchNorm_0": p}
    stats["norm_2"] = {"BatchNorm_0": s}
    params["conv_2"] = _conv_params(torch, seq[4])
    p, s = _bn_params(seq[7])
    params["norm_5"] = {"BatchNorm_0": p}
    stats["norm_5"] = {"BatchNorm_0": s}
    params["conv_5"] = _conv_params(torch, seq[9])
    params["fc_6"] = _dense_params_from_flatten(torch, seq[11], 4, 4, 16)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 8)).astype(np.float32)

    ref_net.train()
    with torch.no_grad():
        want = ref_net(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()

    net = BuiltCNN(arch=arch, normalization="batch", activation="leakyrelu-0.2")
    got, _ = net.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                       train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_build_cnn_instance_norm_parity(ref_layers):
    torch, mod = ref_layers
    arch = "I4,C3-8,C3-8"
    ref_net, _ = mod.build_cnn(arch, normalization="instance",
                               activation="leakyrelu-0.2")
    _randomize(torch, ref_net)
    seq = list(ref_net)  # [Conv, IN, Act, Conv]
    params = {
        "conv_0": _conv_params(torch, seq[0]),
        "norm_1": {"GroupNorm_0": {
            "scale": jnp.asarray(seq[1].weight.detach().numpy()),
            "bias": jnp.asarray(seq[1].bias.detach().numpy()),
        }},
        "conv_1": _conv_params(torch, seq[3]),
    }
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 6, 4)).astype(np.float32)
    ref_net.train()  # eval-mode ref IN switches to running stats (documented delta)
    with torch.no_grad():
        want = ref_net(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
    net = BuiltCNN(arch=arch, normalization="instance", activation="leakyrelu-0.2")
    got = net.apply({"params": params}, jnp.asarray(x), train=True)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5)


def test_build_cnn_nchw_vs_nhwc_layout(ref_layers):
    # conv-only outputs compare in NCHW (checks U/P spatial semantics too)
    torch, mod = ref_layers
    arch = "I4,C5-6,P2,U2,C1-3"
    ref_net, _ = mod.build_cnn(arch, normalization="none",
                               activation="leakyrelu-0.2", pooling="avg")
    _randomize(torch, ref_net)
    seq = list(ref_net)  # [Conv, AvgPool, Upsample, Act, Conv]? norm none drops BN
    convs = [m for m in seq if isinstance(m, torch.nn.Conv2d)]
    params = {"conv_0": _conv_params(torch, convs[0]),
              "conv_3": _conv_params(torch, convs[1])}
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 8, 8, 4)).astype(np.float32)
    with torch.no_grad():
        want = ref_net(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
    net = BuiltCNN(arch=arch, normalization="none", activation="leakyrelu-0.2",
                   pooling="avg")
    got = net.apply({"params": params}, jnp.asarray(x), train=True)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5)


def test_build_mlp_parity_torch(ref_layers):
    torch, mod = ref_layers
    dims = [12, 24, 7]
    ref_net = mod.build_mlp(dims, activation="leakyrelu", batch_norm="batch",
                            dropout=0, final_nonlinearity=True)
    _randomize(torch, ref_net)
    seq = list(ref_net)  # [Lin, BN, Act, Lin, BN, Act]
    p0, s0 = _bn_params(seq[1])
    p1, s1 = _bn_params(seq[4])
    params = {
        "dense_0": {"kernel": jnp.asarray(seq[0].weight.detach().numpy().T),
                    "bias": jnp.asarray(seq[0].bias.detach().numpy())},
        "BatchNorm_0": p0,
        "dense_1": {"kernel": jnp.asarray(seq[3].weight.detach().numpy().T),
                    "bias": jnp.asarray(seq[3].bias.detach().numpy())},
        "BatchNorm_1": p1,
    }
    stats = {"BatchNorm_0": s0, "BatchNorm_1": s1}
    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 12)).astype(np.float32)
    ref_net.train()
    with torch.no_grad():
        want = ref_net(torch.from_numpy(x)).numpy()
    # torch nn.LeakyReLU default slope is 0.01 == our leakyrelu default
    net = BuiltMLP(dims=tuple(dims), activation="leakyrelu", batch_norm="batch",
                   final_nonlinearity=True)
    got, _ = net.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                       train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_builder_constructors():
    net, ch = build_cnn("I8,C3-16,FC-1024-5")
    assert isinstance(net, BuiltCNN) and ch == 5
    mlp = build_mlp([4, 8, 2], final_nonlinearity=False)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 4))
    v = mlp.init(rng, x, train=False)
    y = mlp.apply(v, x, train=False)
    assert y.shape == (2, 2)
