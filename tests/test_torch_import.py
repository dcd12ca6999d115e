"""Torch checkpoint interop: build a reference-named state_dict (inverse
mapping) from an initialized generator and verify import reproduces the
exact variable trees."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layout2img_tpu.models.generators import make_generator
from layout2img_tpu.utils.torch_import import import_lostgan_generator


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _export_torch_sd(variables, preset):
    """Inverse of import_lostgan_generator for test purposes: emits the
    reference's state_dict key names (resnet_generator_app_v2.py module
    tree) from our variable trees."""
    p = _flatten(variables["params"])
    s = _flatten(variables["batch_stats"])
    u = _flatten(variables["spectral"])
    sd = {}

    def put_linear(torch_name, path, sn):
        sd[f"{torch_name}.weight_orig" if sn else f"{torch_name}.weight"] = p[path + ("kernel",)].T
        if path + ("bias",) in p:
            sd[f"{torch_name}.bias"] = p[path + ("bias",)]
        if sn:
            sd[f"{torch_name}.weight_u"] = u[path + ("u",)]

    def put_conv(torch_name, path, sn):
        sd[f"{torch_name}.weight_orig" if sn else f"{torch_name}.weight"] = p[
            path + ("kernel",)
        ].transpose(3, 2, 0, 1)
        if path + ("bias",) in p:
            sd[f"{torch_name}.bias"] = p[path + ("bias",)]
        if sn:
            sd[f"{torch_name}.weight_u"] = u[path + ("u",)]

    def put_bn(torch_name, path):
        if path + ("scale",) in p:
            sd[f"{torch_name}.weight"] = p[path + ("scale",)]
            sd[f"{torch_name}.bias"] = p[path + ("bias",)]
        sd[f"{torch_name}.running_mean"] = s[path + ("mean",)]
        sd[f"{torch_name}.running_var"] = s[path + ("var",)]

    sd["label_embedding.weight"] = p[("label_embedding", "embedding")]
    if ("context", "q_proj", "kernel") in p:
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            put_linear(f"context.linears.{i}", ("context", name), sn=False)
        put_linear("context.linears.3", ("context", "out_proj"), sn=False)
        wg = p[("context", "geo_proj", "kernel")]  # (64, h)
        wb = p[("context", "geo_proj", "bias")]
        for h in range(wg.shape[1]):
            sd[f"context.WGs.{h}.weight"] = wg[:, h : h + 1].T
            sd[f"context.WGs.{h}.bias"] = wb[h : h + 1]
        for t_name, name in (("layer_norm0", "ln0"), ("layer_norm", "ln1")):
            sd[f"context.{t_name}.weight"] = p[("context", name, "scale")]
            sd[f"context.{t_name}.bias"] = p[("context", name, "bias")]
    if ("context", "gc1_w") in p:
        for gc in ("gc1", "gc2"):
            sd[f"context.{gc}.weight"] = p[("context", f"{gc}_w")]
            sd[f"context.{gc}.bias"] = p[("context", f"{gc}_b")]
    put_linear("fc", ("fc",), sn=True)

    i = 1
    while (f"res{i}", "conv1", "kernel") in p:
        mine = f"res{i}"
        for sub in ("conv1", "conv2"):
            put_conv(f"{mine}.{sub}", (mine, sub), sn=True)
        if (mine, "c_sc", "kernel") in p:
            put_conv(f"{mine}.c_sc", (mine, "c_sc"), sn=True)
        for b in ("b1", "b2"):
            put_linear(f"{mine}.{b}.weight_proj", (mine, b, "weight_proj"), sn=True)
            put_linear(f"{mine}.{b}.bias_proj", (mine, b, "bias_proj"), sn=True)
            put_bn(f"{mine}.{b}.batch_norm2d", (mine, b, "bn"))
        if (mine, "mask_conv1", "kernel") in p:
            put_conv(f"{mine}.conv_mask.0", (mine, "mask_conv1"), sn=False)
            put_bn(f"{mine}.conv_mask.1", (mine, "mask_bn"))
            put_conv(f"{mine}.conv_mask.3", (mine, "mask_conv2"), sn=False)
        elif (mine, "psp", "bottleneck_conv", "kernel") in p:
            k = 0
            while (mine, "psp", f"stage{k}_conv", "kernel") in p:
                put_conv(f"{mine}.conv_mask.0.stages.{k}.1", (mine, "psp", f"stage{k}_conv"), sn=False)
                put_bn(f"{mine}.conv_mask.0.stages.{k}.2", (mine, "psp", f"stage{k}_bn"))
                k += 1
            put_conv(f"{mine}.conv_mask.0.bottleneck.0", (mine, "psp", "bottleneck_conv"), sn=False)
            put_bn(f"{mine}.conv_mask.0.bottleneck.1", (mine, "psp", "bottleneck_bn"))
            put_conv(f"{mine}.conv_mask.1", (mine, "conv_mask"), sn=False)
        i += 1

    k = 1
    while (f"alpha{k}",) in p:
        sd[f"alpha{k}"] = p[(f"alpha{k}",)].reshape(1, -1, 1)
        k += 1

    put_bn("final.0", ("final_bn",))
    put_conv("final.2", ("final_conv",), sn=True)

    put_linear("mask_regress.fc", ("mask_regress", "fc"), sn=True)
    for t_name, name in (("conv1.0", "conv1"), ("conv2.0", "conv2"),
                         ("conv3.0", "conv3a"), ("conv3.3", "conv3b")):
        put_conv(f"mask_regress.{t_name}", ("mask_regress", name), sn=True)
    for t_name, name in (("conv1.1", "bn1"), ("conv2.1", "bn2"), ("conv3.1", "bn3")):
        if ("mask_regress", name, "mean") in _flatten(variables["batch_stats"]):
            put_bn(f"mask_regress.{t_name}", ("mask_regress", name))
    return sd


@pytest.mark.parametrize("preset", ["ours_d_context128", "lostgan128", "graph128"])
def test_torch_roundtrip(rng, preset):
    gen = make_generator(preset, 10, ch=4, num_mask_classes=10)
    b, o = 2, 4
    z = jnp.asarray(rng.standard_normal((b, o, 128)).astype(np.float32))
    boxes = jnp.asarray((rng.random((b, o, 4)) * 0.5 + 0.1).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, 10, (b, o)).astype(np.int32))
    z_im = jnp.asarray(rng.standard_normal((b, 128)).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), z, boxes, labels, z_im)

    sd = _export_torch_sd(variables, preset)
    # simulate DataParallel prefix like real checkpoints
    sd = {"module." + k: v for k, v in sd.items()}
    imported = import_lostgan_generator(sd)

    want = _flatten({k: dict(variables[k]) for k in ("params", "batch_stats", "spectral")})
    got = _flatten(imported)
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    assert not missing, sorted(missing)[:5]
    assert not extra, sorted(extra)[:5]
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-7, err_msg=str(k))

    # imported variables actually run
    out = gen.apply(imported, z, boxes, labels, z_im, train=False, update_stats=False)
    assert out.shape == (b, 128, 128, 3)
