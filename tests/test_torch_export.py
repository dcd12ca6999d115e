"""Tests for utils/torch_export.py — the flax -> reference-.pth direction.

Fast tier: export -> import round-trips must reproduce the variable trees
exactly (the mappings are pure transposes/reshapes, so equality is bitwise).

Slow tier (needs /root/reference + torch): state_dicts exported from OUR
randomly-initialized models load into the ACTUAL reference torch models with
``strict=True`` and produce matching eval-mode forwards — proving a model
trained here can be handed back to the reference code (its load workflow:
``test_app.py:49-64``).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layout2img_tpu.models.discriminators import LayoutDiscriminator
from layout2img_tpu.models.generators import BgFgGenerator, make_generator
from layout2img_tpu.utils.torch_export import (
    export_bgfg_generator,
    export_lostgan_discriminator,
    export_lostgan_generator,
)
from layout2img_tpu.utils.torch_import import (
    import_bgfg_generator,
    import_lostgan_discriminator,
    import_lostgan_generator,
)

REF = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")), reason="reference repo not available"
)


def _layout(rng, b=2, o=4, num_classes=10):
    z = rng.standard_normal((b, o, 128)).astype(np.float32)
    xy = rng.random((b, o, 2)).astype(np.float32) * 0.5
    wh = rng.random((b, o, 2)).astype(np.float32) * 0.45 + 0.05
    boxes = np.concatenate([xy, wh], -1)
    labels = rng.integers(1, num_classes, (b, o)).astype(np.int32)
    labels[:, -1] = 0
    boxes[:, -1] = [-0.6, -0.6, 0.5, 0.5]
    z_im = rng.standard_normal((b, 128)).astype(np.float32)
    return jnp.asarray(z), jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(z_im)


def _assert_trees_equal(got: dict, want: dict) -> None:
    got_flat = dict(jax.tree_util.tree_flatten_with_path(got)[0])
    want_flat = dict(jax.tree_util.tree_flatten_with_path(want)[0])
    assert set(got_flat) == set(want_flat), (
        sorted(set(want_flat) - set(got_flat))[:5],
        sorted(set(got_flat) - set(want_flat))[:5],
    )
    for k, v in want_flat.items():
        np.testing.assert_array_equal(np.asarray(got_flat[k]), np.asarray(v), err_msg=str(k))


@pytest.mark.parametrize(
    "preset,res_start",
    [("ours_d_context128", 1), ("graph128", 1), ("lostgan128", 1)],
)
def test_generator_export_roundtrip(rng, preset, res_start):
    gen = make_generator(preset, 10, ch=4, num_mask_classes=10)
    z, boxes, labels, z_im = _layout(rng)
    variables = gen.init(jax.random.PRNGKey(0), z, boxes, labels, z_im)
    sd = export_lostgan_generator(variables, res_start=res_start)
    back = import_lostgan_generator(sd)
    _assert_trees_equal(back, {k: variables.get(k, {}) for k in ("params", "batch_stats", "spectral")})


def test_discriminator_export_roundtrip(rng):
    disc = LayoutDiscriminator(num_classes=10, image_size=128, app_head=True, ch=4)
    z, boxes, labels, _ = _layout(rng)
    images = jnp.asarray(rng.standard_normal((2, 128, 128, 3)).astype(np.float32))
    variables = disc.init(jax.random.PRNGKey(0), images, boxes, labels)
    sd = export_lostgan_discriminator(variables)
    back = import_lostgan_discriminator(sd)
    _assert_trees_equal(back, {k: variables.get(k, {}) for k in ("params", "batch_stats", "spectral")})


def test_bgfg_export_roundtrip(rng):
    b, o = 2, 4
    gen = BgFgGenerator(num_fg_classes=5, num_bg_classes=6, ch=4)
    z_f, bx_f, y_f, zi_f = _layout(rng, b, o, 5)
    z_b, bx_b, y_b, zi_b = _layout(rng, b, o, 6)
    variables = gen.init(
        jax.random.PRNGKey(0), z_f, bx_f, y_f, z_b, bx_b, y_b, zi_f, zi_b
    )
    sd = export_bgfg_generator(variables)
    back = import_bgfg_generator(sd)
    _assert_trees_equal(back, {k: variables.get(k, {}) for k in ("params", "batch_stats", "spectral")})


# ---------------------------------------------------------------------------
# reverse parity: exported dicts drive the ACTUAL reference torch models
# ---------------------------------------------------------------------------


def _torch_sd(sd):
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}


@pytest.mark.slow
@needs_reference
@pytest.mark.parametrize(
    "preset,ref_module,ref_class",
    [
        ("ours_d_context128", "model.resnet_generator_app_v2", "ResnetGenerator128_context"),
        ("lostgan128", "model.resnet_generator_v1", "ResnetGenerator128"),
    ],
)
def test_reverse_parity_generator(reference_modules, rng, preset, ref_module, ref_class):
    torch, _ = reference_modules
    import importlib

    net = getattr(importlib.import_module(ref_module), ref_class)(num_classes=10)

    gen = make_generator(preset, 10, legacy_attention=True)
    z, boxes, labels, z_im = _layout(rng, b=2, o=8)
    variables = gen.init(jax.random.PRNGKey(0), z, boxes, labels, z_im)
    ours = gen.apply(variables, z, boxes, labels, z_im, train=False, update_stats=False)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)

    sd = export_lostgan_generator(variables)
    net.load_state_dict(_torch_sd(sd), strict=True)
    net.eval()
    with torch.no_grad():
        want = net(
            torch.from_numpy(np.asarray(z)),
            torch.from_numpy(np.asarray(boxes).copy()),
            torch.from_numpy(np.asarray(z_im)),
            torch.from_numpy(np.asarray(labels).astype(np.int64)),
        ).numpy()
    diff = np.abs(ours - want)
    assert diff.max() < 2e-3, (diff.max(), diff.mean())


@pytest.mark.slow
@needs_reference
def test_reverse_parity_discriminator(reference_disc_module, rng):
    torch, mod = reference_disc_module
    num_classes, b, o = 10, 2, 6
    images = rng.standard_normal((b, 3, 128, 128)).astype(np.float32)
    xy = rng.random((b, o, 2)).astype(np.float32) * 0.4
    wh = np.concatenate(
        [rng.random((b, o // 2, 2)) * 0.3 + 0.05, rng.random((b, o - o // 2, 2)) * 0.3 + 0.55],
        axis=1,
    ).astype(np.float32)
    boxes = np.concatenate([xy, wh], -1)
    labels = rng.integers(1, num_classes, (b, o))
    labels[:, -1] = 0
    boxes[:, -1] = (-0.6, -0.6, 0.5, 0.5)

    disc = LayoutDiscriminator(num_classes=num_classes, image_size=128, app_head=True)
    variables = disc.init(
        jax.random.PRNGKey(0),
        jnp.asarray(images.transpose(0, 2, 3, 1)),
        jnp.asarray(boxes),
        jnp.asarray(labels.astype(np.int32)),
    )
    out = disc.apply(
        variables, jnp.asarray(images.transpose(0, 2, 3, 1)), jnp.asarray(boxes),
        jnp.asarray(labels.astype(np.int32)), update_stats=False,
    )

    net = mod.CombineDiscriminator128_app(num_classes=num_classes)
    net.load_state_dict(_torch_sd(export_lostgan_discriminator(variables, prefix="obD.")),
                        strict=True)
    net.eval()
    with torch.no_grad():
        d_img, d_obj, d_app = net(
            torch.from_numpy(images), torch.from_numpy(boxes.copy()),
            torch.from_numpy(labels),
        )

    np.testing.assert_allclose(
        np.asarray(out["image"])[:, 0], d_img.numpy()[:, 0], rtol=1e-3, atol=2e-2
    )
    # rebuild the reference's [valid, large-first] object ordering
    # (rcnn_discriminator_app.py:131-146) to index our (b, o) slot outputs
    s_thresh = 64.0
    flat = [(i, j) for i in range(b) for j in range(o) if labels[i, j] != 0]
    is_small = [
        (boxes[i, j, 2] * 128 < s_thresh and boxes[i, j, 3] * 128 < s_thresh)
        for (i, j) in flat
    ]
    ref_order = [p for p, s in zip(flat, is_small) if not s] + [
        p for p, s in zip(flat, is_small) if s
    ]
    ours_obj = np.asarray(out["object"])
    ours_app = np.asarray(out["app"])
    want_obj = d_obj.numpy()[:, 0]
    want_app = d_app.numpy()[:, 0]
    assert len(ref_order) == want_obj.shape[0]
    for k, (i, j) in enumerate(ref_order):
        np.testing.assert_allclose(ours_obj[i, j], want_obj[k], rtol=1e-3, atol=2e-2)
        np.testing.assert_allclose(ours_app[i, j], want_app[k], rtol=1e-3, atol=2e-2)


@pytest.mark.slow
@needs_reference
def test_reverse_parity_bgfg(reference_modules, rng):
    torch, _ = reference_modules
    import importlib

    m = importlib.import_module("model.resnet_generator_v1")
    net = m.background_foreground_generator(background_cla=6, foreground_cla=5)

    b, o = 2, 4
    gen = BgFgGenerator(num_fg_classes=5, num_bg_classes=6)
    z_f, bx_f, y_f, zi_f = _layout(rng, b, o, 5)
    z_b, bx_b, y_b, zi_b = _layout(rng, b, o, 6)
    variables = gen.init(
        jax.random.PRNGKey(0), z_f, bx_f, y_f, z_b, bx_b, y_b, zi_f, zi_b
    )
    ours = gen.apply(
        variables, z_f, bx_f, y_f, z_b, bx_b, y_b, zi_f, zi_b,
        train=False, update_stats=False,
    )
    ours = np.asarray(ours).transpose(0, 3, 1, 2)

    net.load_state_dict(_torch_sd(export_bgfg_generator(variables)), strict=True)
    net.eval()
    t = lambda x: torch.from_numpy(np.asarray(x))
    with torch.no_grad():
        bg = net.background_g(t(z_b), t(np.asarray(bx_b).copy()), z_im=t(zi_b),
                              y=t(np.asarray(y_b).astype(np.int64)))
        fg = net.foreground_g(t(z_f), t(np.asarray(bx_f).copy()), z_im=t(zi_f),
                              y=t(np.asarray(y_f).astype(np.int64)))
        want = net.final(net.combination(torch.cat([bg, fg], 1))).numpy()
    diff = np.abs(ours - want)
    assert diff.max() < 2e-3, (diff.max(), diff.mean())


@pytest.mark.slow
def test_export_torch_cli_roundtrip(tmp_path, rng):
    """cli.export_torch end-to-end: orbax ckpt -> .pth -> re-import matches
    the trained state (G via EMA preference rules, D with the obD. prefix)."""
    import torch

    from layout2img_tpu.cli import export_torch
    from layout2img_tpu.cli.presets import EXPERIMENTS
    from layout2img_tpu.data.synthetic import SyntheticLayoutDataset
    from layout2img_tpu.models.discriminators import make_discriminator
    from layout2img_tpu.train.checkpoint import CheckpointManager
    from layout2img_tpu.train.state import TrainConfig, create_train_state

    exp = EXPERIMENTS["context_app_v2"]
    example = next(iter(SyntheticLayoutDataset(2, 128, 8, seed=0, steps=1)))
    gen = make_generator(exp.gen_preset, 184, ch=4)
    disc = make_discriminator(exp.disc_preset, 184, ch=4)
    cfg = TrainConfig(use_vgg_loss=False)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, example, cfg)
    CheckpointManager(str(tmp_path / "ckpt")).save(state, step=0)

    out_g = str(tmp_path / "G.pth")
    out_d = str(tmp_path / "D.pth")
    export_torch.main([
        "--model", "context_app_v2", "--dataset", "synthetic", "--ch", "4",
        "--ckpt_dir", str(tmp_path / "ckpt"), "--out_g", out_g, "--out_d", out_d,
    ])

    back_g = import_lostgan_generator(torch.load(out_g))
    _assert_trees_equal(back_g, {"params": state.g_params, **state.g_state})
    back_d = import_lostgan_discriminator(torch.load(out_d))
    _assert_trees_equal(back_d, {"params": state.d_params,
                                 "batch_stats": {}, **state.d_state})
