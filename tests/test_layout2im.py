"""layout2im CVAE-GAN family tests + crop_boxes golden vs torch grid_sample."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from layout2img_tpu.ops.interp import crop_boxes


def _torch_crop_bbox(feats_nchw, boxes_xywh, out):
    """Reference model_layout2img/bilinear.py:26-99 semantics, re-derived."""
    n = feats_nchw.shape[0]
    x0 = 2 * boxes_xywh[:, 0] - 1
    y0 = 2 * boxes_xywh[:, 1] - 1
    x1 = 2 * (boxes_xywh[:, 2] + boxes_xywh[:, 0]) - 1
    y1 = 2 * (boxes_xywh[:, 3] + boxes_xywh[:, 1]) - 1
    t = torch.linspace(0, 1, out)
    X = x0[:, None] + (x1 - x0)[:, None] * t[None, :]  # (n, out)
    Y = y0[:, None] + (y1 - y0)[:, None] * t[None, :]
    grid = torch.stack(
        [X[:, None, :].expand(n, out, out), Y[:, :, None].expand(n, out, out)], dim=3
    )
    return F.grid_sample(feats_nchw, grid, mode="bilinear", padding_mode="zeros",
                         align_corners=False)


def test_crop_boxes_matches_grid_sample(rng):
    b, o, s, c, out = 2, 3, 64, 5, 32
    imgs = rng.standard_normal((b, s, s, c)).astype(np.float32)
    xy = rng.random((b, o, 2)).astype(np.float32) * 0.5
    wh = rng.random((b, o, 2)).astype(np.float32) * 0.45 + 0.05
    boxes = np.concatenate([xy, wh], -1)

    got = np.asarray(crop_boxes(jnp.asarray(imgs), jnp.asarray(boxes), out))

    t_img = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
    for bi in range(b):
        want = _torch_crop_bbox(
            t_img[bi : bi + 1].expand(o, c, s, s), torch.from_numpy(boxes[bi]), out
        ).numpy()
        np.testing.assert_allclose(
            got[bi].transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5
        )


def _inputs(rng, b=2, o=4, num_classes=10, z_dim=8):
    from layout2img_tpu.ops.bbox import bbox_mask

    images = rng.uniform(-1, 1, (b, 64, 64, 3)).astype(np.float32)
    labels = rng.integers(1, num_classes, (b, o)).astype(np.int32)
    labels[:, -1] = 0
    xy = rng.random((b, o, 2)).astype(np.float32) * 0.5
    wh = rng.random((b, o, 2)).astype(np.float32) * 0.4 + 0.1
    boxes = np.concatenate([xy, wh], -1)
    masks = np.asarray(bbox_mask(jnp.asarray(boxes), 64, 64))
    z_rand = rng.standard_normal((b, o, z_dim)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (images, labels, boxes, masks, z_rand))


def test_layout2im_generator_outputs(rng):
    from layout2img_tpu.models.layout2im import Layout2ImGenerator

    b, o, zd = 2, 4, 8
    gen = Layout2ImGenerator(num_classes=10)
    images, labels, boxes, masks, z_rand = _inputs(rng, b, o, 10, zd)
    variables = gen.init(
        jax.random.PRNGKey(0), images, labels, boxes, masks, z_rand, jax.random.PRNGKey(1)
    )
    out, _ = gen.apply(
        variables, images, labels, boxes, masks, z_rand, jax.random.PRNGKey(1),
        mutable=["batch_stats"],
    )
    assert out["img_rec"].shape == (b, 64, 64, 3)
    assert out["img_rand"].shape == (b, 64, 64, 3)
    assert out["crops_input"].shape == (b, o, 32, 32, 3)
    assert out["mu"].shape == (b, o, zd)
    assert out["z_rand_rec"].shape == (b, o, zd)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_layout2im_discriminators(rng):
    from layout2img_tpu.models.layout2im import (
        Layout2ImImageDiscriminator,
        Layout2ImObjectDiscriminator,
    )
    from layout2img_tpu.ops.interp import crop_boxes as cb

    b, o = 2, 4
    images, labels, boxes, masks, _ = _inputs(rng, b, o)
    d_img = Layout2ImImageDiscriminator(conv_dim=8)
    v = d_img.init(jax.random.PRNGKey(0), images)
    out, _ = d_img.apply(v, images, mutable=["spectral"])
    assert out.shape == (b,)

    crops = cb(images, boxes, 32)
    d_obj = Layout2ImObjectDiscriminator(num_classes=10, conv_dim=8)
    v = d_obj.init(jax.random.PRNGKey(0), crops, labels)
    out, _ = d_obj.apply(v, crops, labels, mutable=["spectral"])
    assert out["object"].shape == (b, o)
    assert out["class_logits"].shape == (b, o, 10)
    assert out["app"].shape == (b, o)


def test_masked_bn_ignores_pad_slots(rng):
    from layout2img_tpu.models.layout2im import MaskedBatchNorm

    n, h, w, c = 6, 4, 4, 3
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    mask = np.array([1, 1, 1, 1, 0, 0], np.float32)
    mod = MaskedBatchNorm(affine=False)
    y_all, _ = mod.apply(
        {"batch_stats": {"mean": jnp.zeros(c), "var": jnp.ones(c)}},
        jnp.asarray(x), jnp.asarray(mask), mutable=["batch_stats"],
    )
    # stats must equal plain BN over the valid prefix only
    y_valid, _ = mod.apply(
        {"batch_stats": {"mean": jnp.zeros(c), "var": jnp.ones(c)}},
        jnp.asarray(x[:4]), None, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(y_all)[:4], np.asarray(y_valid), rtol=1e-5, atol=1e-6)


def test_transformer_decoder_shapes(rng):
    from layout2img_tpu.models.layout2im import TransformerDecoder

    x = jnp.asarray(rng.standard_normal((2, 5, 192)).astype(np.float32))
    mod = TransformerDecoder()
    v = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(v, x)
    assert out.shape == (2, 64, 192)
    assert "query" in v["params"]  # learned query is a real parameter


def test_layout2im_sample_method(rng):
    from layout2img_tpu.models.layout2im import Layout2ImGenerator

    b, o, zd = 1, 3, 8
    images, labels, boxes, masks, z_rand = _inputs(rng, b, o, 10, zd)
    gen = Layout2ImGenerator(num_classes=10)
    variables = gen.init(
        jax.random.PRNGKey(0), images, labels, boxes, masks, z_rand, jax.random.PRNGKey(1)
    )
    img = gen.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        labels, boxes, masks, z_rand, method=Layout2ImGenerator.sample,
    )
    assert img.shape == (b, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_layout2im_decoder_fusion_variant(rng):
    """generator1-style fusion: the learned-query TransformerDecoder refines
    the composed map (generator1.py:561,579-580)."""
    from layout2img_tpu.models.layout2im import Layout2ImGenerator

    b, o, zd = 2, 4, 8
    gen = Layout2ImGenerator(num_classes=10, fusion="transformer_decoder")
    images, labels, boxes, masks, z_rand = _inputs(rng, b, o, 10, zd)
    variables = gen.init(
        jax.random.PRNGKey(0), images, labels, boxes, masks, z_rand, jax.random.PRNGKey(1)
    )
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    assert any("transformer_decoder" in jax.tree_util.keystr(kp) for kp, _ in flat)
    out, _ = gen.apply(
        variables, images, labels, boxes, masks, z_rand, jax.random.PRNGKey(1),
        mutable=["batch_stats"],
    )
    assert out["img_rec"].shape == (b, 64, 64, 3)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_layout2im_noctx_fusion_variant(rng):
    """generator2-style fusion: the same spatial transformer refinement but
    NO object-level context attention before the mask broadcast
    (generator2.py:446-525 — its LayoutEncoder has no `self.context`)."""
    from layout2img_tpu.models.layout2im import Layout2ImGenerator

    b, o, zd = 2, 4, 8
    gen = Layout2ImGenerator(num_classes=10, fusion="transformer_noctx")
    images, labels, boxes, masks, z_rand = _inputs(rng, b, o, 10, zd)
    variables = gen.init(
        jax.random.PRNGKey(0), images, labels, boxes, masks, z_rand, jax.random.PRNGKey(1)
    )
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    keys = [jax.tree_util.keystr(kp) for kp, _ in flat]
    assert not any("context" in k for k in keys)  # generator2 drops it
    assert any("transformer_encoder" in k for k in keys)  # refinement kept
    out, _ = gen.apply(
        variables, images, labels, boxes, masks, z_rand, jax.random.PRNGKey(1),
        mutable=["batch_stats"],
    )
    assert out["img_rec"].shape == (b, 64, 64, 3)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
