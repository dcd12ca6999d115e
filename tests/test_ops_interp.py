"""Golden tests: separable-matmul interpolation vs torch reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from layout2img_tpu.ops import interp


@pytest.mark.parametrize("in_hw,out_hw", [((4, 4), (8, 8)), ((16, 16), (8, 8)), ((16, 16), (13, 7)), ((5, 9), (11, 3))])
@pytest.mark.parametrize("align_corners", [False, True])
def test_resize_bilinear_matches_torch(rng, in_hw, out_hw, align_corners):
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=align_corners).numpy()
    got = np.asarray(interp.resize_bilinear(jnp.asarray(x), out_hw, align_corners=align_corners))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((64, 64), (16, 16)), ((64, 64), (128, 128)), ((7, 5), (13, 9))])
def test_resize_nearest_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="nearest").numpy()
    got = np.asarray(interp.resize_nearest(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_resize_nhwc_matches_nchw(rng):
    x = rng.standard_normal((2, 6, 5, 3)).astype(np.float32)
    a = np.asarray(interp.resize_bilinear_nhwc(jnp.asarray(x), (11, 9)))
    b = np.asarray(interp.resize_bilinear(jnp.asarray(x.transpose(0, 3, 1, 2)), (11, 9)))
    np.testing.assert_allclose(a.transpose(0, 3, 1, 2), b, rtol=1e-6, atol=1e-6)
    an = np.asarray(interp.resize_nearest_nhwc(jnp.asarray(x), (11, 9)))
    bn = np.asarray(interp.resize_nearest(jnp.asarray(x.transpose(0, 3, 1, 2)), (11, 9)))
    np.testing.assert_allclose(an.transpose(0, 3, 1, 2), bn)


def _torch_masks_to_layout(boxes, masks, H, W):
    """Reference utils/bilinear.py:137-192 re-derived in torch (CPU)."""
    b, o, m, _ = masks.shape
    boxes = torch.from_numpy(boxes).view(b * o, 4, 1, 1)
    x0, y0 = boxes[:, 0], boxes[:, 1]
    ww, hh = boxes[:, 2], boxes[:, 3]
    X = torch.linspace(0, 1, steps=W).view(1, 1, W)
    Y = torch.linspace(0, 1, steps=H).view(1, H, 1)
    X = ((X - x0) / ww).expand(b * o, H, W)
    Y = ((Y - y0) / hh).expand(b * o, H, W)
    grid = torch.stack([X, Y], dim=3) * 2 - 1
    img = torch.from_numpy(masks).view(b * o, 1, m, m)
    out = F.grid_sample(img, grid, mode="bilinear", padding_mode="zeros", align_corners=False)
    return out.view(b, o, H, W).numpy()


@pytest.mark.parametrize("hw", [64, 37])
def test_masks_to_layout_matches_grid_sample(rng, hw):
    b, o, m = 2, 4, 16
    masks = rng.random((b, o, m, m)).astype(np.float32)
    xy = rng.random((b, o, 2)).astype(np.float32) * 0.7
    wh = rng.random((b, o, 2)).astype(np.float32) * 0.5 + 0.05
    boxes = np.concatenate([xy, wh], axis=-1)
    # include the reference padding box (-0.6, -0.6, 0.5, 0.5)
    boxes[:, -1] = [-0.6, -0.6, 0.5, 0.5]
    want = _torch_masks_to_layout(boxes, masks, hw, hw)
    got = np.asarray(interp.masks_to_layout(jnp.asarray(boxes), jnp.asarray(masks), hw, hw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_masks_to_layout_pad_box_is_zero(rng):
    """The reference pad box lies outside the canvas => zero contribution."""
    masks = np.ones((1, 1, 16, 16), dtype=np.float32)
    boxes = np.array([[[-0.6, -0.6, 0.5, 0.5]]], dtype=np.float32)
    got = np.asarray(interp.masks_to_layout(jnp.asarray(boxes), jnp.asarray(masks), 64))
    assert np.abs(got).max() == 0.0


def test_masks_to_layout_degenerate_box_no_nan(rng):
    masks = np.ones((1, 2, 16, 16), dtype=np.float32)
    boxes = np.array([[[0.2, 0.2, 0.0, 0.0], [0.1, 0.1, 0.5, 0.5]]], dtype=np.float32)
    got = np.asarray(interp.masks_to_layout(jnp.asarray(boxes), jnp.asarray(masks), 32))
    assert np.isfinite(got).all()
