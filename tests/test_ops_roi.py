"""Golden tests for roi_align (vs a numpy re-derivation of torchvision's
documented algorithm with aligned=False, fixed sampling_ratio) and bbox ops."""

import numpy as np
import pytest

import jax.numpy as jnp

import layout2img_tpu.ops.bbox as bbox_ops
import layout2img_tpu.ops.roi as roi_ops


def _np_roi_align(feat_nchw, rois, out_size, scale, sr):
    """torchvision roi_align (aligned=False) in slow numpy. rois: (n, 5)."""
    n = rois.shape[0]
    _, c, h, w = feat_nchw.shape
    out = np.zeros((n, c, out_size, out_size), dtype=np.float64)

    def tap(fm, y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c)
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y_lo, x_lo = int(np.floor(y)), int(np.floor(x))
        y_hi, x_hi = min(y_lo + 1, h - 1), min(x_lo + 1, w - 1)
        ly, lx = y - y_lo, x - x_lo
        return (
            fm[:, y_lo, x_lo] * (1 - ly) * (1 - lx)
            + fm[:, y_lo, x_hi] * (1 - ly) * lx
            + fm[:, y_hi, x_lo] * ly * (1 - lx)
            + fm[:, y_hi, x_hi] * ly * lx
        )

    for i in range(n):
        idx = int(rois[i, 0])
        x0, y0, x1, y1 = rois[i, 1:] * scale
        rw = max(x1 - x0, 1.0)
        rh = max(y1 - y0, 1.0)
        bw, bh = rw / out_size, rh / out_size
        # sr=0: torchvision's adaptive grid, ceil(bin_size) taps per bin
        gx = sr if sr > 0 else int(np.ceil(bw))
        gy = sr if sr > 0 else int(np.ceil(bh))
        gx, gy = max(gx, 1), max(gy, 1)
        for by in range(out_size):
            for bx in range(out_size):
                acc = np.zeros(c)
                for py in range(gy):
                    for px in range(gx):
                        yy = y0 + (by + (py + 0.5) / gy) * bh
                        xx = x0 + (bx + (px + 0.5) / gx) * bw
                        acc += tap(feat_nchw[idx], yy, xx)
                out[i, :, by, bx] = acc / (gy * gx)
    return out


@pytest.mark.parametrize("scale", [0.25, 0.125])
@pytest.mark.parametrize("sr", [0, 2])
def test_roi_align_matches_torchvision_algorithm(rng, scale, sr):
    b, o, h, w, c = 2, 3, 32, 32, 5
    feat = rng.standard_normal((b, h, w, c)).astype(np.float32)
    xy = rng.random((b, o, 2)).astype(np.float32) * 100
    wh = rng.random((b, o, 2)).astype(np.float32) * 60 + 2
    boxes = np.concatenate([xy, xy + wh], axis=-1)  # xyxy in 128px image coords

    got = np.asarray(roi_ops.roi_align(jnp.asarray(feat), jnp.asarray(boxes), 8, scale, sampling_ratio=sr))

    rois = np.concatenate(
        [np.repeat(np.arange(b), o)[:, None], boxes.reshape(-1, 4)], axis=1
    )
    want = _np_roi_align(feat.transpose(0, 3, 1, 2), rois, 8, scale, sr)
    want = want.reshape(b, o, c, 8, 8).transpose(0, 1, 3, 4, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_adaptive_full_image_box(rng):
    """A ROI spanning the whole fm hits the static tap bound (4 taps/bin
    on a 32px map) — the exact case the bound is sized for."""
    feat = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    boxes = np.array([[[0.0, 0.0, 128.0, 128.0]]], dtype=np.float32)
    got = np.asarray(roi_ops.roi_align(jnp.asarray(feat), jnp.asarray(boxes), 8, 0.25, 0))
    rois = np.array([[0.0, 0.0, 0.0, 128.0, 128.0]])
    want = _np_roi_align(feat.transpose(0, 3, 1, 2), rois, 8, 0.25, 0)
    want = want.reshape(1, 1, 3, 8, 8).transpose(0, 1, 3, 4, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dual_scale_routing(rng):
    b, o = 1, 4
    feat_s = rng.standard_normal((b, 32, 32, 4)).astype(np.float32)
    feat_l = rng.standard_normal((b, 16, 16, 4)).astype(np.float32)
    # two small boxes (<64px), two large
    boxes = np.array(
        [[[0, 0, 20, 20], [5, 5, 60, 50], [0, 0, 100, 30], [10, 10, 90, 90]]],
        dtype=np.float32,
    )
    got = np.asarray(
        roi_ops.dual_scale_roi_align(
            jnp.asarray(feat_s), jnp.asarray(feat_l), jnp.asarray(boxes), 8, 0.25, 0.125, 64.0
        )
    )
    small = np.asarray(roi_ops.roi_align(jnp.asarray(feat_s), jnp.asarray(boxes), 8, 0.25))
    large = np.asarray(roi_ops.roi_align(jnp.asarray(feat_l), jnp.asarray(boxes), 8, 0.125))
    np.testing.assert_allclose(got[0, 0], small[0, 0])
    np.testing.assert_allclose(got[0, 1], small[0, 1])
    np.testing.assert_allclose(got[0, 2], large[0, 2])
    np.testing.assert_allclose(got[0, 3], large[0, 3])


def test_bbox_mask_golden():
    # box covering x in [0.25, 0.75], y in [0.5, 1.0] on an 8x8 linspace grid
    boxes = np.array([[[0.25, 0.5, 0.5, 0.5]]], dtype=np.float32)
    got = np.asarray(bbox_ops.bbox_mask(jnp.asarray(boxes), 8, 8))[0, 0]
    lin = np.linspace(0, 1, 8)
    in_x = (lin >= 0.25) & (lin <= 0.75)
    in_y = (lin >= 0.5) & (lin <= 1.0)
    want = (in_y[:, None] & in_x[None, :]).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_bbox_mask_matches_reference_formula(rng):
    """Vectorized check against the reference's out-mask formula."""
    b, o, hw = 2, 5, 16
    xy = rng.random((b, o, 2)).astype(np.float32)
    wh = rng.random((b, o, 2)).astype(np.float32) * 0.8 + 0.01
    boxes = np.concatenate([xy, wh], -1)
    got = np.asarray(bbox_ops.bbox_mask(jnp.asarray(boxes), hw, hw))
    lin = np.linspace(0, 1, hw, dtype=np.float32)
    X = (lin[None, None, :] - boxes[..., 0:1]) / boxes[..., 2:3]
    Y = (lin[None, None, :] - boxes[..., 1:2]) / boxes[..., 3:4]
    x_out = (X < 0) | (X > 1)
    y_out = (Y < 0) | (Y > 1)
    want = 1 - np.clip(x_out[:, :, None, :] + y_out[:, :, :, None], None, 1).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_xywh_to_xyxy():
    boxes = jnp.asarray([[[0.1, 0.2, 0.3, 0.4]]])
    got = np.asarray(bbox_ops.xywh_to_xyxy(boxes))
    np.testing.assert_allclose(got, [[[0.1, 0.2, 0.4, 0.6]]], rtol=1e-6)
