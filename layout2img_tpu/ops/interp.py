"""Separable bilinear interpolation as MXU matmuls.

Semantics match the torch ops the reference relies on:

- ``resize_bilinear`` == ``F.interpolate(x, mode='bilinear')`` with
  ``align_corners`` False (default) or True (PSP module,
  reference ``model/resnet_generator_app_v2.py:750``).
- ``resize_nearest`` == ``F.interpolate(x, mode='nearest')``.
- ``masks_to_layout`` == reference ``utils/bilinear.py:137-158``
  (``_boxes_to_grid`` + ``F.grid_sample(mode='bilinear',
  padding_mode='zeros', align_corners=False)``).

Design: a 1-D bilinear resample is a sparse (2 taps/row) matrix. For
*static* sizes the matrix is a numpy compile-time constant; for *dynamic*
boxes it is built on device from two one-hot comparisons. The 2-D warp is
then ``W_y @ img @ W_x^T`` — batched matmuls that XLA tiles onto the MXU,
instead of the gather-heavy ``grid_sample`` lowering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Static resize matrices (compile-time numpy constants)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _resize_matrix_np(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    """(out, in) bilinear resize matrix matching torch F.interpolate."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros_like(dst)
        else:
            src = dst * (in_size - 1) / (out_size - 1)
    else:
        # torch clamps negative source coords to 0 (replicate edge).
        src = np.maximum((dst + 0.5) * in_size / out_size - 0.5, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = src - i0
    w0 = 1.0 - w1
    np.add.at(m, (np.arange(out_size), i0), w0)
    np.add.at(m, (np.arange(out_size), i1), w1)
    return m


@functools.lru_cache(maxsize=None)
def _nearest_index_np(out_size: int, in_size: int) -> np.ndarray:
    """torch 'nearest' source index: floor(dst * in / out)."""
    idx = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    return np.minimum(idx, in_size - 1).astype(np.int32)


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int], *, align_corners: bool = False) -> jax.Array:
    """Bilinear-resize the trailing-2 spatial dims `(..., H, W)` — torch semantics.

    Static-size resize: the interpolation matrices are compile-time
    constants, so this lowers to two constant-weight matmuls (MXU) rather
    than a gather.
    """
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    wy = jnp.asarray(_resize_matrix_np(h_out, h_in, align_corners), dtype=x.dtype)
    wx = jnp.asarray(_resize_matrix_np(w_out, w_in, align_corners), dtype=x.dtype)
    x = jnp.einsum("yh,...hw->...yw", wy, x)
    return jnp.einsum("xw,...hw->...hx", wx, x)


def resize_bilinear_nhwc(x: jax.Array, out_hw: tuple[int, int], *, align_corners: bool = False) -> jax.Array:
    """Bilinear resize for NHWC feature maps `(..., H, W, C)`."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    wy = jnp.asarray(_resize_matrix_np(h_out, h_in, align_corners), dtype=x.dtype)
    wx = jnp.asarray(_resize_matrix_np(w_out, w_in, align_corners), dtype=x.dtype)
    x = jnp.einsum("yh,...hwc->...ywc", wy, x)
    return jnp.einsum("xw,...hwc->...hxc", wx, x)


def resize_nearest(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest-resize trailing-2 spatial dims — torch 'nearest' semantics.

    Indices are static, so this is a constant-index gather XLA folds into a
    cheap reshape/slice pattern (for integer ratios it is a pure slice).
    """
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    iy = _nearest_index_np(h_out, h_in)
    ix = _nearest_index_np(w_out, w_in)
    return x[..., iy, :][..., ix]


def resize_nearest_nhwc(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest resize for NHWC feature maps `(..., H, W, C)`."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    iy = _nearest_index_np(h_out, h_in)
    ix = _nearest_index_np(w_out, w_in)
    return x[..., iy, :, :][..., ix, :]


@functools.lru_cache(maxsize=None)
def _adaptive_pool_matrix_np(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) averaging matrix matching torch AdaptiveAvgPool1d bins."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool2d(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """torch AdaptiveAvgPool2d on trailing-2 dims `(..., H, W)` as constant matmuls."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    py = jnp.asarray(_adaptive_pool_matrix_np(h_out, h_in), dtype=x.dtype)
    px = jnp.asarray(_adaptive_pool_matrix_np(w_out, w_in), dtype=x.dtype)
    x = jnp.einsum("yh,...hw->...yw", py, x)
    return jnp.einsum("xw,...hw->...hx", px, x)


def adaptive_avg_pool2d_nhwc(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """torch AdaptiveAvgPool2d for NHWC maps `(..., H, W, C)`."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    py = jnp.asarray(_adaptive_pool_matrix_np(h_out, h_in), dtype=x.dtype)
    px = jnp.asarray(_adaptive_pool_matrix_np(w_out, w_in), dtype=x.dtype)
    x = jnp.einsum("yh,...hwc->...ywc", py, x)
    return jnp.einsum("xw,...hwc->...hxc", px, x)


# ---------------------------------------------------------------------------
# Dynamic (box-dependent) sampling matrices
# ---------------------------------------------------------------------------


def sample_matrix_1d(src_pos: jax.Array, in_size: int) -> jax.Array:
    """Bilinear sampling matrix with zero padding (grid_sample semantics).

    Args:
      src_pos: (..., out) continuous source pixel coordinates. Taps falling
        outside [0, in_size) contribute zero — matching
        ``grid_sample(padding_mode='zeros')``.
      in_size: static input length.

    Returns:
      (..., out, in_size) weight matrix built from two one-hot comparisons —
      no gathers, fully static shape.
    """
    # Clamp to a harmless out-of-range band so floor() can't overflow int32
    # on degenerate boxes (w==0 => inf). Anything outside [-1, in_size]
    # already had zero weight, and NaN (0/0) compares false everywhere.
    src_pos = jnp.clip(src_pos, -2.0, in_size + 1.0)
    i0 = jnp.floor(src_pos)
    w1 = src_pos - i0  # weight of tap i0+1
    w0 = 1.0 - w1
    i0 = i0.astype(jnp.int32)
    cols = jnp.arange(in_size, dtype=jnp.int32)
    m0 = jnp.where(cols == i0[..., None], w0[..., None], 0.0)
    m1 = jnp.where(cols == i0[..., None] + 1, w1[..., None], 0.0)
    return m0 + m1


def masks_to_layout(boxes: jax.Array, masks: jax.Array, h: int, w: int | None = None) -> jax.Array:
    """Splat per-object masks into their box footprint on an (h, w) canvas.

    Matches reference ``utils/bilinear.py:137-158``: for output canvas pixel
    (i, j), the normalized grid coordinate inside the box is
    ``(linspace(0,1)[j] - x0) / bw``, mapped to mask pixel coordinates with
    grid_sample's align_corners=False convention, bilinear, zero padding.

    Args:
      boxes: (b, o, 4) [x0, y0, bw, bh] in [0, 1] canvas coordinates.
      masks: (b, o, m, m) object masks.
      h, w: output canvas size.

    Returns:
      (b, o, h, w) splatted layout.
    """
    if w is None:
        w = h
    m = masks.shape[-1]
    x0, y0, bw, bh = jnp.split(boxes, 4, axis=-1)  # each (b, o, 1)

    lin_x = jnp.linspace(0.0, 1.0, w)
    lin_y = jnp.linspace(0.0, 1.0, h)
    # normalized in-box coordinate in [0,1] -> [-1,1] -> source mask pixels
    gx = 2.0 * (lin_x - x0) / bw - 1.0  # (b, o, w)
    gy = 2.0 * (lin_y - y0) / bh - 1.0  # (b, o, h)
    sx = ((gx + 1.0) * m - 1.0) / 2.0
    sy = ((gy + 1.0) * m - 1.0) / 2.0

    # coordinates/weights in f32 (bf16 positions would be ~0.5px off at 128);
    # cast the finished matrices to the payload dtype so a bf16 pipeline
    # stays bf16 through the matmuls
    wx = sample_matrix_1d(sx, m).astype(masks.dtype)  # (b, o, w, m)
    wy = sample_matrix_1d(sy, m).astype(masks.dtype)  # (b, o, h, m)
    out = jnp.einsum("bohm,bomn->bohn", wy, masks)
    return jnp.einsum("bown,bohn->bohw", wx, out)


def paste_boxes(crops: jax.Array, boxes: jax.Array, h: int, w: int | None = None) -> jax.Array:
    """Inverse of ``crop_boxes``: splat per-object crops into their box
    footprint on an (h, w) canvas, zero outside (multi-channel
    ``masks_to_layout``; reference ``model_layout2img/bilinear.py:133-186``
    ``uncrop_bbox``).

    Args:
      crops: (b, o, m, m, c).
      boxes: (b, o, 4) xywh in [0, 1].

    Returns:
      (b, o, h, w, c) per-object canvases.
    """
    if w is None:
        w = h
    m = crops.shape[2]
    x0, y0, bw, bh = jnp.split(boxes, 4, axis=-1)
    lin_x = jnp.linspace(0.0, 1.0, w)
    lin_y = jnp.linspace(0.0, 1.0, h)
    gx = 2.0 * (lin_x - x0) / bw - 1.0
    gy = 2.0 * (lin_y - y0) / bh - 1.0
    sx = ((gx + 1.0) * m - 1.0) / 2.0
    sy = ((gy + 1.0) * m - 1.0) / 2.0
    wx = sample_matrix_1d(sx, m).astype(crops.dtype)  # (b, o, w, m)
    wy = sample_matrix_1d(sy, m).astype(crops.dtype)  # (b, o, h, m)
    rows = jnp.einsum("bohm,bomnc->bohnc", wy, crops)
    return jnp.einsum("bown,bohnc->bohwc", wx, rows)


def crop_boxes(images: jax.Array, boxes: jax.Array, out_size: int) -> jax.Array:
    """Differentiable crop of each object's box, resized to (out, out).

    Matches reference ``model_layout2img/bilinear.py:26-99``
    (``crop_bbox_batch``): the sampling grid spans linspace over the box
    extent inclusive of endpoints, through grid_sample's align_corners=False
    mapping with zero padding. The inverse op of ``masks_to_layout``.

    Args:
      images: (b, h, w, c) NHWC.
      boxes: (b, o, 4) [x0, y0, bw, bh] in [0, 1].

    Returns:
      (b, o, out, out, c) crops.
    """
    h, w = images.shape[1], images.shape[2]
    x0, y0, bw, bh = jnp.split(boxes, 4, axis=-1)  # (b, o, 1)

    lin = jnp.linspace(0.0, 1.0, out_size)  # inclusive endpoints
    gx = 2.0 * (x0 + lin * bw) - 1.0  # (b, o, out)
    gy = 2.0 * (y0 + lin * bh) - 1.0
    sx = ((gx + 1.0) * w - 1.0) / 2.0
    sy = ((gy + 1.0) * h - 1.0) / 2.0

    wx = sample_matrix_1d(sx, w).astype(images.dtype)  # (b, o, out, w)
    wy = sample_matrix_1d(sy, h).astype(images.dtype)  # (b, o, out, h)
    rows = jnp.einsum("boyh,bhwc->boywc", wy, images)
    return jnp.einsum("boxw,boywc->boyxc", wx, rows)
