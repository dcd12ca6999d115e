"""TPU-native RoIAlign via separable interpolation matmuls.

Replaces ``torchvision.ops.RoIAlign`` (CUDA kernel used by the reference
discriminators, ``model/rcnn_discriminator_app.py:32-33,98-99``) with a
fixed-shape formulation: ROI bins are axis-aligned, so the bilinear-average
pooling factors into per-object 1-D averaging matrices and the crop is
``A_y @ fm @ A_x^T`` — batched matmuls on the MXU.

Differences from torchvision, by design:
- Operates on *padded* (b, o, 4) box arrays; invalid objects are handled by
  the caller's validity mask, replacing the reference's dynamic
  ``label != 0`` filtering (``rcnn_discriminator_app.py:415-417``).
- ``sampling_ratio=0`` (the reference's actual setting, constructed as
  ``RoIAlign((8, 8), scale, int(0))``) is implemented as a *static
  bounded-tap* kernel: torchvision's adaptive taps-per-bin is
  ``grid = ceil(bin_size)`` with ``bin_size = roi_extent / out_bins``;
  since boxes live inside the image, ``roi_extent <= fm_size`` and
  ``grid <= ceil(fm_size / out_bins)`` (= 4 for every reference config:
  fm <= 32px, 8 bins). We allocate that static bound of tap slots per bin
  and mask+renormalize per object, so the result is bit-for-bit the
  adaptive average with XLA-friendly static shapes. Boxes that (illegally)
  exceed the feature map clamp at the bound and deviate slightly.

Border semantics match torchvision (aligned=False): samples with
coordinate < -1 or > size contribute zero; otherwise coordinates clamp to
[0, size-1] with edge replication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _roi_tap_matrix(pos: jax.Array, size: int) -> jax.Array:
    """(..., S, size) bilinear weight matrix with torchvision border rules."""
    valid = (pos >= -1.0) & (pos <= float(size))
    xx = jnp.clip(pos, 0.0, float(size - 1))
    low = jnp.floor(xx)
    frac = xx - low
    w_low = 1.0 - frac
    low = low.astype(jnp.int32)
    cols = jnp.arange(size, dtype=jnp.int32)
    m = jnp.where(cols == low[..., None], w_low[..., None], 0.0)
    m = m + jnp.where(cols == low[..., None] + 1, frac[..., None], 0.0)
    return m * valid[..., None].astype(m.dtype)


def _axis_matrix(start: jax.Array, length: jax.Array, out_bins: int, sampling_ratio: int, size: int) -> jax.Array:
    """Per-object 1-D ROI-average matrix of shape (..., out_bins, size).

    start/length: (...,) ROI start & extent in feature-map pixels (already
    scaled by spatial_scale, extent clamped to >= 1 by the caller).

    ``sampling_ratio == 0`` selects torchvision's adaptive grid
    (``grid = ceil(length / out_bins)`` taps per bin, same grid for every
    bin of a ROI) realized with a static bound of
    ``ceil(size / out_bins)`` tap slots — unused slots are masked and the
    per-bin average renormalized by the live count, which is numerically
    identical to torchvision's dynamic loop for in-bounds ROIs.
    """
    bin_sz = length / out_bins  # (...,)
    if sampling_ratio > 0:
        sr = sampling_ratio
        # sample positions: start + (bin + (p+0.5)/sr) * bin_sz
        offs = (jnp.arange(out_bins * sr) // sr).astype(start.dtype) + (
            (jnp.arange(out_bins * sr) % sr).astype(start.dtype) + 0.5
        ) / sr  # (out_bins*sr,)
        pos = start[..., None] + offs * bin_sz[..., None]  # (..., out_bins*sr)
        taps = _roi_tap_matrix(pos, size)  # (..., out_bins*sr, size)
        taps = taps.reshape(taps.shape[:-2] + (out_bins, sr, size))
        return taps.mean(axis=-2)
    # adaptive (sampling_ratio == 0): static bound on taps/bin
    t = max(1, -(-size // out_bins))  # ceil(size / out_bins)
    grid = jnp.clip(jnp.ceil(bin_sz), 1.0, float(t))  # (...,) live taps/bin
    bins = (jnp.arange(out_bins * t) // t).astype(start.dtype)  # (out_bins*t,)
    p = (jnp.arange(out_bins * t) % t).astype(start.dtype)
    # position of tap p in bin: start + (bin + (p+0.5)/grid) * bin_sz
    pos = start[..., None] + (bins + (p + 0.5) / grid[..., None]) * bin_sz[..., None]
    live = (p < grid[..., None]).astype(start.dtype) / grid[..., None]  # (..., out_bins*t)
    taps = _roi_tap_matrix(pos, size) * live[..., None]  # (..., out_bins*t, size)
    taps = taps.reshape(taps.shape[:-2] + (out_bins, t, size))
    return taps.sum(axis=-2)


def roi_align(
    features: jax.Array,
    boxes_xyxy: jax.Array,
    out_size: int,
    spatial_scale: float,
    sampling_ratio: int = 0,
) -> jax.Array:
    """Crop-and-pool fixed-size windows from per-image feature maps.

    Args:
      features: (b, h, w, c) NHWC feature maps.
      boxes_xyxy: (b, o, 4) [x0, y0, x1, y1] in *image pixel* coordinates
        (the reference scales normalized boxes by image size first,
        ``rcnn_discriminator_app.py:410``).
      out_size: output bins per side (8 in all reference configs).
      spatial_scale: feature-map stride reciprocal (1/4, 1/8, ...).
      sampling_ratio: taps per bin per axis; 0 (default, the reference's
        setting) = torchvision-adaptive ``ceil(bin_size)`` via static
        bounded tap slots.

    Returns:
      (b, o, out_size, out_size, c) crops.
    """
    _, h, w, _ = features.shape
    x0, y0, x1, y1 = jnp.split(boxes_xyxy * spatial_scale, 4, axis=-1)
    x0, y0, x1, y1 = x0[..., 0], y0[..., 0], x1[..., 0], y1[..., 0]  # (b, o)
    roi_w = jnp.maximum(x1 - x0, 1.0)
    roi_h = jnp.maximum(y1 - y0, 1.0)
    # build tap matrices in f32 (coordinate math), then cast the finished
    # matrices to the payload dtype — otherwise a bf16 feature pipeline is
    # silently promoted to f32 from the crop onward (object + app heads)
    ax = _axis_matrix(x0, roi_w, out_size, sampling_ratio, w).astype(features.dtype)
    ay = _axis_matrix(y0, roi_h, out_size, sampling_ratio, h).astype(features.dtype)
    rows = jnp.einsum("boyh,bhwc->boywc", ay, features)
    return jnp.einsum("boxw,boywc->boyxc", ax, rows)


def dual_scale_roi_align(
    feat_small: jax.Array,
    feat_large: jax.Array,
    boxes_xyxy: jax.Array,
    out_size: int,
    scale_small: float,
    scale_large: float,
    size_threshold: float,
    sampling_ratio: int = 0,
) -> jax.Array:
    """Small/large ROI routing as a static select.

    The reference routes each ROI data-dependently — boxes with both sides
    < ``size_threshold`` px go to a high-res feature map, the rest to a
    low-res one (``rcnn_discriminator_app.py:131-143``). Dynamic partition
    is shape-hostile on TPU; instead both crops are computed (they share the
    einsum pipeline) and selected per object with ``jnp.where``.

    Args:
      feat_small: (b, h, w, c) high-res map for small boxes.
      feat_large: (b, h', w', c) low-res map for large boxes.
      boxes_xyxy: (b, o, 4) in image pixels.

    Returns:
      (b, o, out, out, c) crops.
    """
    crops_s = roi_align(feat_small, boxes_xyxy, out_size, scale_small, sampling_ratio)
    crops_l = roi_align(feat_large, boxes_xyxy, out_size, scale_large, sampling_ratio)
    bw = boxes_xyxy[..., 2] - boxes_xyxy[..., 0]
    bh = boxes_xyxy[..., 3] - boxes_xyxy[..., 1]
    is_small = (bw < size_threshold) & (bh < size_threshold)  # (b, o)
    return jnp.where(is_small[:, :, None, None, None], crops_s, crops_l)
