"""Box utilities: hard occupancy masks and pure coordinate conversions.

The reference mutates bbox tensors in place during xywh->xyxy conversion
(``model/rcnn_discriminator_app.py:408-410``); here conversions are pure
functions over fixed-shape padded arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bbox_mask(boxes: jax.Array, h: int, w: int) -> jax.Array:
    """Hard box-occupancy mask — reference ``resnet_generator_app_v2.py:697-721``.

    A canvas pixel is inside iff ``0 <= (lin - x0)/bw <= 1`` on both axes,
    where ``lin`` is ``linspace(0, 1, size)``.

    Args:
      boxes: (b, o, 4) [x0, y0, bw, bh] in [0, 1].

    Returns:
      (b, o, h, w) float {0, 1} occupancy.
    """
    x0, y0, bw, bh = jnp.split(boxes, 4, axis=-1)  # (b, o, 1)
    lin_x = jnp.linspace(0.0, 1.0, w)
    lin_y = jnp.linspace(0.0, 1.0, h)
    fx = (lin_x - x0) / bw  # (b, o, w)
    fy = (lin_y - y0) / bh  # (b, o, h)
    in_x = (fx >= 0.0) & (fx <= 1.0)
    in_y = (fy >= 0.0) & (fy <= 1.0)
    return (in_y[..., :, None] & in_x[..., None, :]).astype(boxes.dtype)


def xywh_to_xyxy(boxes: jax.Array) -> jax.Array:
    """[x0, y0, w, h] -> [x0, y0, x1, y1] (pure; reference mutates in place)."""
    x0, y0, bw, bh = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x0, y0, x0 + bw, y0 + bh], axis=-1)
