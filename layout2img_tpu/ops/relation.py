"""Pairwise box-geometry embedding ("Relation Networks for Object Detection").

Reference: ``model/resnet_generator_app_v2.py:17-76`` (BoxRelationalEmbedding).
Behavioral notes preserved from the reference:
- Input boxes arrive as [x, y, w, h] but the formula treats the channels as
  [x_min, y_min, x_max, y_max]; we replicate the *behavior* exactly
  (cx = (b0+b2)/2, width = (b2-b0)+1, ...), since trained models depend on it.
- Geometry deltas are log-scaled, multiplied by 100, and expanded into a
  sinusoidal embedding of dim_g=64 (8 frequencies x 4 deltas x sin/cos).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_relational_embedding(
    boxes: jax.Array,
    dim_g: int = 64,
    wave_len: float = 1000.0,
    trignometric: bool = True,
) -> jax.Array:
    """Pairwise geometric embedding.

    Args:
      boxes: (b, o, 4).

    Returns:
      (b, o, o, dim_g) if trignometric else (b, o, o, 4).
    """
    b0, b1, b2, b3 = jnp.split(boxes, 4, axis=-1)  # (b, o, 1)
    cx = (b0 + b2) * 0.5
    cy = (b1 + b3) * 0.5
    w = (b2 - b0) + 1.0
    h = (b3 - b1) + 1.0

    # (b, o_i, o_j): row i is query box, col j is key box
    delta_x = cx - jnp.swapaxes(cx, -1, -2)
    delta_x = jnp.log(jnp.maximum(jnp.abs(delta_x / w), 1e-3))
    delta_y = cy - jnp.swapaxes(cy, -1, -2)
    delta_y = jnp.log(jnp.maximum(jnp.abs(delta_y / h), 1e-3))
    delta_w = jnp.log(w / jnp.swapaxes(w, -1, -2))
    delta_h = jnp.log(h / jnp.swapaxes(h, -1, -2))

    pos = jnp.stack([delta_x, delta_y, delta_w, delta_h], axis=-1)  # (b, o, o, 4)
    if not trignometric:
        return pos

    n_freq = dim_g // 8
    freq = jnp.arange(n_freq, dtype=boxes.dtype) / n_freq
    inv_wave = 1.0 / jnp.power(wave_len, freq)  # (n_freq,)
    mul = (100.0 * pos)[..., None] * inv_wave  # (b, o, o, 4, n_freq)
    mul = mul.reshape(mul.shape[:-2] + (4 * n_freq,))
    return jnp.concatenate([jnp.sin(mul), jnp.cos(mul)], axis=-1)
