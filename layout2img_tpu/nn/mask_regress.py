"""Mask regression: style vector -> 16x16 soft mask -> splat into box.

Reference ``model/mask_regression.py``. The trunk is per-object; instead of
folding objects into the batch dim with views, objects stay a named axis and
the convs vmap over it (XLA batches them into one conv). The final splat is
the separable-matmul ``masks_to_layout``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as fnn

from layout2img_tpu.nn.norms import InstanceNorm2d, SyncBatchNorm
from layout2img_tpu.nn.spectral import SNConv, SNDense
from layout2img_tpu.ops.interp import masks_to_layout, resize_bilinear_nhwc


class MaskRegressNetV2(fnn.Module):
    """256-ch InstanceNorm trunk (``mask_regression.py:58-102``) — used by
    all v2/context generators."""

    channels: int = 256
    mask_size: int = 16
    map_size: int = 64

    @fnn.compact
    def __call__(
        self, vectors: jax.Array, boxes: jax.Array, *, update_stats: bool = True
    ) -> jax.Array:
        """vectors: (b, o, num_w); boxes: (b, o, 4) xywh. -> (b, o, map, map)."""
        b, o, _ = vectors.shape
        ch = self.channels
        x = SNDense(ch * 4 * 4, name="fc")(vectors, update_stats=update_stats)
        x = x.reshape(b * o, ch, 4, 4).transpose(0, 2, 3, 1)  # NHWC, torch channel order

        x = SNConv(ch, (3, 3), name="conv1")(x, update_stats=update_stats)
        x = fnn.relu(InstanceNorm2d()(x))
        x = resize_bilinear_nhwc(x, (8, 8))
        x = SNConv(ch, (3, 3), name="conv2")(x, update_stats=update_stats)
        x = fnn.relu(InstanceNorm2d()(x))
        x = resize_bilinear_nhwc(x, (self.mask_size, self.mask_size))
        x = SNConv(ch, (3, 3), name="conv3a")(x, update_stats=update_stats)
        x = fnn.relu(InstanceNorm2d()(x))
        x = SNConv(1, (1, 1), name="conv3b")(x, update_stats=update_stats)
        masks = fnn.sigmoid(x)[..., 0].reshape(b, o, self.mask_size, self.mask_size)
        return masks_to_layout(boxes, masks, self.map_size)


class MaskRegressNet(fnn.Module):
    """128-ch SyncBN trunk (``mask_regression.py:11-55``) — v1 generators.

    BN statistics are computed over (b*o, h, w) exactly like the reference's
    object-folded batch.
    """

    channels: int = 128
    mask_size: int = 16
    map_size: int = 64
    num_parts: int = 1  # 3 == part variant (reference mask_regression_part.py:57-110)

    @fnn.compact
    def __call__(
        self,
        vectors: jax.Array,
        boxes: jax.Array,
        *,
        train: bool = True,
        update_stats: bool = True,
    ) -> jax.Array:
        b, o, _ = vectors.shape
        ch = self.channels
        x = SNDense(ch * 4 * 4, name="fc")(vectors, update_stats=update_stats)
        x = x.reshape(b * o, ch, 4, 4).transpose(0, 2, 3, 1)

        x = SNConv(ch, (3, 3), name="conv1")(x, update_stats=update_stats)
        x = fnn.relu(SyncBatchNorm(name="bn1")(x, use_running_average=not train))
        x = resize_bilinear_nhwc(x, (8, 8))
        x = SNConv(ch, (3, 3), name="conv2")(x, update_stats=update_stats)
        x = fnn.relu(SyncBatchNorm(name="bn2")(x, use_running_average=not train))
        x = resize_bilinear_nhwc(x, (self.mask_size, self.mask_size))
        x = SNConv(ch, (3, 3), name="conv3a")(x, update_stats=update_stats)
        x = fnn.relu(SyncBatchNorm(name="bn3")(x, use_running_average=not train))
        x = SNConv(self.num_parts, (1, 1), name="conv3b")(x, update_stats=update_stats)
        masks = fnn.sigmoid(x).reshape(b, o, self.mask_size, self.mask_size, self.num_parts)
        if self.num_parts == 1:
            return masks_to_layout(boxes, masks[..., 0], self.map_size)
        layouts = [
            masks_to_layout(boxes, masks[..., p], self.map_size)
            for p in range(self.num_parts)
        ]
        return jnp.stack(layouts, axis=2)  # (b, o, P, map, map)
