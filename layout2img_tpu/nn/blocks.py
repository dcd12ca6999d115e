"""Generator / discriminator residual blocks and the PSP context module.

Generator block: reference ``model/resnet_generator_app_v2.py:628-678``
(ISLA-norm -> relu -> nearest-2x -> SNConv) x2 with learnable shortcut and an
optional per-stage 184-class semantic-mask head (plain conv stack or PSP).

Discriminator blocks: reference ``model/rcnn_discriminator_app.py:294-344``
(pre-activation SN ResBlocks with avg-pool downsampling).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn

from layout2img_tpu.nn.norms import SpatialAdaptiveNorm, SyncBatchNorm
from layout2img_tpu.nn.spectral import SNConv
from layout2img_tpu.ops.interp import adaptive_avg_pool2d_nhwc, resize_bilinear_nhwc


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """Nearest 2x upsample for NHWC (== F.interpolate(scale_factor=2))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def avg_pool2x(x: jax.Array) -> jax.Array:
    """2x2/2 average pool (== F.avg_pool2d(x, 2)) for NHWC."""
    return fnn.avg_pool(x, (2, 2), (2, 2))


class GenResBlock(fnn.Module):
    out_ch: int
    hidden_ch: int | None = None
    upsample: bool = True
    predict_mask: bool = True
    psp_module: bool = False
    num_mask_classes: int = 184

    @fnn.compact
    def __call__(
        self,
        x: jax.Array,  # (b, h, w, in_ch)
        vectors: jax.Array,  # (b, o, num_w)
        mask: jax.Array,  # (b, o, mh, mw)
        train: bool = True,
        update_stats: bool = True,
        deterministic: bool = True,
    ) -> tuple[jax.Array, jax.Array | None]:
        in_ch = x.shape[-1]
        h_ch = self.hidden_ch or self.out_ch

        def norm(name):
            return SpatialAdaptiveNorm(name=name)

        y = norm("b1")(x, vectors, mask, use_running_average=not train, update_spectral=update_stats)
        y = fnn.relu(y)
        if self.upsample:
            y = upsample2x_nearest(y)
        y = SNConv(h_ch, (3, 3), name="conv1")(y, update_stats=update_stats)
        y = norm("b2")(y, vectors, mask, use_running_average=not train, update_spectral=update_stats)
        y = fnn.relu(y)
        y = SNConv(self.out_ch, (3, 3), name="conv2")(y, update_stats=update_stats)

        sc = x
        if in_ch != self.out_ch or self.upsample:
            if self.upsample:
                sc = upsample2x_nearest(sc)
            sc = SNConv(self.out_ch, (1, 1), name="c_sc")(sc, update_stats=update_stats)
        out = y + sc

        stage_mask = None
        if self.predict_mask:
            if self.psp_module:
                m = PSPModule(100, name="psp")(out, train=train, deterministic=deterministic)
                stage_mask = fnn.Conv(self.num_mask_classes, (1, 1), name="conv_mask")(m)
            else:
                m = fnn.Conv(100, (3, 3), name="mask_conv1")(out)
                m = SyncBatchNorm(name="mask_bn")(m, use_running_average=not train)
                m = fnn.relu(m)
                stage_mask = fnn.Conv(self.num_mask_classes, (1, 1), name="mask_conv2")(m)
        return out, stage_mask


class PSPModule(fnn.Module):
    """Pyramid scene parsing head (reference ``resnet_generator_app_v2.py:724-752``).

    Adaptive pools become constant-matrix matmuls; stage upsampling is
    bilinear with align_corners=True as in the reference.
    """

    out_features: int = 512
    sizes: Sequence[int] = (1, 2, 3, 6)
    dropout_rate: float = 0.1

    @fnn.compact
    def __call__(self, x: jax.Array, train: bool = True, deterministic: bool = True) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        priors = []
        for i, s in enumerate(self.sizes):
            p = adaptive_avg_pool2d_nhwc(x, (s, s))
            p = fnn.Conv(self.out_features, (1, 1), use_bias=False, name=f"stage{i}_conv")(p)
            p = SyncBatchNorm(name=f"stage{i}_bn")(p, use_running_average=not train)
            p = fnn.relu(p)
            priors.append(resize_bilinear_nhwc(p, (h, w), align_corners=True))
        priors.append(x)
        y = jnp.concatenate(priors, axis=-1)
        y = fnn.Conv(self.out_features, (3, 3), use_bias=False, name="bottleneck_conv")(y)
        y = SyncBatchNorm(name="bottleneck_bn")(y, use_running_average=not train)
        y = fnn.relu(y)
        # Dropout2d: drop whole channels
        y = fnn.Dropout(self.dropout_rate, broadcast_dims=(1, 2), name="drop")(
            y, deterministic=deterministic
        )
        return y


class DiscOptimizedBlock(fnn.Module):
    """First D block (``rcnn_discriminator_app.py:294-314``)."""

    out_ch: int
    downsample: bool = True

    @fnn.compact
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        y = SNConv(self.out_ch, (3, 3), name="conv1")(x, update_stats=update_stats)
        y = fnn.relu(y)
        y = SNConv(self.out_ch, (3, 3), name="conv2")(y, update_stats=update_stats)
        if self.downsample:
            y = avg_pool2x(y)
        sc = avg_pool2x(x) if self.downsample else x
        sc = SNConv(self.out_ch, (1, 1), name="c_sc")(sc, update_stats=update_stats)
        return y + sc


class DiscResBlock(fnn.Module):
    """Pre-activation D ResBlock (``rcnn_discriminator_app.py:317-344``)."""

    out_ch: int
    downsample: bool = False

    @fnn.compact
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        in_ch = x.shape[-1]
        y = SNConv(self.out_ch, (3, 3), name="conv1")(fnn.relu(x), update_stats=update_stats)
        y = SNConv(self.out_ch, (3, 3), name="conv2")(fnn.relu(y), update_stats=update_stats)
        if self.downsample:
            y = avg_pool2x(y)
        sc = x
        if in_ch != self.out_ch or self.downsample:
            sc = SNConv(self.out_ch, (1, 1), name="c_sc")(sc, update_stats=update_stats)
            if self.downsample:
                sc = avg_pool2x(sc)
        return y + sc
