"""LostGAN-family layout-to-image generators, unified and TPU-native.

The reference spreads ~9 near-duplicate generator files across ``model/``;
here one configurable module covers the whole family. Variant map
(reference file -> config):

- ``resnet_generator_v1.py:9-145`` (LostGAN v1 64/128):
    ``LostGANGenerator(image_size=..., mask_trunk='v1')``
- ``resnet_generator_v2.py:12-115`` / ``resnet_generator_app_v2.py:299-397``
  (v2 with alpha-gated per-stage semantic masks, "apponly"):
    ``stage_masks=True, mask_trunk='v2'``
- ``resnet_generator_app_v2.py:400-506`` (context + stage masks — Ours-D):
    ``context='attention', stage_masks=True``
- ``resnet_generator_context.py:597-681`` (context, no stage masks):
    ``context='attention', mask_trunk='v1'``
- ``resnet_generator_vg.py:639-728`` (nogeo ablation):
    ``context='attention', use_geometry=False, mask_trunk='v1'``
- ``resnet_generator_graph.py:920-1004`` (GCN context):
    ``context='graph', mask_trunk='v1'``
- ``resnet_generator_app_v2.py:509-625`` (256px): ``image_size=256,
    stage_masks=True``
- ``*_nf`` feature-only variants: ``rgb_head=False``
- ``background_foreground_generator`` (Ours-ED,
  ``resnet_generator_v1.py:358-380``): ``BgFgGenerator``.

Layout: images NHWC, masks (b, o, h, w), vectors (b, o, d).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

from layout2img_tpu.nn.attention import BoxMultiHeadedAttention
from layout2img_tpu.nn.blocks import GenResBlock
from layout2img_tpu.nn.gcn import GraphFunc
from layout2img_tpu.nn.mask_regress import MaskRegressNet, MaskRegressNetV2
from layout2img_tpu.nn.norms import SyncBatchNorm
from layout2img_tpu.nn.spectral import SNConv, SNDense
from layout2img_tpu.ops.bbox import bbox_mask
from layout2img_tpu.ops.interp import resize_bilinear, resize_nearest

orth = fnn.initializers.orthogonal


def _channel_schedule(image_size: int) -> tuple[list[int], list[int]]:
    """Returns (in_mults, out_mults) for the upsampling ResBlock stack."""
    if image_size == 64:
        mult = [16, 8, 4, 2, 1]
    elif image_size == 128:
        mult = [16, 16, 8, 4, 2, 1]
    elif image_size == 256:
        mult = [16, 16, 8, 8, 4, 2, 1]
    else:
        raise ValueError(f"unsupported image_size {image_size}")
    return mult[:-1], mult[1:]


class LostGANGenerator(fnn.Module):
    num_classes: int
    image_size: int = 128
    ch: int = 64
    z_dim: int = 128
    emb_dim: int = 180  # 128 in the 64px v1 config (resnet_generator_v1.py:14)
    output_dim: int = 3
    context: str = "none"  # "none" | "attention" | "graph"
    use_geometry: bool = True  # False == nogeo ablation
    stage_masks: bool = False  # alpha-gated per-stage semantic masks (v2)
    mask_trunk: str = "v2"  # "v1" (BN/128ch) | "v2" (IN/256ch)
    num_mask_classes: int = 184
    map_size: int = 64  # mask-regression splat canvas
    hard_mask_size: int = 0  # bbox occupancy canvas; 0 == map_size (256px model: 128)
    rgb_head: bool = True  # False == "_nf" feature-only variant
    parts: int = 1  # 3 == part-mask variant (resnet_generator_part.py:722-809)
    # True reproduces the reference's h=1 attention-concat scramble — needed
    # when running imported reference checkpoints (see nn/attention.py)
    legacy_attention: bool = False

    @fnn.compact
    def __call__(
        self,
        z: jax.Array,  # (b, o, z_dim)
        boxes: jax.Array,  # (b, o, 4) xywh in [0,1]
        labels: jax.Array,  # (b, o) int, 0 == pad
        z_im: jax.Array,  # (b, z_dim)
        train: bool = True,
        update_stats: bool = True,
        deterministic: bool = True,
    ) -> jax.Array:
        b, o, _ = z.shape
        num_w = self.z_dim + self.emb_dim

        emb = fnn.Embed(self.num_classes, self.emb_dim, embedding_init=orth(), name="label_embedding")(labels)
        w = jnp.concatenate([z, emb], axis=-1)  # (b, o, num_w)

        if self.context == "attention":
            w = BoxMultiHeadedAttention(
                heads=1,
                d_model=num_w,
                use_geometry=self.use_geometry,
                dropout_rate=0.0,
                legacy_view=self.legacy_attention,
                name="context",
            )(w, w, w, boxes, labels, deterministic=deterministic)
        elif self.context == "graph":
            w = GraphFunc(num_w, name="context")(w, labels, deterministic=deterministic)

        if self.mask_trunk == "v2":
            assert self.parts == 1, "part masks use the v1 trunk"
            bmask = MaskRegressNetV2(map_size=self.map_size, name="mask_regress")(
                w, boxes, update_stats=update_stats
            )
        else:
            bmask = MaskRegressNet(
                map_size=self.map_size, num_parts=self.parts, name="mask_regress"
            )(w, boxes, train=train, update_stats=update_stats)

        in_mults, out_mults = _channel_schedule(self.image_size)
        n_blocks = len(out_mults)

        x = SNDense(4 * 4 * 16 * self.ch, name="fc")(z_im, update_stats=update_stats)
        x = x.reshape(b, 16 * self.ch, 4, 4).transpose(0, 2, 3, 1)  # NHWC

        if self.stage_masks:
            hs = self.hard_mask_size or self.map_size
            # x.dtype: keep the modulation path in the compute dtype — f32
            # boxes would otherwise promote every stage mask (and the ISLA
            # affine) to f32 under mixed precision
            hard = bbox_mask(boxes, hs, hs).astype(x.dtype)  # (b, o, hs, hs)
            onehot = jax.nn.one_hot(labels, self.num_mask_classes, dtype=x.dtype)
            stage_bbox = bmask
            for i, out_mult in enumerate(out_mults):
                is_last = i == n_blocks - 1
                # PSP head on the penultimate block (res4 at 128px, reference
                # resnet_generator_app_v2.py:414); the 256px model uses plain
                # conv heads throughout (:519-524).
                psp = (self.image_size == 128) and (i == n_blocks - 2)
                x, smask = GenResBlock(
                    out_ch=out_mult * self.ch,
                    upsample=True,
                    predict_mask=not is_last,
                    psp_module=psp,
                    num_mask_classes=self.num_mask_classes,
                    name=f"res{i + 1}",
                )(x, w, stage_bbox, train=train, update_stats=update_stats, deterministic=deterministic)
                if not is_last:
                    hh, ww = x.shape[1], x.shape[2]
                    # gather predicted per-class masks at each object's class
                    seman = jnp.einsum("bhwc,boc->bohw", smask, onehot)
                    seman = jax.nn.sigmoid(seman) * resize_nearest(hard, (hh, ww))
                    alpha_full = self.param(
                        f"alpha{i + 1}",
                        fnn.initializers.zeros_init(),
                        (self.num_mask_classes,),
                    )
                    alpha = jnp.einsum("c,boc->bo", jax.nn.sigmoid(alpha_full), onehot)
                    alpha = alpha[:, :, None, None]
                    stage_bbox = (
                        resize_bilinear(bmask, (hh, ww)) * (1 - alpha) + seman * alpha
                    )
        else:
            for i, out_mult in enumerate(out_mults):
                x, _ = GenResBlock(
                    out_ch=out_mult * self.ch,
                    upsample=True,
                    predict_mask=False,
                    name=f"res{i + 1}",
                )(x, w, bmask, train=train, update_stats=update_stats, deterministic=deterministic)

        if not self.rgb_head:
            return x
        x = SyncBatchNorm(name="final_bn")(x, use_running_average=not train)
        x = fnn.relu(x)
        x = SNConv(self.output_dim, (3, 3), name="final_conv")(x, update_stats=update_stats)
        return jnp.tanh(x)


class CombineResBlock(fnn.Module):
    """Fg/bg fusion block (reference ``ResBlock_1``,
    ``resnet_generator_v1.py:324-347``): plain (non-SN) convs, xavier init,
    BN+relu+conv x2 with a conv3x3 shortcut."""

    out_ch: int

    @fnn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        xavier = fnn.initializers.xavier_uniform()
        y = SyncBatchNorm(name="bn1")(x, use_running_average=not train)
        y = fnn.relu(y)
        y = fnn.Conv(self.out_ch, (3, 3), kernel_init=xavier, name="conv1")(y)
        y = SyncBatchNorm(name="bn2")(y, use_running_average=not train)
        y = fnn.relu(y)
        y = fnn.Conv(self.out_ch, (3, 3), kernel_init=xavier, name="conv2")(y)
        sc = SyncBatchNorm(name="bn_sc")(x, use_running_average=not train)
        sc = fnn.Conv(self.out_ch, (3, 3), kernel_init=xavier, name="conv3")(fnn.relu(sc))
        return y + sc


class BgFgGenerator(fnn.Module):
    """Two-stream foreground/background generator ("Ours-ED", 64px).

    Reference ``resnet_generator_v1.py:358-380``: two feature-only v1
    generators (fg classes, bg classes), channel-concat, ResBlock_1 fusion,
    BN+relu+SNConv+tanh RGB head.
    """

    num_fg_classes: int
    num_bg_classes: int
    image_size: int = 64
    ch: int = 64
    z_dim: int = 128
    output_dim: int = 3
    context: str = "none"  # optional context on both streams

    @fnn.compact
    def __call__(
        self,
        z_fg: jax.Array,
        boxes_fg: jax.Array,
        labels_fg: jax.Array,
        z_bg: jax.Array,
        boxes_bg: jax.Array,
        labels_bg: jax.Array,
        z_im_fg: jax.Array,
        z_im_bg: jax.Array,
        train: bool = True,
        update_stats: bool = True,
        deterministic: bool = True,
    ) -> jax.Array:
        kw = dict(
            image_size=self.image_size,
            ch=self.ch,
            z_dim=self.z_dim,
            emb_dim=128,  # 64px v1 config
            mask_trunk="v1",
            context=self.context,
            rgb_head=False,
        )
        fg = LostGANGenerator(num_classes=self.num_fg_classes, name="foreground_g", **kw)(
            z_fg, boxes_fg, labels_fg, z_im_fg, train, update_stats, deterministic
        )
        bg = LostGANGenerator(num_classes=self.num_bg_classes, name="background_g", **kw)(
            z_bg, boxes_bg, labels_bg, z_im_bg, train, update_stats, deterministic
        )
        feat = jnp.concatenate([bg, fg], axis=-1)
        feat = CombineResBlock(self.ch, name="combination")(feat, train=train)
        x = SyncBatchNorm(name="final_bn")(feat, use_running_average=not train)
        x = fnn.relu(x)
        x = SNConv(self.output_dim, (3, 3), name="final_conv")(x, update_stats=update_stats)
        return jnp.tanh(x)


_GENERATOR_PRESETS: dict[str, dict[str, Any]] = {
    # train_lostGan.py (resnet_generator_v1_orig.py baseline)
    "lostgan128": dict(image_size=128, mask_trunk="v1"),
    "lostgan64": dict(image_size=64, emb_dim=128, mask_trunk="v1"),
    # train_ours_d.py / train_app.py ("apponly": v2 + stage masks)
    "ours_d_base128": dict(image_size=128, stage_masks=True),
    # train_context_app_v2.py (Ours-D final: context + stage masks)
    "ours_d_context128": dict(image_size=128, stage_masks=True, context="attention"),
    # train_context_app.py (context, no stage masks)
    "context128": dict(image_size=128, context="attention", mask_trunk="v1"),
    # train_context_nogeo.py / train_context_app_nogeo.py
    "context128_nogeo": dict(
        image_size=128, context="attention", use_geometry=False, mask_trunk="v1"
    ),
    # train_graph_context_app.py
    "graph128": dict(image_size=128, context="graph", mask_trunk="v1"),
    # train_context_part.py (3-part masks, resnet_generator_part.py:722-809)
    "context128_part": dict(image_size=128, context="attention", mask_trunk="v1", parts=3),
    # 256px variant (resnet_generator_app_v2.py:509)
    # 256px: mask-regress canvas stays 64 (reference MaskRegressNetv2 default,
    # resnet_generator_app_v2.py:541) while the hard occupancy mask is 128 (:562)
    "ours_d_base256": dict(image_size=256, stage_masks=True, hard_mask_size=128),
}


def obj_budget_error(gen: LostGANGenerator) -> str | None:
    """Why a G object budget would NOT be exact for this generator.

    Returns None when compacting the object axis is exact (pad slots
    contribute exactly zero to the image): requires the v2 mask trunk
    (the v1 trunk's BatchNorm couples slots through its (b*o) batch
    statistics) and the corrected attention concat (the legacy scramble
    mixes the slot/channel layout)."""
    if getattr(gen, "mask_trunk", "") != "v2":
        return ("the v1 mask trunk couples object slots through its (b*o) "
                "BatchNorm statistics — compaction would change the image")
    if getattr(gen, "legacy_attention", False):
        return ("legacy_attention's concat scramble mixes the slot/channel "
                "layout — compaction would change the image")
    return None


def make_generator(preset: str, num_classes: int, **overrides) -> LostGANGenerator:
    cfg = dict(_GENERATOR_PRESETS[preset])
    cfg.update(overrides)
    return LostGANGenerator(num_classes=num_classes, **cfg)
