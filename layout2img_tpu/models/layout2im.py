"""layout2im-family CVAE-GAN with the paper's context/appearance modules.

From-scratch TPU-native build of the reference ``model_layout2img/`` package
(the "apply our method in layout2im" deliverable, reference README TODO
list): crop encoder (VAE posterior over object crops, conditional BN),
layout encoder (object embedding || z -> context attention -> mask-broadcast
-> down-convs -> per-image sum -> transformer refinement at 8x8), decoder,
and image/object discriminators with the Gram appearance head.

Reference mapping:
- ``generator_app.py:719-774``  CropEncoder
- ``generator_app.py:777-861``  LayoutEncoder (transformer_encoder replaces
  the ConvLSTM fusion, :844-855; fusion variants cover generator.py
  (convlstm), generator1.py (transformer_decoder) and generator2.py
  (transformer_noctx — no object-context attention, :446-525))
- ``generator_app.py:864-899``  Decoder
- ``generator_app.py:902-962``  Generator / Generator_context (8-tuple)
- ``discriminator_app.py:102-187``  ImageDiscriminator / ObjectDiscriminator
- ``transformer.py:144-177``  transformer_encoder / transformer_decoder

TPU-native differences:
- The reference flattens ragged per-image object lists (``obj_to_img``) and
  converts back with Python loops (``feature_vector_split/combine``,
  ``featuremap_composition``, ``generator_app.py:303-358``). Here objects
  stay a padded (b, o) axis with a validity mask end-to-end; the per-image
  sum is a masked einsum. All shapes static.
- Batch-norm statistics are masked so padded object slots cannot
  contaminate them (the reference never sees pad slots because of the
  ragged layout).
- ``crop_bbox_batch`` (grid_sample) becomes the separable-matmul
  ``ops.interp.crop_boxes``.
- ``transformer_decoder``'s learned query is a proper parameter (the
  reference's ``nn.Parameter(...).cuda()`` detaches it, transformer.py:161).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as fnn

from layout2img_tpu.nn.attention import MultiHeadAttention
from layout2img_tpu.ops.interp import crop_boxes

# ---------------------------------------------------------------------------
# Norm helpers (masked over valid object slots)
# ---------------------------------------------------------------------------


class MaskedBatchNorm(fnn.Module):
    """BN over (entries, h, w) where only masked-valid entries contribute
    statistics. Input (n, h, w, c), mask (n,)."""

    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True

    @fnn.compact
    def __call__(self, x, mask=None, use_running_average: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c, jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if mask is None:
                mean = jnp.mean(xf, axis=(0, 1, 2))
                mean_sq = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
                n = x.size // c
            else:
                m = mask.astype(jnp.float32)[:, None, None, None]
                denom = jnp.maximum(jnp.sum(m) * x.shape[1] * x.shape[2], 1.0)
                mean = jnp.sum(xf * m, axis=(0, 1, 2)) / denom
                mean_sq = jnp.sum(jnp.square(xf) * m, axis=(0, 1, 2)) / denom
                n = denom
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1, 1))
                mom = self.momentum
                ra_mean.value = (1 - mom) * ra_mean.value + mom * mean
                ra_var.value = (1 - mom) * ra_var.value + mom * unbiased
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", fnn.initializers.ones_init(), (c,))
            bias = self.param("bias", fnn.initializers.zeros_init(), (c,))
            y = y * scale + bias
        return y.astype(x.dtype)


class ConditionalBatchNorm(fnn.Module):
    """BN(affine=False) + per-class (gamma, beta) embedding
    (reference generator_app.py:382-395; scale init N(1, 0.02), bias 0)."""

    num_classes: int

    @fnn.compact
    def __call__(self, x, labels, mask=None, use_running_average: bool = False):
        c = x.shape[-1]
        y = MaskedBatchNorm(affine=False, name="bn")(x, mask, use_running_average)
        gamma = fnn.Embed(
            self.num_classes, c,
            embedding_init=fnn.initializers.normal(0.02), name="gamma",
        )(labels) + 1.0
        beta = fnn.Embed(
            self.num_classes, c, embedding_init=fnn.initializers.zeros_init(), name="beta"
        )(labels)
        return y * gamma[:, None, None, :] + beta[:, None, None, :]


# ---------------------------------------------------------------------------
# Transformer stacks
# ---------------------------------------------------------------------------


class TransformerEncoder(fnn.Module):
    """N x MHA(4 heads, d=512, d_k=d_v=128) self-attention (transformer.py:144-153)."""

    num_layers: int = 3
    d_model: int = 512
    heads: int = 4
    d_k: int = 128

    @fnn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.num_layers):
            x = MultiHeadAttention(
                self.heads, self.d_model, self.d_k, self.d_k, name=f"layer{i}"
            )(x, x, x, deterministic=deterministic)
        return x


class TransformerDecoder(fnn.Module):
    """Learned 64-query set decoder (transformer.py:156-177), with the query
    as a real parameter."""

    num_layers: int = 2
    num_queries: int = 64
    d_model: int = 192
    d_k: int = 64

    @fnn.compact
    def __call__(self, x, labels=None, deterministic: bool = True):
        n = x.shape[0]
        q = self.param(
            "query",
            fnn.initializers.uniform(scale=1.0),
            (1, self.num_queries, self.d_model),
        )
        q = MultiHeadAttention(1, self.d_model, self.d_k, self.d_model, name="layer0")(
            q, q, q, deterministic=deterministic
        )
        q = jnp.broadcast_to(q, (n, self.num_queries, self.d_model))
        x = MultiHeadAttention(1, self.d_model, self.d_k, self.d_model, name="layer1")(
            q, x, x, labels=labels, deterministic=deterministic
        )
        for i in range(self.num_layers - 1):
            x = MultiHeadAttention(
                1, self.d_model, self.d_k, self.d_model, name=f"layer{i + 2}"
            )(x, x, x, deterministic=deterministic)
        return x


# ---------------------------------------------------------------------------
# Generator components
# ---------------------------------------------------------------------------


class CropEncoder(fnn.Module):
    """Object crop -> VAE posterior (generator_app.py:719-774)."""

    num_classes: int
    conv_dim: int = 64
    z_dim: int = 8

    @fnn.compact
    def __call__(self, crops, labels, valid, rng, train: bool = True):
        """crops: (b, o, s, s, 3); labels/valid: (b, o). Returns (z, mu, logvar)
        each (b, o, z_dim)."""
        b, o = labels.shape
        x = crops.reshape(b * o, *crops.shape[2:])
        lab = labels.reshape(-1)
        msk = valid.reshape(-1)
        cd = self.conv_dim
        specs = [
            (cd, (7, 7), (1, 1), [(3, 3), (3, 3)]),
            (cd * 2, (4, 4), (2, 2), [(1, 1), (1, 1)]),
            (cd * 4, (4, 4), (2, 2), [(1, 1), (1, 1)]),
            (cd * 8, (4, 4), (2, 2), [(1, 1), (1, 1)]),
            (cd * 16, (4, 4), (2, 2), [(1, 1), (1, 1)]),
        ]
        for i, (feat, k, s, p) in enumerate(specs):
            x = fnn.Conv(feat, k, s, padding=p, use_bias=False, name=f"c{i + 1}")(x)
            x = ConditionalBatchNorm(self.num_classes, name=f"bn{i + 1}")(
                x, lab, msk, use_running_average=not train
            )
            x = fnn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        mu = fnn.Dense(self.z_dim, name="fc_mu")(x)
        logvar = fnn.Dense(self.z_dim, name="fc_logvar")(x)
        eps = jax.random.normal(rng, mu.shape, mu.dtype)
        z = eps * jnp.exp(0.5 * logvar) + mu
        return (
            z.reshape(b, o, self.z_dim),
            mu.reshape(b, o, self.z_dim),
            logvar.reshape(b, o, self.z_dim),
        )


class LayoutEncoder(fnn.Module):
    """(labels, masks, z) -> fused 8x8 feature map (generator_app.py:777-861)."""

    num_classes: int
    conv_dim: int = 64
    z_dim: int = 8
    embedding_dim: int = 64
    resi_num: int = 6
    # "transformer" == the paper's final fusion (generator_app.py:844-855);
    # "convlstm" == the upstream layout2im baseline (generator{,1,2}.py);
    # "transformer_decoder" == the generator1 variant that refines the
    # composed map with the learned-query set decoder (generator1.py:561,
    # 579-580) instead of encoder self-attention;
    # "transformer_noctx" == the generator2 variant: identical spatial
    # transformer refinement but NO object-level context attention before
    # the mask broadcast (generator2.py:446-525 has no `self.context`)
    fusion: str = "transformer"

    @fnn.compact
    def __call__(self, labels, masks, z, valid, train: bool = True, deterministic: bool = True):
        """labels/valid: (b, o); masks: (b, o, 64, 64); z: (b, o, z_dim)."""
        b, o = labels.shape
        emb = fnn.Embed(self.num_classes, self.embedding_dim, name="embedding")(labels)
        vec = jnp.concatenate([emb, z], axis=-1)  # (b, o, emb+z)

        d = self.embedding_dim + self.z_dim
        if self.fusion != "transformer_noctx":
            vec = MultiHeadAttention(1, d, d, d, dropout_rate=0.0, name="context")(
                vec, vec, vec, labels=labels, deterministic=deterministic
            )

        # broadcast each object's vector into its mask footprint
        h = vec[:, :, None, None, :] * masks[..., None]  # (b, o, 64, 64, d)
        h = h.reshape(b * o, 64, 64, d)
        lab = labels.reshape(-1)
        msk = valid.reshape(-1)
        cd = self.conv_dim
        specs = [
            (cd, (1, 1), (1, 1), [(1, 1), (1, 1)]),  # k1 p1: 64 -> 66 (reference quirk)
            (cd * 2, (4, 4), (2, 2), [(1, 1), (1, 1)]),  # 66 -> 33
            (cd * 4, (4, 4), (2, 2), [(1, 1), (1, 1)]),  # 33 -> 16
            (cd * 8, (4, 4), (2, 2), [(1, 1), (1, 1)]),  # 16 -> 8
        ]
        for i, (feat, k, s, p) in enumerate(specs):
            h = fnn.Conv(feat, k, s, padding=p, use_bias=False, name=f"c{i + 1}")(h)
            h = ConditionalBatchNorm(self.num_classes, name=f"bn{i + 1}")(
                h, lab, msk, use_running_average=not train
            )
            if i < 3:
                h = fnn.relu(h)

        h = h.reshape(b, o, 8, 8, cd * 8)
        if self.fusion == "convlstm":
            from layout2img_tpu.models.convlstm import LayoutConvLSTM

            h = LayoutConvLSTM((cd * 2, cd, cd), name="clstm")(h, valid)
        else:
            # masked per-image sum over objects (replaces featuremap_composition)
            h = jnp.einsum("bohwc,bo->bhwc", h, valid.astype(h.dtype))
            tokens = h.reshape(b, 64, cd * 8)
            if self.fusion == "transformer_decoder":
                # generator1.py:561,579-580: 64 learned queries cross-attend
                # into the composed spatial tokens
                tokens = TransformerDecoder(
                    num_layers=3, num_queries=64, d_model=cd * 8,
                    name="transformer_decoder",
                )(tokens, deterministic=deterministic)
            else:
                # transformer refinement over the 64 spatial tokens
                tokens = TransformerEncoder(3, name="transformer_encoder")(
                    tokens, deterministic=deterministic
                )
            h = tokens.reshape(b, 8, 8, cd * 8)
            h = fnn.Conv(cd, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="c5")(h)
            h = MaskedBatchNorm(name="bn5")(h, use_running_average=not train)
            h = fnn.relu(h)

        for i in range(self.resi_num):
            r = fnn.Conv(cd, (3, 3), padding="SAME", use_bias=False, name=f"res{i}_conv1")(h)
            r = MaskedBatchNorm(name=f"res{i}_bn1")(r, use_running_average=not train)
            r = fnn.relu(r)
            r = fnn.Conv(cd, (3, 3), padding="SAME", use_bias=False, name=f"res{i}_conv2")(r)
            r = MaskedBatchNorm(name=f"res{i}_bn2")(r, use_running_average=not train)
            h = h + r
        return h


class Decoder(fnn.Module):
    """8x8x64 -> 64x64x3 image (generator_app.py:864-899)."""

    conv_dim: int = 64

    @fnn.compact
    def __call__(self, h, train: bool = True):
        cd = self.conv_dim
        h = fnn.Conv(cd * 4, (3, 3), padding="SAME", use_bias=False, name="c0")(h)
        h = MaskedBatchNorm(name="bn0")(h, use_running_average=not train)
        h = fnn.relu(h)
        for i, feat in enumerate((cd * 4, cd * 2, cd)):
            h = fnn.ConvTranspose(
                feat, (4, 4), (2, 2), padding="SAME", use_bias=False, name=f"dc{i + 1}"
            )(h)
            h = MaskedBatchNorm(name=f"bn{i + 1}")(h, use_running_average=not train)
            h = fnn.relu(h)
        return fnn.Conv(3, (7, 7), padding=[(3, 3), (3, 3)], name="c4")(h)


class Layout2ImGenerator(fnn.Module):
    """Full CVAE-GAN generator (generator_app.py:902-962). The context
    attention in LayoutEncoder makes this the Generator_context variant;
    both reference classes are byte-identical anyway.

    Returns the reference 8-tuple as a dict:
    crops_input, crops_input_rec, crops_rand, img_rec, img_rand, mu, logvar,
    z_rand_rec.
    """

    num_classes: int
    embedding_dim: int = 64
    z_dim: int = 8
    obj_size: int = 32
    fusion: str = "transformer"  # or "convlstm" (upstream baseline)

    def setup(self):
        self.crop_encoder = CropEncoder(self.num_classes, z_dim=self.z_dim)
        self.layout_encoder = LayoutEncoder(
            self.num_classes, z_dim=self.z_dim,
            embedding_dim=self.embedding_dim, fusion=self.fusion,
        )
        self.decoder = Decoder()

    def sample(self, labels, boxes, masks, z_rand):
        """Layout-to-image sampling (no input image): layout encoder +
        decoder on random z — the reference's img_rand pathway
        (generator_app.py:920-923) as a standalone inference entry.
        Use via apply(..., method=Layout2ImGenerator.sample)."""
        valid = (labels != 0).astype(jnp.float32)
        h = self.layout_encoder(labels, masks, z_rand, valid, train=False, deterministic=True)
        return self.decoder(h, train=False)

    def __call__(self, images, labels, boxes, masks, z_rand, rng, train: bool = True,
                 deterministic: bool = True):
        """images: (b, 64, 64, 3); labels: (b, o); boxes: (b, o, 4) xywh;
        masks: (b, o, 64, 64); z_rand: (b, o, z_dim)."""
        valid = (labels != 0).astype(jnp.float32)
        crop_enc = self.crop_encoder
        layout_enc = self.layout_encoder
        decoder = self.decoder

        rng1, rng2 = jax.random.split(rng)
        crops_input = crop_boxes(images, boxes, self.obj_size)
        z_rec, mu, logvar = crop_enc(crops_input, labels, valid, rng1, train)

        h_rec = layout_enc(labels, masks, z_rec, valid, train, deterministic)
        h_rand = layout_enc(labels, masks, z_rand, valid, train, deterministic)

        img_rec = decoder(h_rec, train)
        img_rand = decoder(h_rand, train)

        crops_rand = crop_boxes(img_rand, boxes, self.obj_size)
        _, z_rand_rec, _ = crop_enc(crops_rand, labels, valid, rng2, train)
        crops_input_rec = crop_boxes(img_rec, boxes, self.obj_size)

        return {
            "crops_input": crops_input,
            "crops_input_rec": crops_input_rec,
            "crops_rand": crops_rand,
            "img_rec": img_rec,
            "img_rand": img_rand,
            "mu": mu,
            "logvar": logvar,
            "z_rand_rec": z_rand_rec,
            "valid": valid,
        }


# ---------------------------------------------------------------------------
# Discriminators
# ---------------------------------------------------------------------------


class _PlainBlock(fnn.Module):
    """OptimizedBlock / ResidualBlock (discriminator_app.py:29-99), optional SN."""

    out_ch: int
    downsample: bool = False
    pre_activation: bool = True  # False for the first (Optimized) block
    spectral: bool = True

    @fnn.compact
    def __call__(self, x, update_stats: bool = True):
        from layout2img_tpu.nn.spectral import SNConv

        def conv(feat, k, name):
            if self.spectral:
                return SNConv(feat, (k, k), name=name)
            return fnn.Conv(feat, (k, k), padding="SAME" if k > 1 else "VALID", name=name)

        def apply_conv(mod, h):
            return mod(h, update_stats=update_stats) if self.spectral else mod(h)

        in_ch = x.shape[-1]
        h = x
        if self.pre_activation:
            h = fnn.relu(h)
            h = apply_conv(conv(in_ch, 3, "conv1"), h)
            h = fnn.relu(h)
            h = apply_conv(conv(self.out_ch, 3, "conv2"), h)
        else:
            h = apply_conv(conv(self.out_ch, 3, "conv1"), h)
            h = fnn.relu(h)
            h = apply_conv(conv(self.out_ch, 3, "conv2"), h)
        if self.downsample:
            h = fnn.avg_pool(h, (2, 2), (2, 2))
        sc = x
        if in_ch != self.out_ch or self.downsample:
            if self.pre_activation:
                sc = apply_conv(conv(self.out_ch, 1, "sc"), sc)
                if self.downsample:
                    sc = fnn.avg_pool(sc, (2, 2), (2, 2))
            else:
                if self.downsample:
                    sc = fnn.avg_pool(sc, (2, 2), (2, 2))
                sc = apply_conv(conv(self.out_ch, 1, "sc"), sc)
        return h + sc


class Layout2ImImageDiscriminator(fnn.Module):
    """64px image critic (discriminator_app.py:102-132)."""

    conv_dim: int = 64
    spectral: bool = True

    @fnn.compact
    def __call__(self, images, update_stats: bool = True):
        from layout2img_tpu.nn.spectral import SNDense

        cd = self.conv_dim
        h = _PlainBlock(cd, True, pre_activation=False, spectral=self.spectral, name="block1")(
            images, update_stats
        )
        for i, feat in enumerate((cd * 2, cd * 4, cd * 8, cd * 16)):
            h = _PlainBlock(feat, True, spectral=self.spectral, name=f"block{i + 2}")(
                h, update_stats
            )
        h = jnp.sum(fnn.relu(h), axis=(1, 2))
        if self.spectral:
            return SNDense(1, use_bias=False, name="classifier")(h, update_stats=update_stats)[..., 0]
        return fnn.Dense(1, use_bias=False, name="classifier")(h)[..., 0]


class Layout2ImObjectDiscriminator(fnn.Module):
    """Object critic + AC-GAN classifier + Gram appearance head
    (discriminator_app.py:135-187). Operates on padded (b, o) crops."""

    num_classes: int
    conv_dim: int = 64
    spectral: bool = True

    @fnn.compact
    def __call__(self, crops, labels, update_stats: bool = True):
        from layout2img_tpu.nn.spectral import SNDense, SNEmbed

        b, o = labels.shape
        x = crops.reshape(b * o, *crops.shape[2:])
        lab = labels.reshape(-1)
        cd = self.conv_dim

        # appearance head on shallow features
        a = _PlainBlock(cd, False, pre_activation=False, spectral=self.spectral, name="app_block1")(
            x, update_stats
        )
        a = _PlainBlock(cd * 2, True, spectral=self.spectral, name="app_block2")(a, update_stats)
        a = fnn.relu(a)
        n, hh, ww, c = a.shape
        af = a.reshape(n, hh * ww, c)
        gram = jnp.einsum("npc,npd->ncd", af, af) / c
        if self.spectral:
            app_y = SNEmbed(self.num_classes, c, name="l_y_app")(lab, update_stats=update_stats)
        else:
            app_y = fnn.Embed(self.num_classes, c, name="l_y_app")(lab)
        app_all = jnp.concatenate([gram, jnp.broadcast_to(app_y[:, None, :], (n, c, c))], -1)
        if self.spectral:
            out_app = SNDense(1, name="app")(app_all, update_stats=update_stats)[..., 0]
        else:
            out_app = fnn.Dense(1, name="app")(app_all)[..., 0]
        out_app = (jnp.sum(out_app, axis=1) / c).reshape(b, o)

        h = _PlainBlock(cd, False, pre_activation=False, spectral=self.spectral, name="block1")(
            x, update_stats
        )
        for i, feat in enumerate((cd * 2, cd * 4, cd * 8, cd * 16)):
            h = _PlainBlock(feat, True, spectral=self.spectral, name=f"block{i + 2}")(
                h, update_stats
            )
        h = jnp.sum(fnn.relu(h), axis=(1, 2))  # (n, 16cd)
        # note: the reference creates an l_y projection embedding but never
        # uses it in forward (discriminator_app.py:163-164 vs :168-187) —
        # vestigial, intentionally omitted here.
        if self.spectral:
            out_src = SNDense(1, name="classifier_src")(h, update_stats=update_stats)[..., 0]
            out_cls = SNDense(self.num_classes, name="classifier_cls")(h, update_stats=update_stats)
        else:
            out_src = fnn.Dense(1, name="classifier_src")(h)[..., 0]
            out_cls = fnn.Dense(self.num_classes, name="classifier_cls")(h)
        return {
            "object": out_src.reshape(b, o),
            "class_logits": out_cls.reshape(b, o, self.num_classes),
            "app": out_app,
        }
