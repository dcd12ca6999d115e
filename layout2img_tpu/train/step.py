"""One jitted GAN train step (D update + G update).

Mirrors the reference loop (``train_ours_d.py:119-150``) functionally:

- D hinge on real/fake for image, object, and (optionally) appearance heads;
- G adversarial + L1 pixel + VGG perceptual;
- Adam(0, 0.999) for both nets; per-object terms masked over valid objects
  (reference filters label != 0 dynamically).

TPU-native structure: the generator forward runs ONCE via ``jax.vjp`` — the
same fake batch feeds the D update (stop-gradient) and the G update (pullback
with the G-loss cotangent), exactly like torch autograd graph reuse, instead
of re-tracing G twice. Spectral-norm power iterations per step match torch:
3 on D (real, fake-detached, fake-for-G), 1 on G; G batch stats update once.
With ``config.fused_d`` the real/fake D passes fuse into one 2b-batch apply
(score-identical; D runs 2 power iterations per step instead of 3).
With ``config.remat`` ("g"/"d"/"gd") the G forward and/or each D apply are
wrapped in ``jax.checkpoint`` — numerically identical, trades recompute for
activation HBM to unlock larger per-chip batches.

Under a `jax.sharding` mesh, jit with the batch sharded over 'data' and
params replicated — BN stats and gradient means become cross-replica
automatically (see parallel/).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from layout2img_tpu.losses.gan import g_adv, hinge_d_fake, hinge_d_real
from layout2img_tpu.train.state import GANTrainState, TrainConfig


def make_train_step(
    generator,
    discriminator,
    config: TrainConfig,
    vgg_loss: Callable | None = None,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {"images": (b,s,s,3), "boxes": (b,o,4), "labels": (b,o)}.
    """

    from layout2img_tpu.utils.casting import cast_floating

    compute_dtype = jnp.bfloat16 if config.mixed_precision else jnp.float32

    def cast(tree):
        return cast_floating(tree, compute_dtype)

    def d_apply(d_p, d_st, imgs, bxs, lbls):
        return discriminator.apply(
            {"params": d_p, **d_st}, imgs, bxs, lbls, mutable=["spectral"]
        )

    if "d" in config.remat:
        # recompute D activations in the backward pass instead of storing them
        d_apply = jax.checkpoint(d_apply)

    def train_step(state: GANTrainState, batch: dict, rng: jax.Array):
        images, boxes, labels = batch["images"], batch["boxes"], batch["labels"]
        images = images.astype(compute_dtype)
        b, o = labels.shape
        rng_z, rng_zim, rng_drop = jax.random.split(rng, 3)
        z = jax.random.normal(rng_z, (b, o, config.z_dim), compute_dtype)
        z_im = jax.random.normal(rng_zim, (b, config.z_dim), compute_dtype)

        # G object budget: compact valid slots to the front and run the whole
        # step (G forward AND D) on the first K — exact when K covers every
        # valid object since pad slots contribute exactly zero to the image
        # (see TrainConfig.g_obj_budget for the eligibility caveats: v2 mask
        # trunk + corrected attention only). z is drawn at full width first
        # so the per-slot draws match the unbudgeted step bit-for-bit.
        budget_metrics = {}
        if 0 < config.g_obj_budget < o:
            # live truncation rate: fraction of layouts this step whose valid
            # count exceeds the budget (those lose objects from the IMAGE) —
            # surfaces silent semantic drift in the metric stream
            budget_metrics["g_budget_overflow"] = jnp.mean(
                (jnp.sum(labels != 0, axis=1) > config.g_obj_budget)
                .astype(jnp.float32))
            g_order = jnp.argsort((labels == 0).astype(jnp.int32), axis=1,
                                  stable=True)[:, : config.g_obj_budget]
            labels = jnp.take_along_axis(labels, g_order, axis=1)
            boxes = jnp.take_along_axis(boxes, g_order[:, :, None], axis=1)
            z = jnp.take_along_axis(z, g_order[:, :, None], axis=1)
            o = config.g_obj_budget

        valid = (labels != 0).astype(jnp.float32)

        # D object budget: compact the valid slots to the front (stable sort
        # keeps their order) and give D only the first K — pad slots carry
        # zero weight in the masked hinges, so this is exact when K covers
        # every valid object, and it skips the RoI/object/app-head work the
        # reference (ragged lists) never did either. G still draws all o.
        d_boxes, d_labels, d_valid = boxes, labels, valid
        if 0 < config.d_obj_budget < o:
            # truncation rate for D's view (overflow objects escape D only)
            budget_metrics["d_budget_overflow"] = jnp.mean(
                (jnp.sum(labels != 0, axis=1) > config.d_obj_budget)
                .astype(jnp.float32))
            order = jnp.argsort((labels == 0).astype(jnp.int32), axis=1,
                                stable=True)[:, : config.d_obj_budget]
            d_labels = jnp.take_along_axis(labels, order, axis=1)
            d_boxes = jnp.take_along_axis(boxes, order[:, :, None], axis=1)
            d_valid = (d_labels != 0).astype(jnp.float32)

        # ---- generator forward (single evaluation, vjp for the G update) ----
        # deterministic=False + dropout rng: training runs with the model's
        # dropout ACTIVE (reference nets train with GCN 0.5 / PSP 0.1
        # dropout; torch .train() enables them)
        def g_apply(g_params, g_state, z, boxes, labels, z_im, rng_drop):
            return generator.apply(
                {"params": cast(g_params), **g_state},
                z, boxes, labels, z_im,
                train=True, update_stats=True, deterministic=False,
                rngs={"dropout": rng_drop},
                mutable=["batch_stats", "spectral"],
            )

        if "g" in config.remat:
            g_apply = jax.checkpoint(g_apply)

        def g_forward(g_params):
            return g_apply(g_params, state.g_state, z, boxes, labels, z_im, rng_drop)

        fake, g_vjp, g_new_state = jax.vjp(g_forward, state.g_params, has_aux=True)
        fake_sg = jax.lax.stop_gradient(fake)

        # ---- D update ----
        def d_loss_fn(d_params):
            d_p = cast(d_params)
            if config.fused_d:
                # one apply on the concatenated 2b batch: same scores (no
                # cross-sample coupling), one spectral power iteration
                out, ds = d_apply(
                    d_p, state.d_state,
                    jnp.concatenate([images, fake_sg]),
                    jnp.concatenate([d_boxes, d_boxes]),
                    jnp.concatenate([d_labels, d_labels]),
                )
                out_r = {k: v[:b] for k, v in out.items()}
                out_f = {k: v[b:] for k, v in out.items()}
            else:
                out_r, ds = d_apply(d_p, state.d_state, images, d_boxes, d_labels)
                out_f, ds = d_apply(d_p, ds, fake_sg, d_boxes, d_labels)
            metrics = {
                "d_loss_real": hinge_d_real(out_r["image"]),
                "d_loss_fake": hinge_d_fake(out_f["image"]),
                "d_loss_robj": hinge_d_real(out_r["object"], d_valid),
                "d_loss_fobj": hinge_d_fake(out_f["object"], d_valid),
            }
            loss = config.lamb_obj * (
                metrics["d_loss_robj"] + metrics["d_loss_fobj"]
            ) + config.lamb_img * (metrics["d_loss_real"] + metrics["d_loss_fake"])
            if "app" in out_r:
                rapp = hinge_d_real(out_r["app"], d_valid)
                fapp = hinge_d_fake(out_f["app"], d_valid)
                loss = loss + config.lamb_app * (rapp + fapp)
                metrics |= {"d_loss_rapp": rapp, "d_loss_fapp": fapp}
            return loss, (ds, metrics)

        (d_loss, (d_state, d_metrics)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_params)
        d_updates, d_opt_state = state.d_tx.update(
            d_grads, state.d_opt_state, state.d_params
        )
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- G update (uses the freshly-updated D, like the reference) ----
        def g_loss_from_fake(fake_img):
            out_g, ds = d_apply(cast(d_params), d_state, fake_img, d_boxes, d_labels)
            metrics = {
                "g_loss_fake": g_adv(out_g["image"]),
                "g_loss_obj": g_adv(out_g["object"], d_valid),
            }
            loss = (config.lamb_obj * metrics["g_loss_obj"]
                    + config.lamb_img * metrics["g_loss_fake"])
            if "app" in out_g:
                gapp = g_adv(out_g["app"], d_valid)
                loss = loss + config.lamb_app * gapp
                metrics["g_loss_app"] = gapp
            if config.use_pixel_loss:
                pixel = jnp.mean(jnp.abs(fake_img - images).astype(jnp.float32))
                loss = loss + pixel
                metrics["pixel_loss"] = pixel
            if config.use_vgg_loss and vgg_loss is not None:
                # under mixed precision the VGG stack runs bf16 like G/D
                # (taps' L1 means still accumulate f32 inside VGGLoss)
                feat = vgg_loss(fake_img, images,
                                dtype=compute_dtype if config.mixed_precision else None)
                loss = loss + feat
                metrics["feat_loss"] = feat
            return loss, (ds, metrics)

        (g_loss, (d_state, g_metrics)), fake_grad = jax.value_and_grad(
            g_loss_from_fake, has_aux=True
        )(fake)
        (g_grads,) = g_vjp(fake_grad)
        g_updates, g_opt_state = state.g_tx.update(
            g_grads, state.g_opt_state, state.g_params
        )
        g_params = optax.apply_updates(state.g_params, g_updates)

        ema_params = state.ema_params
        if config.ema_decay > 0 and ema_params is not None:
            from layout2img_tpu.train.ema import ema_update

            ema_params = ema_update(ema_params, g_params, config.ema_decay)

        metrics = {"d_loss": d_loss, "g_loss": g_loss} | d_metrics | g_metrics | budget_metrics
        new_state = state.replace(
            step=state.step + 1,
            ema_params=ema_params,
            g_params=g_params,
            g_state=g_new_state,
            d_params=d_params,
            d_state=d_state,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
        )
        return new_state, metrics

    return train_step


def make_sample_fn(generator, config: TrainConfig, truncation: float = 2.0,
                   dtype=jnp.float32, obj_budget: int = 0) -> Callable:
    """Inference sampler: truncated-normal z (reference ``utils/util.py:39-45``
    rejection loop -> ``jax.random.truncated_normal``), eval-mode BN.

    dtype=jnp.bfloat16 (with bf16-cast params) is the serving-precision
    variant (~+10% on Ours-D VG at b8); boxes stay f32 for coordinate
    precision either way.

    obj_budget > 0 compacts the valid object slots to the front and runs G
    on the first K only — identical images when K covers every valid object
    (v2 mask trunk + corrected attention only; see TrainConfig.g_obj_budget).
    z keeps its full-width per-slot draws, so a layout renders the same
    image with or without the budget."""

    def sample(g_params, g_state, boxes, labels, rng):
        b, o = labels.shape
        rng_z, rng_zim = jax.random.split(rng)
        z = jax.random.truncated_normal(
            rng_z, -truncation, truncation, (b, o, config.z_dim), dtype
        )
        z_im = jax.random.truncated_normal(
            rng_zim, -truncation, truncation, (b, config.z_dim), dtype
        )
        if 0 < obj_budget < o:
            order = jnp.argsort((labels == 0).astype(jnp.int32), axis=1,
                                stable=True)[:, :obj_budget]
            labels = jnp.take_along_axis(labels, order, axis=1)
            boxes = jnp.take_along_axis(boxes, order[:, :, None], axis=1)
            z = jnp.take_along_axis(z, order[:, :, None], axis=1)
        return generator.apply(
            {"params": g_params, **g_state},
            z, boxes, labels, z_im,
            train=False, update_stats=False,
        )

    return sample
