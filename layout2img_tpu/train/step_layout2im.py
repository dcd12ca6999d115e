"""Train step for the layout2im CVAE-GAN family.

The reference ships the models (``model_layout2img/``) but no runnable
trainer (its ``test_layout2img.py`` imports nonexistent packages). This
implements the layout2im training objective the models were built for
(zhaobozb/layout2im, CVPR'19), extended with this fork's appearance head:

  L_G = l1 * ||img_rec - img||_1 + kl * KL(q(z|crop) || N(0,1))
      + z_rec * ||z_rand_rec - z_rand||_1
      + adv(img_rec) + adv(img_rand) + adv_obj(crops) + adv_app(crops)
      + cls * CE(class_logits, labels)
  L_D = hinge on real/rec/rand images, real/fake crops (+ app), + CE aux.

All per-object terms are masked over valid slots.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from layout2img_tpu.losses.gan import g_adv, hinge_d_fake, hinge_d_real, masked_mean
from layout2img_tpu.ops.bbox import bbox_mask


@dataclasses.dataclass(frozen=True)
class Layout2ImConfig:
    z_dim: int = 8
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    beta1: float = 0.0
    beta2: float = 0.999
    lamb_img_rec: float = 1.0
    lamb_kl: float = 0.01
    lamb_z_rec: float = 10.0
    lamb_obj: float = 1.0
    lamb_app: float = 1.0
    lamb_img: float = 1.0
    lamb_cls: float = 1.0


# Reuse the generic GANTrainState container from train.state
from layout2img_tpu.train.state import GANTrainState  # noqa: E402


def create_layout2im_state(rng, generator, d_img, d_obj, example_batch, cfg: Layout2ImConfig):
    b, o = example_batch["labels"].shape
    rng_g, rng_d1, rng_d2, rng_z = jax.random.split(rng, 4)
    masks = bbox_mask(example_batch["boxes"], 64, 64)
    z_rand = jax.random.normal(rng_z, (b, o, cfg.z_dim))

    g_vars = jax.jit(generator.init)(
        rng_g, example_batch["images"], example_batch["labels"], example_batch["boxes"],
        masks, z_rand, rng_z,
    )
    from layout2img_tpu.ops.interp import crop_boxes

    crops = crop_boxes(example_batch["images"], example_batch["boxes"], 32)
    di_vars = jax.jit(d_img.init)(rng_d1, example_batch["images"])
    do_vars = jax.jit(d_obj.init)(rng_d2, crops, example_batch["labels"])

    def split(v):
        v = dict(v)
        return v.pop("params"), v

    g_params, g_state = split(g_vars)
    di_params, di_state = split(di_vars)
    do_params, do_state = split(do_vars)
    d_params = {"img": di_params, "obj": do_params}
    d_state = {"img": di_state, "obj": do_state}

    g_tx = optax.adam(cfg.lr_g, b1=cfg.beta1, b2=cfg.beta2)
    d_tx = optax.adam(cfg.lr_d, b1=cfg.beta1, b2=cfg.beta2)
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        g_state=g_state,
        d_params=d_params,
        d_state=d_state,
        g_opt_state=jax.jit(g_tx.init)(g_params),
        d_opt_state=jax.jit(d_tx.init)(d_params),
        g_tx=g_tx,
        d_tx=d_tx,
    )


def make_layout2im_train_step(generator, d_img, d_obj, cfg: Layout2ImConfig) -> Callable:
    from layout2img_tpu.ops.interp import crop_boxes

    def d_apply(d_params, d_state, images_list, crops_list, labels):
        """Run image D on each image and object D on each crop set."""
        img_scores = []
        ds_img = d_state["img"]
        for img in images_list:
            s, ds_img = d_img.apply(
                {"params": d_params["img"], **ds_img}, img, mutable=["spectral"]
            )
            img_scores.append(s)
        obj_outs = []
        ds_obj = d_state["obj"]
        for crops in crops_list:
            out, ds_obj = d_obj.apply(
                {"params": d_params["obj"], **ds_obj}, crops, labels, mutable=["spectral"]
            )
            obj_outs.append(out)
        return img_scores, obj_outs, {"img": ds_img, "obj": ds_obj}

    def train_step(state: GANTrainState, batch: dict, rng: jax.Array):
        images, labels, boxes = batch["images"], batch["labels"], batch["boxes"]
        b, o = labels.shape
        valid = (labels != 0).astype(jnp.float32)
        masks = bbox_mask(boxes, 64, 64)
        rng_z, rng_vae, rng_drop = jax.random.split(rng, 3)
        z_rand = jax.random.normal(rng_z, (b, o, cfg.z_dim), images.dtype)

        def g_forward(g_params):
            # deterministic=False + dropout rng: the transformer fusion's
            # 0.1 dropout trains active (torch .train() semantics)
            out, new_state = generator.apply(
                {"params": g_params, **state.g_state},
                images, labels, boxes, masks, z_rand, rng_vae,
                train=True, deterministic=False, rngs={"dropout": rng_drop},
                mutable=["batch_stats"],
            )
            return (out["img_rec"], out["img_rand"], out["mu"], out["logvar"], out["z_rand_rec"]), new_state

        (g_out, g_vjp, g_new_state) = jax.vjp(g_forward, state.g_params, has_aux=True)
        img_rec, img_rand, mu, logvar, z_rand_rec = g_out
        img_rec_sg, img_rand_sg = map(jax.lax.stop_gradient, (img_rec, img_rand))

        real_crops = crop_boxes(images, boxes, 32)

        def ce(logits):
            logp = jax.nn.log_softmax(logits)
            pick = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
            return -masked_mean(pick, valid)

        # ---- D update ----
        def d_loss_fn(d_params):
            rec_crops = crop_boxes(img_rec_sg, boxes, 32)
            rand_crops = crop_boxes(img_rand_sg, boxes, 32)
            img_scores, obj_outs, ds = d_apply(
                d_params, state.d_state,
                [images, img_rec_sg, img_rand_sg],
                [real_crops, rec_crops, rand_crops],
                labels,
            )
            real_s, rec_s, rand_s = img_scores
            o_real, o_rec, o_rand = obj_outs
            loss = cfg.lamb_img * (
                hinge_d_real(real_s)
                + 0.5 * (hinge_d_fake(rec_s) + hinge_d_fake(rand_s))
            )
            loss = loss + cfg.lamb_obj * (
                hinge_d_real(o_real["object"], valid)
                + 0.5 * (hinge_d_fake(o_rec["object"], valid) + hinge_d_fake(o_rand["object"], valid))
            )
            loss = loss + cfg.lamb_app * (
                hinge_d_real(o_real["app"], valid)
                + 0.5 * (hinge_d_fake(o_rec["app"], valid) + hinge_d_fake(o_rand["app"], valid))
            )
            loss = loss + cfg.lamb_cls * ce(o_real["class_logits"])
            return loss, ds

        (d_loss, d_state), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt_state = state.d_tx.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- G update ----
        def g_loss_fn(outs):
            img_rec, img_rand, mu, logvar, z_rand_rec = outs
            rec_crops = crop_boxes(img_rec, boxes, 32)
            rand_crops = crop_boxes(img_rand, boxes, 32)
            img_scores, obj_outs, ds = d_apply(
                d_params, d_state, [img_rec, img_rand], [rec_crops, rand_crops], labels
            )
            rec_s, rand_s = img_scores
            o_rec, o_rand = obj_outs

            img_rec_l1 = jnp.mean(jnp.abs(img_rec - images))
            kl_el = 0.5 * (jnp.exp(logvar) + mu**2 - 1.0 - logvar)
            kl = masked_mean(jnp.sum(kl_el, -1), valid)
            z_rec_l1 = masked_mean(
                jnp.mean(jnp.abs(z_rand_rec - z_rand), -1), valid
            )
            adv = cfg.lamb_img * 0.5 * (g_adv(rec_s) + g_adv(rand_s))
            adv = adv + cfg.lamb_obj * 0.5 * (
                g_adv(o_rec["object"], valid) + g_adv(o_rand["object"], valid)
            )
            adv = adv + cfg.lamb_app * 0.5 * (
                g_adv(o_rec["app"], valid) + g_adv(o_rand["app"], valid)
            )
            aux = cfg.lamb_cls * 0.5 * (ce(o_rec["class_logits"]) + ce(o_rand["class_logits"]))
            loss = (
                cfg.lamb_img_rec * img_rec_l1
                + cfg.lamb_kl * kl
                + cfg.lamb_z_rec * z_rec_l1
                + adv
                + aux
            )
            metrics = {
                "img_rec_l1": img_rec_l1,
                "kl": kl,
                "z_rec_l1": z_rec_l1,
                "g_adv": adv,
            }
            return loss, (ds, metrics)

        (g_loss, (d_state, g_metrics)), out_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_out)
        (g_grads,) = g_vjp(out_grads)
        g_updates, g_opt_state = state.g_tx.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        metrics = {"d_loss": d_loss, "g_loss": g_loss} | g_metrics
        return (
            state.replace(
                step=state.step + 1,
                g_params=g_params,
                g_state=g_new_state,
                d_params=d_params,
                d_state=d_state,
                g_opt_state=g_opt_state,
                d_opt_state=d_opt_state,
            ),
            metrics,
        )

    return train_step
