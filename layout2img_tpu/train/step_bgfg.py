"""Train step for the two-stream Ours-ED (64px fg/bg) model.

The reference's shipped trainers for this family are broken (missing
``model/rcnn_discriminator.py`` import, ``train_ours.py:18``; undefined
``ROIAlign`` in the 64px D — SURVEY.md section 2.7). This is the working
equivalent of the intended loop (``train_ours.py:118-150`` template): split
fg/bg latents and layouts feed the two streams; the 64px discriminator
critiques the composite against the full layout; hinge + L1 + perceptual.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from layout2img_tpu.losses.gan import g_adv, hinge_d_fake, hinge_d_real
from layout2img_tpu.train.state import GANTrainState, TrainConfig


def create_bgfg_state(
    rng: jax.Array, generator, discriminator, example_batch: dict, config: TrainConfig
) -> GANTrainState:
    """Initialize the two-stream G (8 inputs) + 64px D and their optimizers.
    example_batch must carry the fg/bg splits (data.coco.split_fg_bg_batch)."""
    b, o = example_batch["labels"].shape
    z = jnp.zeros((b, o, config.z_dim))
    z_im = jnp.zeros((b, config.z_dim))
    g_vars = dict(jax.jit(generator.init)(
        rng, z, example_batch["boxes_fg"], example_batch["labels_fg"],
        z, example_batch["boxes_bg"], example_batch["labels_bg"], z_im, z_im,
    ))
    d_vars = dict(jax.jit(discriminator.init)(
        rng, example_batch["images"], example_batch["boxes"], example_batch["labels"]
    ))
    g_params, d_params = g_vars.pop("params"), d_vars.pop("params")
    g_tx = optax.adam(config.g_lr, b1=config.beta1, b2=config.beta2)
    d_tx = optax.adam(config.d_lr, b1=config.beta1, b2=config.beta2)
    return GANTrainState(
        step=jnp.zeros((), jnp.int32), g_params=g_params, g_state=g_vars,
        d_params=d_params, d_state=d_vars,
        g_opt_state=jax.jit(g_tx.init)(g_params),
        d_opt_state=jax.jit(d_tx.init)(d_params), g_tx=g_tx, d_tx=d_tx,
    )


def make_bgfg_sample_fn(generator, config: TrainConfig, truncation: float = 2.0,
                        dtype=None) -> Callable:
    """Inference sampler for the two-stream model: independent truncated-
    normal latents per stream, eval-mode BN. dtype=jnp.bfloat16 (with
    bf16-cast params) is the serving-precision variant."""
    dtype = dtype or jnp.float32

    def sample(g_params, g_state, batch: dict, rng: jax.Array):
        b, o = batch["labels"].shape
        rngs = jax.random.split(rng, 4)
        t = truncation
        z_f = jax.random.truncated_normal(rngs[0], -t, t, (b, o, config.z_dim), dtype)
        z_b = jax.random.truncated_normal(rngs[1], -t, t, (b, o, config.z_dim), dtype)
        z_im_f = jax.random.truncated_normal(rngs[2], -t, t, (b, config.z_dim), dtype)
        z_im_b = jax.random.truncated_normal(rngs[3], -t, t, (b, config.z_dim), dtype)
        return generator.apply(
            {"params": g_params, **g_state},
            z_f, batch["boxes_fg"], batch["labels_fg"],
            z_b, batch["boxes_bg"], batch["labels_bg"],
            z_im_f, z_im_b,
            train=False, update_stats=False,
        )

    return sample


def make_bgfg_train_step(
    generator, discriminator, config: TrainConfig, vgg_loss: Callable | None = None
) -> Callable:
    """batch keys: images, labels, boxes, labels_fg, boxes_fg, labels_bg,
    boxes_bg (see data.coco.split_fg_bg)."""

    def train_step(state: GANTrainState, batch: dict, rng: jax.Array):
        images = batch["images"]
        b, o = batch["labels"].shape
        rngs = jax.random.split(rng, 5)
        z_f = jax.random.normal(rngs[0], (b, o, config.z_dim), images.dtype)
        z_b = jax.random.normal(rngs[1], (b, o, config.z_dim), images.dtype)
        z_im_f = jax.random.normal(rngs[2], (b, config.z_dim), images.dtype)
        z_im_b = jax.random.normal(rngs[3], (b, config.z_dim), images.dtype)
        valid = (batch["labels"] != 0).astype(jnp.float32)

        def g_forward(g_params):
            # deterministic=False + dropout rng: torch .train() semantics
            # (matters only when a context module with dropout is enabled)
            fake, new_state = generator.apply(
                {"params": g_params, **state.g_state},
                z_f, batch["boxes_fg"], batch["labels_fg"],
                z_b, batch["boxes_bg"], batch["labels_bg"],
                z_im_f, z_im_b,
                train=True, update_stats=True, deterministic=False,
                rngs={"dropout": rngs[4]},
                mutable=["batch_stats", "spectral"],
            )
            return fake, new_state

        fake, g_vjp, g_new_state = jax.vjp(g_forward, state.g_params, has_aux=True)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            out_r, ds = discriminator.apply(
                {"params": d_params, **state.d_state},
                images, batch["boxes"], batch["labels"], mutable=["spectral"],
            )
            out_f, ds = discriminator.apply(
                {"params": d_params, **ds}, fake_sg, batch["boxes"], batch["labels"],
                mutable=["spectral"],
            )
            loss = config.lamb_obj * (
                hinge_d_real(out_r["object"], valid) + hinge_d_fake(out_f["object"], valid)
            ) + config.lamb_img * (
                hinge_d_real(out_r["image"]) + hinge_d_fake(out_f["image"])
            )
            return loss, ds

        (d_loss, d_state), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params
        )
        d_updates, d_opt_state = state.d_tx.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        def g_loss_from_fake(fake_img):
            out_g, ds = discriminator.apply(
                {"params": d_params, **d_state}, fake_img, batch["boxes"], batch["labels"],
                mutable=["spectral"],
            )
            loss = config.lamb_obj * g_adv(out_g["object"], valid) + config.lamb_img * g_adv(
                out_g["image"]
            )
            metrics = {"g_loss_fake": g_adv(out_g["image"]), "g_loss_obj": g_adv(out_g["object"], valid)}
            if config.use_pixel_loss:
                pixel = jnp.mean(jnp.abs(fake_img - images))
                loss = loss + pixel
                metrics["pixel_loss"] = pixel
            if config.use_vgg_loss and vgg_loss is not None:
                feat = vgg_loss(fake_img, images)
                loss = loss + feat
                metrics["feat_loss"] = feat
            return loss, (ds, metrics)

        (g_loss, (d_state, g_metrics)), fake_grad = jax.value_and_grad(
            g_loss_from_fake, has_aux=True
        )(fake)
        (g_grads,) = g_vjp(fake_grad)
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
