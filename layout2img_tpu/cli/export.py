"""Export a trained generator as a serialized StableHLO artifact for serving.

The reference has no deployment story beyond .pth files + a Python stack.
Here the full sampling function (truncated-normal z + generator forward,
params baked in) exports via ``jax.export`` to a portable artifact that any
JAX-compatible runtime (or IFRT/PJRT serving stack) can load without the
model code.

Usage:
  python -m layout2img_tpu.cli.export --model context_app_v2 --ckpt_dir ... \
      --out model.stablehlo --batch_size 8
  # load + run:
  python -m layout2img_tpu.cli.export --run model.stablehlo
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="context_app_v2")
    p.add_argument("--dataset", default="coco", choices=["coco", "vg", "synthetic"])
    p.add_argument("--ckpt_dir", default="")
    p.add_argument("--out", default="generator.stablehlo")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--img_size", type=int, default=128)
    p.add_argument("--ch", type=int, default=64)
    p.add_argument("--truncation", type=float, default=2.0)
    p.add_argument("--bf16", action="store_true",
                   help="bake bfloat16 params/latents into the artifact "
                        "(serving precision; boxes stay f32)")
    p.add_argument("--run", default="", help="load an exported artifact and run one batch")
    return p.parse_args(argv)


def main(argv=None):
    from jax import export as jexport

    args = parse_args(argv)
    if args.run:
        import os

        with open(args.run, "rb") as f:
            exp = jexport.deserialize(bytearray(f.read()))
        meta = {}
        if os.path.exists(args.run + ".json"):
            with open(args.run + ".json") as f:
                meta = json.load(f)
        b = meta.get("batch_size", 8)
        o = meta.get("num_objects", 8)
        rng = np.random.default_rng(0)
        boxes = jnp.asarray(
            np.concatenate([rng.random((b, o, 2)) * 0.5, rng.random((b, o, 2)) * 0.4 + 0.1], -1
                           ).astype(np.float32))
        labels = jnp.asarray(rng.integers(1, meta.get("num_classes", 184), (b, o)).astype(np.int32))
        imgs = exp.call(boxes, labels, jnp.asarray(np.asarray([0], np.uint32)))
        print("ran exported artifact:", imgs.shape, "range",
              float(imgs.min()), float(imgs.max()))
        return

    from layout2img_tpu.cli.presets import EXPERIMENTS, dataset_spec
    from layout2img_tpu.models.discriminators import make_discriminator
    from layout2img_tpu.models.generators import make_generator
    from layout2img_tpu.train.checkpoint import CheckpointManager
    from layout2img_tpu.train.state import TrainConfig, create_train_state

    exp_cfg = EXPERIMENTS[args.model]
    num_classes, num_objects = dataset_spec(args.dataset)
    gen = make_generator(exp_cfg.gen_preset, num_classes, ch=args.ch, image_size=args.img_size)

    b, o = args.batch_size, num_objects
    z = jnp.zeros((b, o, 128))
    boxes0 = jnp.full((b, o, 4), 0.25)
    labels0 = jnp.ones((b, o), jnp.int32)
    z_im = jnp.zeros((b, 128))
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), z, boxes0, labels0, z_im)

    if args.ckpt_dir:
        disc = make_discriminator(exp_cfg.disc_preset, num_classes, ch=args.ch,
                                  image_size=args.img_size)
        cfg = TrainConfig(use_vgg_loss=False)
        batch = {"images": jnp.zeros((b, args.img_size, args.img_size, 3)),
                 "labels": labels0, "boxes": boxes0}
        state = create_train_state(jax.random.PRNGKey(0), gen, disc, batch, cfg)
        state = CheckpointManager(args.ckpt_dir).restore(state)
        # prefer EMA weights when the checkpoint carries them, matching
        # cli.sample — the artifact must serve the same images
        params = state.ema_params if state.ema_params is not None else state.g_params
        g_state = state.g_state
    else:
        print("WARNING: no --ckpt_dir; exporting randomly-initialized params")
        variables = dict(variables)
        params = variables.pop("params")
        g_state = variables

    frozen = {"params": params, **g_state}
    frozen = jax.tree_util.tree_map(jnp.asarray, frozen)
    zdt = jnp.float32
    if args.bf16:
        from layout2img_tpu.utils.casting import cast_floating

        zdt = jnp.bfloat16
        frozen["params"] = cast_floating(frozen["params"], jnp.bfloat16)

    def serve(boxes, labels, seed):
        rng = jax.random.PRNGKey(seed[0])
        rng_z, rng_zim = jax.random.split(rng)
        zz = jax.random.truncated_normal(rng_z, -args.truncation, args.truncation, (b, o, 128), zdt)
        zi = jax.random.truncated_normal(rng_zim, -args.truncation, args.truncation, (b, 128), zdt)
        return gen.apply(frozen, zz, boxes, labels, zi, train=False, update_stats=False)

    exported = jexport.export(jax.jit(serve))(
        jax.ShapeDtypeStruct((b, o, 4), jnp.float32),
        jax.ShapeDtypeStruct((b, o), jnp.int32),
        jax.ShapeDtypeStruct((1,), jnp.uint32),
    )
    data = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(data)
    with open(args.out + ".json", "w") as f:
        json.dump(
            {"batch_size": b, "num_objects": o, "num_classes": num_classes,
             "img_size": args.img_size, "model": args.model}, f)
    print(f"exported {args.model} -> {args.out} ({len(data) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
