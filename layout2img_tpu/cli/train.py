"""Training CLI — covers the reference's train_* scripts with one entry
point (flags mirror ``train_ours_d.py:190-206``; model choice via --model).

Examples:
  python -m layout2img_tpu.cli.train --model context_app_v2 --dataset coco \
      --coco_image_dir ... --coco_instances ... --coco_stuff ...
  python -m layout2img_tpu.cli.train --model ours_d --dataset synthetic \
      --total_epoch 1 --steps_per_epoch 20       # smoke run, no data needed
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="context_app_v2", help="experiment preset")
    p.add_argument("--dataset", default="coco", choices=["coco", "vg", "synthetic"])
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--total_epoch", type=int, default=200)
    p.add_argument("--d_lr", type=float, default=1e-4)
    p.add_argument("--g_lr", type=float, default=1e-4)
    p.add_argument("--out_path", default="./outputs/tmp")
    p.add_argument("--img_size", type=int, default=128)
    p.add_argument("--ch", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--save_every_epochs", type=int, default=5)
    p.add_argument("--log_every", type=int, default=500)
    p.add_argument("--steps_per_epoch", type=int, default=0, help="synthetic only")
    p.add_argument("--no_vgg", action="store_true")
    # data paths
    p.add_argument("--coco_image_dir", default="datasets/coco/images/train2017")
    p.add_argument("--coco_instances", default="datasets/coco/annotations/instances_train2017.json")
    p.add_argument("--coco_stuff", default="datasets/coco/annotations/stuff_train2017.json")
    p.add_argument("--vg_vocab", default="datasets/vg/vocab.json")
    p.add_argument("--vg_h5", default="datasets/vg/train.h5")
    p.add_argument("--vg_image_dir", default="datasets/vg/images")
    p.add_argument("--vgg_weights", default="", help="torchvision vgg19 .pth for perceptual loss")
    return p.parse_args(argv)


def build_dataset(args, num_objects):
    from layout2img_tpu.data.coco import CocoLayoutDataset, HostDataLoader
    from layout2img_tpu.data.synthetic import SyntheticLayoutDataset
    from layout2img_tpu.data.vg import VgLayoutDataset

    if args.dataset == "coco":
        ds = CocoLayoutDataset(
            args.coco_image_dir, args.coco_instances, args.coco_stuff,
            image_size=args.img_size, left_right_flip=True,
        )
        return HostDataLoader(ds, args.batch_size, seed=args.seed)
    if args.dataset == "vg":
        ds = VgLayoutDataset(
            args.vg_vocab, args.vg_h5, args.vg_image_dir,
            image_size=args.img_size, max_objects=num_objects - 1, left_right_flip=True,
        )
        return HostDataLoader(ds, args.batch_size, seed=args.seed)
    steps = args.steps_per_epoch or 50
    return SyntheticLayoutDataset(
        args.batch_size, args.img_size, num_objects, seed=args.seed, steps=steps
    )


def main(argv=None):
    from layout2img_tpu.cli.presets import EXPERIMENTS, dataset_spec
    from layout2img_tpu.losses.perceptual import VGGLoss, load_torch_vgg19_features
    from layout2img_tpu.models.discriminators import make_discriminator
    from layout2img_tpu.models.generators import make_generator
    from layout2img_tpu.parallel.mesh import jit_train_step, make_mesh, replicate, shard_batch
    from layout2img_tpu.train.checkpoint import CheckpointManager
    from layout2img_tpu.train.state import TrainConfig, create_train_state
    from layout2img_tpu.train.step import make_train_step
    from layout2img_tpu.utils.logging import MetricWriter, setup_logger

    args = parse_args(argv)
    exp = EXPERIMENTS[args.model]
    num_classes, num_objects = dataset_spec(args.dataset)
    out_dir = os.path.join(args.out_path, args.dataset, str(args.img_size), args.model)
    logger = setup_logger("layout2img_tpu", out_dir)
    writer = MetricWriter(out_dir)

    gen = make_generator(exp.gen_preset, num_classes, ch=args.ch, image_size=args.img_size)
    disc = make_discriminator(exp.disc_preset, num_classes, ch=args.ch, image_size=args.img_size)

    loader = build_dataset(args, num_objects)
    cfg = TrainConfig(g_lr=args.g_lr, d_lr=args.d_lr, use_vgg_loss=not args.no_vgg)
    vgg = None
    if cfg.use_vgg_loss:
        params = load_torch_vgg19_features(args.vgg_weights) if args.vgg_weights else None
        if params is None:
            logger.warning("no --vgg_weights given; using fixed-seed random VGG filters")
        vgg = VGGLoss(params)

    example = next(iter(loader))
    example = jax.tree_util.tree_map(jnp.asarray, example)
    state = create_train_state(jax.random.PRNGKey(args.seed), gen, disc, example, cfg)

    ckpt = CheckpointManager(os.path.join(out_dir, "ckpt"))
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        logger.info("resumed from step %d", int(state.step))

    mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    logger.info("training %s on %s: %d device(s), batch %d", args.model, args.dataset, n_dev, args.batch_size)
    step_fn = jit_train_step(make_train_step(gen, disc, cfg, vgg_loss=vgg), mesh)
    state = replicate(mesh, state)

    rng = jax.random.PRNGKey(args.seed + 1)
    global_step = int(jax.device_get(state.step))
    for epoch in range(args.total_epoch):
        for batch in loader:
            batch = shard_batch(mesh, {k: v for k, v in batch.items() if k in ("images", "labels", "boxes")})
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, batch, replicate(mesh, step_rng))
            global_step += 1
            if global_step % args.log_every == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                logger.info("epoch %d step %d: %s", epoch + 1, global_step,
                            {k: round(v, 4) for k, v in m.items()})
                writer.write(global_step, m)
        if (epoch + 1) % args.save_every_epochs == 0:
            ckpt.save(jax.device_get(state))
            logger.info("saved checkpoint at epoch %d (step %d)", epoch + 1, global_step)
    ckpt.save(jax.device_get(state))
    writer.close()
    logger.info("done: %d steps", global_step)


if __name__ == "__main__":
    main()
