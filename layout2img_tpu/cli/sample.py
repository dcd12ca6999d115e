"""Sampling CLI — covers the reference's test_* scripts
(template: ``test_app.py:44-103``): load a G checkpoint, iterate val
layouts, draw ``--num_img`` truncated-normal samples per layout, write JPEGs
named ``sample{idx}_numb{j}.jpg``. Batched (the reference samples one image
at a time)."""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="context_app_v2")
    p.add_argument("--dataset", default="coco", choices=["coco", "vg", "synthetic"])
    p.add_argument("--ckpt_dir", default="", help="orbax checkpoint dir")
    p.add_argument("--torch_ckpt", default="", help="reference .pth generator checkpoint")
    p.add_argument("--sample_path", default="./samples")
    p.add_argument("--num_img", type=int, default=5)
    p.add_argument("--img_size", type=int, default=0,
                   help="0 = the model preset's native size")
    p.add_argument("--ch", type=int, default=64)
    p.add_argument("--l2i_fusion", default="transformer",
                   choices=["transformer", "convlstm", "transformer_decoder",
                            "transformer_noctx"],
                   help="layout2im fusion variant — must match training")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_layouts", type=int, default=0)
    p.add_argument("--truncation", type=float, default=2.0)
    p.add_argument("--obj_budget", type=int, default=0,
                   help="serve only the first K valid-compacted object slots "
                        "per layout (0 = all). Identical images when K >= "
                        "the layout's valid object count; big win on padded "
                        "VG layouts (o=31, ~6-10 real). v2-mask-trunk + "
                        "corrected-attention models only")
    p.add_argument("--bf16", action="store_true",
                   help="serve in bfloat16 (params + latents; boxes stay "
                        "f32) — ~+10%% throughput on the 128px models")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--coco_image_dir", default="datasets/coco/images/val2017")
    p.add_argument("--coco_instances", default="datasets/coco/annotations/instances_val2017.json")
    p.add_argument("--coco_stuff", default="datasets/coco/annotations/stuff_val2017.json")
    p.add_argument("--vg_vocab", default="datasets/vg/vocab.json")
    p.add_argument("--vg_h5", default="datasets/vg/val.h5")
    p.add_argument("--vg_image_dir", default="datasets/vg/images")
    return p.parse_args(argv)


def pad_tail(batch, target):
    """Edge-pad a ragged final batch to the compiled shape (one static
    shape => no second multi-minute compile for the tail)."""
    n = np.asarray(batch["labels"]).shape[0]
    if n == target:
        return batch, n
    reps = np.concatenate([np.arange(n), np.full(target - n, n - 1)])
    return {k: np.asarray(v)[reps] for k, v in batch.items()}, n


def _checked_budget(args, gen) -> int:
    """Validate --obj_budget eligibility for this generator (exactness
    requires the v2 mask trunk and the corrected attention concat)."""
    if not args.obj_budget:
        return 0
    from layout2img_tpu.models.generators import obj_budget_error

    why = obj_budget_error(gen)
    if why is not None:
        raise SystemExit(f"--obj_budget is not exact for this model: {why}")
    return args.obj_budget


def main(argv=None):
    import PIL.Image

    from layout2img_tpu.cli.presets import EXPERIMENTS, dataset_spec
    from layout2img_tpu.cli.train import build_dataset
    from layout2img_tpu.models.discriminators import make_discriminator
    from layout2img_tpu.models.generators import make_generator
    from layout2img_tpu.train.checkpoint import CheckpointManager
    from layout2img_tpu.train.state import TrainConfig, create_train_state
    from layout2img_tpu.train.step import make_sample_fn

    args = parse_args(argv)
    if args.obj_budget and args.model in EXPERIMENTS and EXPERIMENTS[args.model].special:
        # the special samplers (ours_ed / layout2im) have no object-budget
        # path; refuse rather than silently serve unbudgeted
        raise SystemExit(
            f"--obj_budget is a LostGAN-family flag; --model {args.model} "
            f"has no object-budget serving path")
    sample_dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    num_classes, num_objects = dataset_spec(args.dataset)
    cfg = TrainConfig(use_vgg_loss=False)

    exp_size = EXPERIMENTS[args.model].image_size
    if args.img_size == 0:
        args.img_size = exp_size  # build the model at its native size
    args.steps_per_epoch = 4
    if args.model == "ours_ed":
        args.fg_bg = True
    # eval protocol: plain val split, in order, no flip doubling, keep tail
    loader = build_dataset(args, num_objects, eval_mode=True)
    example, _ = pad_tail(next(iter(loader)), args.batch_size)
    if args.model == "ours_ed":
        from layout2img_tpu.data.coco import split_fg_bg_batch

        example = split_fg_bg_batch(example)
    example = jax.tree_util.tree_map(jnp.asarray, example)

    if args.model == "layout2im":
        if not args.ckpt_dir:
            raise SystemExit("layout2im sampling requires --ckpt_dir")
        from layout2img_tpu.models.layout2im import (
            Layout2ImGenerator,
            Layout2ImImageDiscriminator,
            Layout2ImObjectDiscriminator,
        )
        from layout2img_tpu.ops.bbox import bbox_mask
        from layout2img_tpu.train.step_layout2im import (
            Layout2ImConfig,
            create_layout2im_state,
        )

        gen = Layout2ImGenerator(num_classes=num_classes, fusion=args.l2i_fusion)
        l2i_cfg = Layout2ImConfig()
        state = create_layout2im_state(
            jax.random.PRNGKey(0), gen,
            Layout2ImImageDiscriminator(conv_dim=args.ch),
            Layout2ImObjectDiscriminator(num_classes=num_classes, conv_dim=args.ch),
            example, l2i_cfg,
        )
        state = CheckpointManager(args.ckpt_dir).restore(state)

        def sample(g_params, g_state, boxes, labels, rng):
            b, o = labels.shape
            z = jax.random.truncated_normal(
                rng, -args.truncation, args.truncation, (b, o, l2i_cfg.z_dim),
                sample_dtype,
            )
            # masks in the serving dtype — f32 masks would promote the whole
            # trunk back to f32 one op after the latents enter
            masks = bbox_mask(boxes, 64, 64).astype(sample_dtype)
            return gen.apply(
                {"params": g_params, **g_state}, labels, boxes, masks, z,
                method=Layout2ImGenerator.sample,
            )

        sample = jax.jit(sample)
    elif args.model == "ours_ed":
        if not args.ckpt_dir:
            raise SystemExit("ours_ed sampling requires --ckpt_dir")
        from layout2img_tpu.models.discriminators import make_discriminator
        from layout2img_tpu.models.generators import BgFgGenerator
        from layout2img_tpu.train.step_bgfg import (
            create_bgfg_state,
            make_bgfg_sample_fn,
        )

        gen = BgFgGenerator(num_fg_classes=91, num_bg_classes=num_classes - 91, ch=args.ch)
        disc = make_discriminator("d64", num_classes, ch=args.ch)
        state = create_bgfg_state(jax.random.PRNGKey(0), gen, disc, example, cfg)
        state = CheckpointManager(args.ckpt_dir).restore(state)
        sample = jax.jit(make_bgfg_sample_fn(gen, cfg, truncation=args.truncation,
                                             dtype=sample_dtype))
    elif args.torch_ckpt:
        # run a reference .pth directly: legacy_attention reproduces the
        # reference's attention-concat scramble its checkpoints need
        import torch

        from layout2img_tpu.utils.torch_import import import_lostgan_generator

        exp = EXPERIMENTS[args.model]
        gen = make_generator(exp.gen_preset, num_classes, ch=args.ch,
                             image_size=args.img_size, legacy_attention=True)
        variables = import_lostgan_generator(torch.load(args.torch_ckpt, map_location="cpu"))

        class _GState:
            g_params = variables["params"]
            g_state = {k: v for k, v in variables.items() if k != "params"}

        state = _GState()
        sample = jax.jit(make_sample_fn(gen, cfg, truncation=args.truncation,
                                        dtype=sample_dtype,
                                        obj_budget=_checked_budget(args, gen)))
    else:
        if not args.ckpt_dir:
            raise SystemExit("provide --ckpt_dir or --torch_ckpt")
        exp = EXPERIMENTS[args.model]
        gen = make_generator(exp.gen_preset, num_classes, ch=args.ch, image_size=args.img_size)
        disc = make_discriminator(exp.disc_preset, num_classes, ch=args.ch, image_size=args.img_size)
        state = create_train_state(jax.random.PRNGKey(0), gen, disc, example, cfg)
        state = CheckpointManager(args.ckpt_dir).restore(state)
        sample = jax.jit(make_sample_fn(gen, cfg, truncation=args.truncation,
                                        dtype=sample_dtype,
                                        obj_budget=_checked_budget(args, gen)))
    os.makedirs(args.sample_path, exist_ok=True)

    # prefer EMA weights when the checkpoint carries them (--ema_decay training)
    g_params = state.g_params
    if getattr(state, "ema_params", None) is not None:
        g_params = state.ema_params
    if args.bf16:
        from layout2img_tpu.utils.casting import cast_floating

        g_params = cast_floating(g_params, jnp.bfloat16)

    # multi-chip serving: when several devices are visible, shard the layout
    # batch over a 1-D data mesh (params replicated) — same jit, GSPMD splits
    # the work; numerics identical (eval-mode BN, no cross-sample coupling).
    # A batch that does not divide the device count is padded UP to the next
    # multiple (pad layouts are generated and discarded), so serving never
    # silently drops to one device.
    g_state = state.g_state
    n_dev = len(jax.devices())
    compiled_bs = args.batch_size
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from layout2img_tpu.parallel.mesh import make_mesh

        compiled_bs = -(-args.batch_size // n_dev) * n_dev
        mesh = make_mesh()
        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P("data"))
        g_params = jax.device_put(g_params, repl)
        g_state = jax.device_put(g_state, repl)
        # one direct host->sharded transfer per leaf (a jnp.asarray followed
        # by a resharding device_put would cost 2 dispatches per leaf on the
        # ~1 s/dispatch remote-TPU transport)
        _put = lambda tree: jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), data_sh), tree)
        pad_note = (f" (batch padded {args.batch_size} -> {compiled_bs})"
                    if compiled_bs != args.batch_size else "")
        print(f"sampling data-parallel over {n_dev} devices{pad_note}")
    else:
        _put = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)

    # prep once per batch (split + H2D of only the keys the sampler reads),
    # reused across all num_img draws
    if args.model == "ours_ed":
        from layout2img_tpu.data.coco import split_fg_bg_batch

        def prep(batch):
            sb = split_fg_bg_batch(batch)
            keys = ("labels", "boxes_fg", "labels_fg", "boxes_bg", "labels_bg")
            return _put({k: sb[k] for k in keys})

        def draw(prepped, srng):
            return sample(g_params, g_state, prepped, srng)
    else:
        def prep(batch):
            return _put((batch["boxes"], batch["labels"]))

        def draw(prepped, srng):
            return sample(g_params, g_state, *prepped, srng)

    rng = jax.random.PRNGKey(args.seed)
    idx = 0
    for batch in loader:
        batch, n = pad_tail(batch, compiled_bs)
        prepped = prep(batch)
        for j in range(args.num_img):
            rng, srng = jax.random.split(rng)
            imgs = np.asarray(draw(prepped, srng))[:n]
            imgs = np.clip(imgs * 0.5 + 0.5, 0, 1)
            for k in range(imgs.shape[0]):
                out = (imgs[k] * 255).astype(np.uint8)
                PIL.Image.fromarray(out).save(
                    os.path.join(args.sample_path, f"sample{idx + k}_numb{j}.jpg")
                )
        idx += n
        if args.max_layouts and idx >= args.max_layouts:
            break
    print(f"wrote {idx} layouts x {args.num_img} samples to {args.sample_path}")


if __name__ == "__main__":
    main()
