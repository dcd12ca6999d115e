"""Export a trained Orbax checkpoint as reference-format torch ``.pth`` files.

The inverse of ``cli.sample --torch_ckpt`` / ``cli.train --torch_ckpt_g``:
a model trained in this framework is written back out as state_dicts the
REFERENCE code loads with ``strict=True`` — its test scripts
(``test_app.py:49-64``) and resume workflow (``train_context_app_v2.py:71-104``)
— so results can be cross-checked in the original torch stack.

Usage:
  python -m layout2img_tpu.cli.export_torch --model context_app_v2 \
      --ckpt_dir runs/flagship/ckpt --out_g G_200.pth --out_d D_200.pth

G export prefers EMA weights when the checkpoint carries them (pass
--no_ema for the raw weights). D is written with the reference's ``obD.``
inner-module prefix so ``CombineDiscriminator*`` wrappers load it directly.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="context_app_v2")
    p.add_argument("--dataset", default="coco", choices=["coco", "vg", "synthetic"])
    p.add_argument("--ckpt_dir", required=True, help="orbax checkpoint dir")
    p.add_argument("--out_g", default="", help="output .pth for the generator")
    p.add_argument("--out_d", default="", help="output .pth for the discriminator")
    p.add_argument("--ch", type=int, default=64)
    p.add_argument("--img_size", type=int, default=0,
                   help="0 = the model preset's native size")
    p.add_argument("--no_ema", action="store_true",
                   help="export raw G weights even if EMA weights exist")
    p.add_argument("--module_prefix", action="store_true",
                   help="prepend 'module.' (DataParallel-style save)")
    return p.parse_args(argv)


def main(argv=None):
    import torch

    from layout2img_tpu.cli.presets import EXPERIMENTS, dataset_spec
    from layout2img_tpu.data.synthetic import SyntheticLayoutDataset
    from layout2img_tpu.models.discriminators import make_discriminator
    from layout2img_tpu.models.generators import BgFgGenerator, make_generator
    from layout2img_tpu.train.checkpoint import CheckpointManager
    from layout2img_tpu.train.state import TrainConfig, create_train_state
    from layout2img_tpu.utils.torch_export import (
        export_bgfg_generator,
        export_lostgan_discriminator,
        export_lostgan_generator,
    )

    args = parse_args(argv)
    if not args.out_g and not args.out_d:
        raise SystemExit("nothing to do: pass --out_g and/or --out_d")
    if args.model == "layout2im":
        raise SystemExit(
            "layout2im has no torch export: the reference's layout2im fork "
            "stores checkpoints in a different format (SURVEY.md §2.3)"
        )

    exp = EXPERIMENTS[args.model]
    num_classes, num_objects = dataset_spec(args.dataset)
    img_size = args.img_size or exp.image_size
    cfg = TrainConfig(use_vgg_loss=False)
    example = next(iter(SyntheticLayoutDataset(2, img_size, num_objects, seed=0, steps=1)))

    prefix = "module." if args.module_prefix else ""
    if args.model == "ours_ed":
        from layout2img_tpu.data.coco import split_fg_bg_batch
        from layout2img_tpu.train.step_bgfg import create_bgfg_state

        example = split_fg_bg_batch(example)
        gen = BgFgGenerator(num_fg_classes=91, num_bg_classes=num_classes - 91, ch=args.ch)
        disc = make_discriminator("d64", num_classes, ch=args.ch)
        state = create_bgfg_state(jax.random.PRNGKey(0), gen, disc, example, cfg)
        state = CheckpointManager(args.ckpt_dir).restore(state)
        export_g = lambda v: export_bgfg_generator(v, prefix=prefix)
    else:
        gen = make_generator(exp.gen_preset, num_classes, ch=args.ch, image_size=img_size)
        disc = make_discriminator(exp.disc_preset, num_classes, ch=args.ch, image_size=img_size)
        state = create_train_state(jax.random.PRNGKey(0), gen, disc, example, cfg)
        state = CheckpointManager(args.ckpt_dir).restore(state)
        res_start = 2 if exp.gen_preset == "lostgan64" else 1
        export_g = lambda v: export_lostgan_generator(v, res_start=res_start, prefix=prefix)

    def save(sd: dict[str, np.ndarray], path: str) -> None:
        # copy=True: jax-backed arrays are read-only, which torch tensors reject
        torch.save({k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()}, path)

    if args.out_g:
        g_params = state.g_params
        if not args.no_ema and getattr(state, "ema_params", None) is not None:
            g_params = state.ema_params
        save(export_g({"params": g_params, **state.g_state}), args.out_g)
        print(f"wrote generator -> {args.out_g}")
    if args.out_d:
        sd = export_lostgan_discriminator(
            {"params": state.d_params, **state.d_state}, prefix=prefix + "obD."
        )
        save(sd, args.out_d)
        print(f"wrote discriminator -> {args.out_d}")


if __name__ == "__main__":
    main()
