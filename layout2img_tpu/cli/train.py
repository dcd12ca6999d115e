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
    p.add_argument("--img_size", type=int, default=0,
                   help="0 = the preset's native size; other sizes are only "
                        "accepted where a correct model config exists")
    p.add_argument("--ch", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--save_every_epochs", type=int, default=5)
    p.add_argument("--async_ckpt", action="store_true",
                   help="non-blocking checkpointing. Single-process: snapshot "
                        "the state on-device (one jit dispatch) and run the "
                        "D2H transfer + Orbax write in a background thread. "
                        "Multi-host: every host starts the save in step-"
                        "lockstep, Orbax finalizes in background threads with "
                        "coordination-service barriers")
    p.add_argument("--log_every", type=int, default=500)
    p.add_argument("--no_nan_guard", dest="nan_guard", action="store_false",
                   default=True,
                   help="disable the divergence guard: by default the step "
                        "metrics are checked for "
                        "non-finite values at the --log_every cadence; on "
                        "detection, keep the last good checkpoint (skip all "
                        "further saves) and exit with code 3. The reference "
                        "has no failure detection (SURVEY.md 5.3) — a "
                        "diverged run keeps training and overwrites its "
                        "checkpoints with NaN state")
    p.add_argument("--fault_inject_nan_at", type=int, default=0,
                   help="fault injection for drills/tests: poison the "
                        "fetched metrics with NaN from this step on, "
                        "exercising the --nan_guard path end-to-end "
                        "(0 = off)")
    p.add_argument("--tensorboard", action="store_true",
                   help="mirror metrics/image grids into tensorboardX event "
                        "files under <out_dir>/tb (the reference's logging "
                        "surface, train_ours_d.py:171-183)")
    p.add_argument("--steps_per_epoch", type=int, default=0, help="synthetic only")
    p.add_argument("--no_vgg", action="store_true")
    p.add_argument("--mixed_precision", action="store_true")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="generator EMA decay (e.g. 0.999); 0 disables. "
                        "Sampling prefers EMA weights when present.")
    p.add_argument("--fused_d", action="store_true",
                   help="one 2b-batch D apply for real+fake (score-identical)")
    p.add_argument("--remat", default="none", choices=["none", "g", "d", "gd"],
                   help="jax.checkpoint the G forward / D applies (identical "
                        "math; frees activation HBM for larger batches)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="devices per model group on a (data, model) mesh; "
                        "1 = pure data-parallel (default)")
    p.add_argument("--mp_mode", default="tensor", choices=["tensor", "spatial"],
                   help="model-axis sharding: 'tensor' shards param feature "
                        "axes + Adam moments (wider-than-HBM models); "
                        "'spatial' shards the image H axis (larger "
                        "resolutions/batches per chip)")
    p.add_argument("--remat_d_blocks", type=int, default=0,
                   help="remat only the first N D trunk blocks (the big-"
                        "activation ones) — finer-grained than --remat d; "
                        "unlocks batch 192 at 128px with less recompute")
    p.add_argument("--d_obj_budget", type=int, default=0,
                   help="give D only the first K valid-compacted object "
                        "slots per image (0 = all). Exact when K >= the max "
                        "objects per image in the data; on padded VG layouts "
                        "(o=31, ~6-10 real) this skips the pad-slot RoI/"
                        "object-head work the reference never did either")
    p.add_argument("--g_obj_budget", type=int, default=0,
                   help="run the GENERATOR (and D) on only the first K "
                        "valid-compacted object slots (0 = all). Exact when "
                        "K >= the max objects per image; v2-mask-trunk + "
                        "corrected-attention models only. Unlike "
                        "--d_obj_budget, overflow objects are dropped from "
                        "the generated image, not just from D's view")
    p.add_argument("--obj_budget_force", action="store_true",
                   help="accept a --g_obj_budget below the dataset's max "
                        "valid object count (overflow objects then vanish "
                        "from generated images on crowded layouts). Without "
                        "it the guard refuses — the reference's ragged "
                        "label != 0 path never drops an object")
    p.add_argument("--l2i_fusion", default="transformer",
                   choices=["transformer", "convlstm", "transformer_decoder",
                            "transformer_noctx"],
                   help="layout2im fusion variant (generator_app / generator "
                        "baselines / generator1 / generator2)")
    p.add_argument("--torch_ckpt_g", default="",
                   help="reference G .pth to fine-tune from (wires "
                        "legacy_attention automatically; matches the "
                        "reference's resume workflow, train_context_app_v2.py:71-104)")
    p.add_argument("--torch_ckpt_d", default="",
                   help="reference D .pth to fine-tune from")
    p.add_argument("--preempt_sync_every", type=int, default=25,
                   help="multi-host only: steps between cross-host SIGTERM "
                        "polls. Each poll all-reduces the hosts' local "
                        "preemption flags so every process breaks at the SAME "
                        "step before the collective checkpoint save; it also "
                        "host-syncs the dispatch pipeline, so it should stay "
                        "well above 1. Preemption grace must cover "
                        "sync_every steps + one save.")
    p.add_argument("--profile_dir", default="", help="write a jax profiler trace of steps 10-20")
    p.add_argument("--eval_every", type=int, default=0,
                   help="every N steps, sample a frozen real-layout pool and "
                        "log rel-FID (+ IS with --inception_weights) to the "
                        "metric stream — live metric trajectory the reference "
                        "only gets offline via IS.py (train/eval_hook.py)")
    p.add_argument("--eval_n", type=int, default=64,
                   help="images in the frozen eval pool (rounded up to whole "
                        "batches)")
    p.add_argument("--inception_weights", default="",
                   help="torchvision inception_v3 .pth for --eval_every "
                        "(none = fixed-seed random filters; rel-FID is then a "
                        "relative trajectory, IS is skipped)")
    # data paths
    p.add_argument("--coco_image_dir", default="datasets/coco/images/train2017")
    p.add_argument("--coco_instances", default="datasets/coco/annotations/instances_train2017.json")
    p.add_argument("--coco_stuff", default="datasets/coco/annotations/stuff_train2017.json")
    p.add_argument("--vg_vocab", default="datasets/vg/vocab.json")
    p.add_argument("--vg_h5", default="datasets/vg/train.h5")
    p.add_argument("--vg_image_dir", default="datasets/vg/images")
    p.add_argument("--vgg_weights", default="", help="torchvision vgg19 .pth for perceptual loss")
    return p.parse_args(argv)


def build_dataset(args, num_objects, eval_mode: bool = False):
    """eval_mode: no flip doubling, no shuffling, keep the tail batch —
    the reference's test_* protocol iterates the plain val split in order."""
    from layout2img_tpu.data.coco import CocoLayoutDataset, HostDataLoader
    from layout2img_tpu.data.synthetic import SyntheticLayoutDataset
    from layout2img_tpu.data.vg import VgLayoutDataset

    # multi-host: each process loads a disjoint shard of the global batch
    # (batch_size is per-process; see scripts/launch_multihost.py)
    proc = dict(process_id=jax.process_index(), process_count=jax.process_count())
    load = dict(shuffle=not eval_mode, drop_last=not eval_mode)
    if args.dataset == "coco":
        ds = CocoLayoutDataset(
            args.coco_image_dir, args.coco_instances, args.coco_stuff,
            image_size=args.img_size, left_right_flip=not eval_mode,
            fg_bg_split=getattr(args, "fg_bg", False),
        )
        return HostDataLoader(ds, args.batch_size, seed=args.seed, **load, **proc)
    if args.dataset == "vg":
        ds = VgLayoutDataset(
            args.vg_vocab, args.vg_h5, args.vg_image_dir,
            image_size=args.img_size, max_objects=num_objects - 1,
            left_right_flip=not eval_mode,
        )
        return HostDataLoader(ds, args.batch_size, seed=args.seed, **load, **proc)
    steps = args.steps_per_epoch or 50
    return SyntheticLayoutDataset(
        args.batch_size, args.img_size, num_objects,
        seed=args.seed + jax.process_index(), steps=steps,
    )


def check_obj_budgets(loader, args, logger) -> None:
    """Data-driven object-budget guard (VERDICT r4 #2).

    The budgets are exact only when K >= every layout's valid object count;
    the reference's ragged ``label != 0`` path never drops anything
    (rcnn_discriminator_app.py:415-417). So: compute the valid-count
    distribution from the dataset index (no image IO), log it, REFUSE a
    --g_obj_budget below the observed max (overflow objects would vanish
    from generated images) unless --obj_budget_force, and WARN for a
    --d_obj_budget below the max (overflow drops from D's view only).
    The train step additionally logs live truncation rates
    (g/d_budget_overflow in the metric stream, train/step.py)."""
    if not (args.g_obj_budget or args.d_obj_budget):
        return
    ds = getattr(loader, "dataset", loader)
    counts_fn = getattr(ds, "valid_object_counts", None)
    if counts_fn is None:
        logger.warning("dataset %s has no valid-object-count index; object "
                       "budgets are UNCHECKED", type(ds).__name__)
        return
    c = np.asarray(counts_fn())
    if c.size == 0:
        return
    mx = int(c.max())
    logger.info(
        "valid objects per image: max %d, p50 %d, p95 %d, p99 %d (%d layouts)",
        mx, int(np.percentile(c, 50)), int(np.percentile(c, 95)),
        int(np.percentile(c, 99)), c.size)
    for name, k, fatal in (("--g_obj_budget", args.g_obj_budget, True),
                           ("--d_obj_budget", args.d_obj_budget, False)):
        if not k or k >= mx:
            continue
        over = float((c > k).mean()) * 100.0
        msg = (f"{name} {k} is below the dataset's max valid object count "
               f"{mx}: {over:.2f}% of layouts exceed it and lose their "
               f"overflow objects "
               + ("from the GENERATED IMAGE" if fatal else "from D's view only")
               + f"; {name} {mx} is exact")
        if fatal and not args.obj_budget_force:
            raise SystemExit(msg + " (pass --obj_budget_force to accept the drop)")
        logger.warning(msg + (" (accepted via --obj_budget_force)" if fatal else ""))


def warn_known_compile_crash(num_objects: int, per_device_batch: int,
                             d_obj_budget: int, g_obj_budget: int,
                             logger) -> bool:
    """Pre-flight check for a known-fatal compile region (VERDICT r4 #5).

    On this TPU toolchain the UN-budgeted o>=31 D object program at
    per-device batch >= 128 deterministically crashes the remote
    compile helper — after the user has already waited through a 4-12 min
    compile (docs/perf_r4.md, measured 2/2 at VG shape). Warn BEFORE
    compiling and point at the budgets, which shrink the object program
    enough to compile AND run 35% faster. Minimal repro for reporting the
    compiler bug upstream: scripts/repro_compile_crash.py.
    Returns True when the warning fired (for tests)."""
    if jax.default_backend() != "tpu":
        return False
    if num_objects >= 31 and per_device_batch >= 128 and not (
            d_obj_budget or g_obj_budget):
        logger.warning(
            "KNOWN COMPILE CRASH REGION: un-budgeted o=%d at per-device "
            "batch %d has crashed this toolchain's compile helper "
            "deterministically (docs/perf_r4.md). Pass --d_obj_budget 12 "
            "(and --g_obj_budget 12 on eligible models) — it compiles, is "
            "exact when the budget covers the data's max valid object "
            "count, and is the measured VG optimum (230-248 img/s/chip). "
            "Continuing anyway; expect a possible crash after the compile "
            "wait.", num_objects, per_device_batch)
        return True
    return False


def main(argv=None):
    from layout2img_tpu.cli.presets import EXPERIMENTS, dataset_spec
    from layout2img_tpu.data.prefetch import device_prefetch
    from layout2img_tpu.losses.perceptual import VGGLoss, load_torch_vgg19_features
    from layout2img_tpu.models.discriminators import make_discriminator
    from layout2img_tpu.models.generators import make_generator
    from layout2img_tpu.parallel.mesh import (
        batch_sharding,
        jit_train_step,
        make_mesh,
        replicate,
    )
    from layout2img_tpu.train.checkpoint import CheckpointManager
    from layout2img_tpu.train.state import TrainConfig, create_train_state
    from layout2img_tpu.train.step import make_train_step
    from layout2img_tpu.utils.logging import MetricWriter, setup_logger

    args = parse_args(argv)
    if args.model not in EXPERIMENTS:
        raise SystemExit(
            f"unknown --model '{args.model}'. Choices: {', '.join(sorted(EXPERIMENTS))}"
        )
    exp = EXPERIMENTS[args.model]
    if args.img_size == 0:
        args.img_size = exp.image_size
    if exp.special:
        if args.g_obj_budget or args.d_obj_budget:
            # the special trainers (step_bgfg/step_layout2im) have no
            # object-budget path; refuse rather than silently ignore the flag
            raise SystemExit(
                f"--g_obj_budget/--d_obj_budget are LostGAN-family flags; "
                f"--model {args.model} has no object-budget path")
        return main_special(args)
    if args.img_size > exp.image_size:
        # refuse to silently build a wrong upscaled model (e.g. a 256px net
        # without the hard_mask_size=128 occupancy canvas the reference's
        # 256 model uses, resnet_generator_app_v2.py:509-625)
        alt = next(
            (name for name, e in EXPERIMENTS.items()
             if e.image_size == args.img_size and not e.special),
            None,
        )
        hint = f" — use --model {alt}" if alt else ""
        raise SystemExit(
            f"--model {args.model} is a {exp.image_size}px experiment; "
            f"--img_size {args.img_size} has no correct config{hint}. "
            f"(Sizes below {exp.image_size} are accepted as debug runs.)"
        )
    num_classes, num_objects = dataset_spec(args.dataset)
    out_dir = os.path.join(args.out_path, args.dataset, str(args.img_size), args.model)
    rank = jax.process_index()
    logger = setup_logger("layout2img_tpu", out_dir, rank=rank)
    writer = MetricWriter(out_dir, rank=rank, tensorboard=args.tensorboard)

    if (jax.process_count() > 1 and jax.devices()[0].platform == "cpu"
            and jax.config.jax_compilation_cache_dir):
        # The persistent compile cache is structurally ASYMMETRIC in
        # multi-process runs: cache keys embed the process index (measured:
        # the same jitted psum hashes to different keys on p0 and p1) and
        # only process 0 writes entries — so on a warm cache process 0
        # deserializes and dispatches the first train step in seconds while
        # every other process recompiles for minutes. The CPU backend's
        # Gloo collectives hard-fail context init after 30 s of dispatch
        # skew (GetKeyValue() DEADLINE_EXCEEDED), killing the run. Cold
        # compiles are symmetric (measured 3 s skew at a 2 min compile), so
        # the safe multi-process-CPU configuration is no cache at all. TPU
        # collectives have no such init deadline — real pods keep the cache.
        jax.config.update("jax_enable_compilation_cache", False)
        logger.warning(
            "multi-process CPU run: persistent compilation cache disabled "
            "(per-process cache keys make warm-cache dispatch skew exceed "
            "Gloo's 30 s collective-context deadline)")

    gen_overrides = {}
    if args.torch_ckpt_g:
        # reference checkpoints were trained with the attention-concat
        # scramble; reproduce it so the imported weights see their own layout
        gen_overrides["legacy_attention"] = True
    gen = make_generator(exp.gen_preset, num_classes, ch=args.ch,
                         image_size=args.img_size, **gen_overrides)
    disc = make_discriminator(exp.disc_preset, num_classes, ch=args.ch,
                              image_size=args.img_size,
                              remat_blocks=args.remat_d_blocks)

    if args.g_obj_budget:
        from layout2img_tpu.models.generators import obj_budget_error

        why = obj_budget_error(gen)
        if why is not None:
            raise SystemExit(f"--g_obj_budget is not exact for this model: {why}")

    loader = build_dataset(args, num_objects)
    check_obj_budgets(loader, args, logger)
    cfg = TrainConfig(g_lr=args.g_lr, d_lr=args.d_lr, use_vgg_loss=not args.no_vgg,
                      mixed_precision=args.mixed_precision,
                      ema_decay=args.ema_decay, fused_d=args.fused_d,
                      remat=args.remat, d_obj_budget=args.d_obj_budget,
                      g_obj_budget=args.g_obj_budget)
    vgg = None
    if cfg.use_vgg_loss:
        params = load_torch_vgg19_features(args.vgg_weights) if args.vgg_weights else None
        if params is None:
            logger.warning("no --vgg_weights given; using fixed-seed random VGG filters")
        vgg = VGGLoss(params)

    example = next(iter(loader))
    example = jax.tree_util.tree_map(jnp.asarray, example)
    state = create_train_state(jax.random.PRNGKey(args.seed), gen, disc, example, cfg)

    if args.torch_ckpt_g or args.torch_ckpt_d:
        import torch

        from layout2img_tpu.train.state import load_torch_into_state
        from layout2img_tpu.utils.torch_import import (
            import_lostgan_discriminator,
            import_lostgan_generator,
        )

        g_t = (import_lostgan_generator(torch.load(args.torch_ckpt_g, map_location="cpu"))
               if args.torch_ckpt_g else None)
        d_t = (import_lostgan_discriminator(torch.load(args.torch_ckpt_d, map_location="cpu"))
               if args.torch_ckpt_d else None)
        state = load_torch_into_state(state, cfg, g_t, d_t)
        logger.info("fine-tuning from torch checkpoints: G=%s D=%s",
                    args.torch_ckpt_g or "-", args.torch_ckpt_d or "-")

    ckpt = CheckpointManager(
        os.path.join(out_dir, "ckpt"),
        async_save=args.async_ckpt and jax.process_count() > 1)
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        logger.info("resumed from step %d", int(state.step))

    devices = jax.devices()
    n_proc = jax.process_count()
    if args.async_ckpt and n_proc == 1:
        from layout2img_tpu.train.checkpoint import AsyncSaver

        ckpt = AsyncSaver(ckpt)
        save_ckpt = ckpt.save  # snapshots on device; D2H happens in background
    elif n_proc == 1:
        save_ckpt = lambda st: ckpt.save(jax.device_get(st))
    else:
        if args.async_ckpt:
            # Saves still START in step-lockstep on every host (epoch cadence
            # or the OR-reduced preemption stop); only the filesystem write +
            # finalization barrier run in background, over the coordination
            # service rather than XLA collectives (train/checkpoint.py).
            logger.info("multi-host async checkpointing: Orbax finalizes "
                        "writes in background; cross-host barriers ride the "
                        "coordination service, not XLA collectives")
        save_ckpt = ckpt.save

    if n_proc > 1:
        # multi-host: all devices, per-process batch (scripts/launch_multihost.py)
        if (args.batch_size * n_proc) % len(devices):
            raise SystemExit(
                f"global batch {args.batch_size}x{n_proc} not divisible by "
                f"{len(devices)} devices")
        n_dev = len(devices)
    else:
        n_dev = len(devices)
        while args.batch_size % n_dev:
            n_dev -= 1
        if n_dev != len(devices):
            logger.warning(
                "batch %d not divisible by %d devices; using %d",
                args.batch_size, len(devices), n_dev,
            )
    mp = args.model_parallel
    if mp > 1:
        if n_proc > 1:
            raise SystemExit("--model_parallel currently requires a single process")
        if len(devices) % mp:
            raise SystemExit(
                f"{len(devices)} devices not divisible by --model_parallel {mp}")
        n_dev = len(devices)
        n_data = n_dev // mp
        if args.batch_size % n_data:
            raise SystemExit(
                f"batch {args.batch_size} not divisible by the data-parallel "
                f"group count {n_data} ({n_dev} devices / model_parallel {mp})")
        from layout2img_tpu.parallel.mesh import jit_train_step_2d, make_mesh_2d

        mesh = make_mesh_2d(devices, model_parallel=mp)
    else:
        mesh = make_mesh(devices[:n_dev])
    logger.info("training %s on %s: %d process(es), %d device(s), per-process batch %d"
                + (f", model_parallel {mp} ({args.mp_mode})" if mp > 1 else ""),
                args.model, args.dataset, n_proc, n_dev, args.batch_size)
    per_dev_batch = (args.batch_size // (n_dev // mp) if mp > 1
                     else (args.batch_size * n_proc) // n_dev)
    warn_known_compile_crash(num_objects, per_dev_batch,
                             args.d_obj_budget, args.g_obj_budget, logger)
    train_step = make_train_step(gen, disc, cfg, vgg_loss=vgg)
    from layout2img_tpu.train.step import make_sample_fn

    sample_fn = jax.jit(make_sample_fn(gen, cfg))
    if mp > 1:
        step_fn = jit_train_step_2d(train_step, mesh, state, mode=args.mp_mode)
        state = jax.device_put(state, step_fn.state_shardings)
    else:
        step_fn = jit_train_step(train_step, mesh)
        state = replicate(mesh, state)

    rng = jax.random.PRNGKey(args.seed + 1)
    global_step = int(jax.device_get(state.step))
    if n_proc > 1:
        from functools import partial

        from layout2img_tpu.parallel.mesh import shard_host_local_batch

        put_fn = partial(shard_host_local_batch, mesh)
        sharding = None
    elif mp > 1:
        from functools import partial

        from layout2img_tpu.parallel.mesh import shard_batch_2d

        put_fn = partial(shard_batch_2d, mesh, mode=args.mp_mode)
        sharding = None
    else:
        put_fn = None
        sharding = batch_sharding(mesh)
    is_primary = jax.process_index() == 0
    evaluator = None
    eval_barrier = None
    if args.eval_every > 0 and n_proc > 1:
        # Multi-host (VERDICT r4 #7): the eval runs HOST-LOCALLY on process 0
        # (params/EMA are fully replicated, so device_get reads the full
        # value from its own shard; sampling + Inception execute on its
        # addressable devices — zero cross-host collectives). The other
        # hosts must NOT run ahead meanwhile: leaving a train-step
        # collective waiting on process 0 for minutes trips backend
        # deadlines (measured: CPU/Gloo context init hard-fails at 30 s
        # while process 0 compiles Inception). So every host joins a
        # COORDINATION-SERVICE barrier (python-level, no device work — the
        # same channel the async-ckpt finalization uses, train/checkpoint
        # .py) at the deterministic eval cadence; the timeout covers the
        # first-call sample/Inception compiles.
        from orbax.checkpoint import multihost as ocp_multihost

        eval_barrier = ocp_multihost.get_barrier_sync_fn()
    if args.eval_every > 0 and is_primary:
        # The frozen pool is process 0's local data shard.
        import itertools

        from layout2img_tpu.train.eval_hook import PeriodicEval

        n_eval_batches = max(1, -(-args.eval_n // args.batch_size))
        eval_pool = [jax.tree_util.tree_map(np.asarray, b)
                     for b in itertools.islice(iter(loader), n_eval_batches)]
        evaluator = PeriodicEval(sample_fn, eval_pool,
                                 inception_weights=args.inception_weights,
                                 batch_size=args.batch_size, seed=args.seed)
        if not evaluator.real_weights:
            logger.warning(
                "--eval_every without --inception_weights: rel_fid uses "
                "fixed-seed random filters (relative trajectory only)")
        logger.info("periodic eval: %d real images every %d steps"
                    + (" (host-local on process 0)" if n_proc > 1 else ""),
                    evaluator.n_images, args.eval_every)
    if eval_barrier is not None:
        # pool construction above ran Inception on process 0 (minutes of
        # compile); hold every host here so none dispatches the first
        # train-step collective against a busy process 0
        eval_barrier(key="l2i_eval_pool_ready", timeout_ms=3_600_000)
    # Preemption safety (reference: none — a SIGTERM'd run loses everything
    # since its last 5-epoch save): on SIGTERM, finish the current step, save
    # a checkpoint, and exit 0.
    #
    # Multi-host: signal delivery is NOT step-synchronized across hosts —
    # per-host break points could diverge by a step and deadlock a collective
    # train step against the collective Orbax save. So each host only SETS a
    # local flag; every --preempt_sync_every steps the flags are OR-reduced
    # across processes (multihost_utils.process_allgather at a deterministic
    # step cadence, so all processes enter the collective together), and the
    # loop breaks on the REDUCED flag only — every process stops at the same
    # step and the collective save is safe. The poll host-syncs the dispatch
    # pipeline, hence the cadence; single-process checks the local flag every
    # step for free.
    import signal

    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True

    prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    if n_proc > 1:
        from jax.experimental import multihost_utils

        sync_every = max(1, args.preempt_sync_every)

        def should_stop(step: int) -> bool:
            if step % sync_every:
                return False
            flags = multihost_utils.process_allgather(
                np.asarray(preempted["flag"], np.int32))
            return bool(np.asarray(flags).any())
    else:
        def should_stop(step: int) -> bool:
            return preempted["flag"]

    stop = diverged = False
    # Pre-save divergence check (closes the --log_every window: a divergence
    # just after a log point must not reach an epoch/final/preemption save).
    # Metrics are replicated, so every host takes the same branch.
    latest = {"metrics": None, "step": 0}

    def metrics_ok() -> bool:
        if not args.nan_guard or latest["metrics"] is None:
            return True
        m = {k: float(v) for k, v in jax.device_get(latest["metrics"]).items()}
        if args.fault_inject_nan_at and latest["step"] >= args.fault_inject_nan_at:
            m["d_loss"] = float("nan")  # --fault_inject_nan_at drill
        if all(np.isfinite(v) for v in m.values()):
            return True
        logger.error(
            "non-finite metrics at step %d (pre-save check) — divergence; "
            "keeping the last good checkpoint and exiting 3", latest["step"])
        return False

    for epoch in range(args.total_epoch):
        # host batches are assembled + transferred 2 steps ahead in a
        # background thread, landing pre-sharded over the mesh, so H2D
        # overlaps the running step (the reference leans on torch DataLoader
        # worker prefetch, train_ours_d.py:61-63)
        host_batches = (
            {k: v for k, v in b.items() if k in ("images", "labels", "boxes")}
            for b in loader
        )
        for batch in device_prefetch(host_batches, size=2, sharding=sharding,
                                     put_fn=put_fn):
            rng, step_rng = jax.random.split(rng)
            if args.profile_dir and global_step == 10:
                jax.profiler.start_trace(args.profile_dir)
            state, metrics = step_fn(state, batch, replicate(mesh, step_rng))
            global_step += 1
            latest["metrics"], latest["step"] = metrics, global_step
            if args.profile_dir and global_step == 20:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                logger.info("profiler trace written to %s", args.profile_dir)
            if global_step % args.log_every == 0 and (is_primary or args.nan_guard):
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                if args.fault_inject_nan_at and global_step >= args.fault_inject_nan_at:
                    m["d_loss"] = float("nan")  # --fault_inject_nan_at drill
                # Divergence guard: the metrics are replicated (identical on
                # every host), so all processes take this branch at the same
                # step — consistent multi-host exit, no divergent collectives.
                if args.nan_guard and not all(np.isfinite(v) for v in m.values()):
                    diverged = stop = True
                    logger.error(
                        "non-finite metrics at step %d: %s — divergence; "
                        "keeping the last good checkpoint (skipping further "
                        "saves) and exiting 3", global_step,
                        {k: v for k, v in m.items() if not np.isfinite(v)})
                    break
                if is_primary:
                    logger.info("epoch %d step %d: %s", epoch + 1, global_step,
                                {k: round(v, 4) for k, v in m.items()})
                    writer.write(global_step, m)
                if is_primary and n_proc == 1:
                    # sample grid (reference logs real/fake grids every 500
                    # steps); multi-host runs log metrics only — the batch is
                    # sharded over non-addressable devices
                    host_state = jax.device_get(state)
                    sample_params = (host_state.ema_params
                                     if host_state.ema_params is not None
                                     else host_state.g_params)
                    fakes = sample_fn(sample_params, host_state.g_state,
                                      batch["boxes"], batch["labels"],
                                      jax.random.PRNGKey(global_step))
                    writer.write_images(global_step, "fake", jax.device_get(fakes)[:16])
                    writer.write_images(global_step, "real", jax.device_get(batch["images"])[:16])
            if args.eval_every > 0 and global_step % args.eval_every == 0:
                if evaluator is not None:
                    host_state = jax.device_get(state)
                    em = {k: float(v) for k, v in evaluator(host_state).items()}
                    writer.write(global_step, em)
                    logger.info("eval step %d: %s", global_step,
                                {k: round(v, 4) for k, v in em.items()})
                if eval_barrier is not None:
                    # deterministic cadence: every host (evaluating or not)
                    # waits here, so none runs ahead while process 0 is busy
                    eval_barrier(key=f"l2i_eval_{global_step}",
                                 timeout_ms=3_600_000)
            if should_stop(global_step):
                stop = True
                break
        if stop:
            if not diverged:
                logger.info(
                    "SIGTERM%s: saving checkpoint at step %d and exiting",
                    f" (synchronized across {n_proc} processes)" if n_proc > 1 else "",
                    global_step)
            break
        if (epoch + 1) % args.save_every_epochs == 0:
            if not metrics_ok():
                diverged = True
                break
            save_ckpt(state)
            logger.info("saved checkpoint at epoch %d (step %d)", epoch + 1, global_step)
    if not diverged:
        if metrics_ok():
            save_ckpt(state)
        else:
            diverged = True
    getattr(ckpt, "wait", lambda: None)()  # drain any in-flight async save
    if prev_handler is not None:
        # None = a non-Python handler we cannot reinstall — leave ours then
        signal.signal(signal.SIGTERM, prev_handler)
    writer.close()
    if diverged:
        raise SystemExit(3)
    logger.info("done: %d steps", global_step)


def main_special(args):
    """Training paths for the Ours-ED fg/bg and layout2im families.

    Single-process, multi-chip: like main(), the train step is jitted over a
    1-D data mesh (batch sharded, params replicated; GSPMD inserts the
    gradient/BN collectives). The reference wraps these trainers in
    nn.DataParallel too (train_ours.py:71-73,
    train_ours_layout2img.py:70-72); multi-PROCESS launch stays refused —
    there is no collective checkpoint path for these families.
    """
    from layout2img_tpu.cli.presets import dataset_spec
    from layout2img_tpu.parallel.mesh import (
        jit_train_step,
        make_mesh,
        replicate,
        shard_batch,
    )
    from layout2img_tpu.utils.logging import MetricWriter, setup_logger

    if jax.process_count() > 1:
        # These trainers have no mesh/collective path: N processes would
        # train N independent divergent states and race them into one
        # checkpoint dir. Refuse rather than corrupt (ADVICE r3: the
        # unconditional SIGTERM handler + async saves here were also only
        # correct single-process).
        raise SystemExit(
            f"--model {args.model} is a single-process trainer; launch it "
            f"without scripts/launch_multihost.py / jax.distributed")
    if args.img_size not in (0, 64):
        raise SystemExit(f"--model {args.model} is a 64px family; got --img_size {args.img_size}")
    args.img_size = 64
    num_classes, num_objects = dataset_spec(args.dataset)
    out_dir = os.path.join(args.out_path, args.dataset, str(args.img_size), args.model)
    rank = jax.process_index()
    logger = setup_logger("layout2img_tpu", out_dir, rank=rank)
    writer = MetricWriter(out_dir, rank=rank, tensorboard=args.tensorboard)
    rng = jax.random.PRNGKey(args.seed)

    devices = jax.devices()
    n_dev = len(devices)
    while args.batch_size % n_dev:
        n_dev -= 1
    if n_dev != len(devices):
        logger.warning("batch %d not divisible by %d devices; using %d",
                       args.batch_size, len(devices), n_dev)
    mesh = make_mesh(devices[:n_dev])
    logger.info("training %s on %s: %d device(s), batch %d",
                args.model, args.dataset, n_dev, args.batch_size)

    if args.model == "ours_ed":
        from layout2img_tpu.data.coco import split_fg_bg_batch
        from layout2img_tpu.losses.perceptual import VGGLoss, load_torch_vgg19_features
        from layout2img_tpu.models.discriminators import make_discriminator
        from layout2img_tpu.models.generators import BgFgGenerator
        from layout2img_tpu.train.state import TrainConfig
        from layout2img_tpu.train.step_bgfg import create_bgfg_state, make_bgfg_train_step

        args.fg_bg = True
        loader = build_dataset(args, num_objects)

        gen = BgFgGenerator(num_fg_classes=91, num_bg_classes=num_classes - 91, ch=args.ch)
        disc = make_discriminator("d64", num_classes, ch=args.ch)
        cfg = TrainConfig(g_lr=args.g_lr, d_lr=args.d_lr, use_vgg_loss=not args.no_vgg,
                          mixed_precision=args.mixed_precision)
        vgg = None
        if cfg.use_vgg_loss:
            params = load_torch_vgg19_features(args.vgg_weights) if args.vgg_weights else None
            vgg = VGGLoss(params)

        example = split_fg_bg_batch(next(iter(loader)))
        example = jax.tree_util.tree_map(jnp.asarray, example)
        state = create_bgfg_state(rng, gen, disc, example, cfg)
        step_fn = jit_train_step(make_bgfg_train_step(gen, disc, cfg, vgg_loss=vgg), mesh)
        prepare = split_fg_bg_batch
    else:  # layout2im
        from layout2img_tpu.models.layout2im import (
            Layout2ImGenerator,
            Layout2ImImageDiscriminator,
            Layout2ImObjectDiscriminator,
        )
        from layout2img_tpu.train.step_layout2im import (
            Layout2ImConfig,
            create_layout2im_state,
            make_layout2im_train_step,
        )

        loader = build_dataset(args, num_objects)
        gen = Layout2ImGenerator(num_classes=num_classes, fusion=args.l2i_fusion)
        d_img = Layout2ImImageDiscriminator(conv_dim=args.ch)
        d_obj = Layout2ImObjectDiscriminator(num_classes=num_classes, conv_dim=args.ch)
        l2i_cfg = Layout2ImConfig(lr_g=args.g_lr, lr_d=args.d_lr)
        example = jax.tree_util.tree_map(jnp.asarray, next(iter(loader)))
        state = create_layout2im_state(rng, gen, d_img, d_obj, example, l2i_cfg)
        step_fn = jit_train_step(make_layout2im_train_step(gen, d_img, d_obj, l2i_cfg), mesh)
        prepare = lambda b: b

    evaluator = None
    if args.eval_every > 0:
        # Same frozen-pool rel-FID/IS hook as main(), with family-appropriate
        # samplers: these take the WHOLE batch (ours_ed needs the fg/bg-split
        # label/box fields; layout2im builds its masks from the boxes), so
        # PeriodicEval runs in batch_mode. Single-process by construction
        # (main_special refuses multi-process above).
        import itertools

        from layout2img_tpu.train.eval_hook import PeriodicEval

        if args.model == "ours_ed":
            from layout2img_tpu.train.step_bgfg import make_bgfg_sample_fn

            eval_sample = jax.jit(make_bgfg_sample_fn(gen, cfg))
        else:
            from layout2img_tpu.models.layout2im import Layout2ImGenerator
            from layout2img_tpu.ops.bbox import bbox_mask

            def _l2i_sample(g_params, g_state, batch, rng):
                b, o = batch["labels"].shape
                z = jax.random.truncated_normal(
                    rng, -2.0, 2.0, (b, o, l2i_cfg.z_dim), jnp.float32)
                masks = bbox_mask(batch["boxes"], 64, 64)
                return gen.apply(
                    {"params": g_params, **g_state},
                    batch["labels"], batch["boxes"], masks, z,
                    method=Layout2ImGenerator.sample)

            eval_sample = jax.jit(_l2i_sample)
        n_eval_batches = max(1, -(-args.eval_n // args.batch_size))
        eval_pool = [jax.tree_util.tree_map(np.asarray, prepare(b))
                     for b in itertools.islice(iter(loader), n_eval_batches)]
        evaluator = PeriodicEval(eval_sample, eval_pool,
                                 inception_weights=args.inception_weights,
                                 batch_size=args.batch_size, seed=args.seed,
                                 batch_mode=True)
        if not evaluator.real_weights:
            logger.warning(
                "--eval_every without --inception_weights: rel_fid uses "
                "fixed-seed random filters (relative trajectory only)")
        logger.info("periodic eval: %d real images every %d steps",
                    evaluator.n_images, args.eval_every)

    from layout2img_tpu.train.checkpoint import AsyncSaver, CheckpointManager

    ckpt = CheckpointManager(os.path.join(out_dir, "ckpt"))
    if args.async_ckpt:
        ckpt = AsyncSaver(ckpt)
        save_ckpt = ckpt.save  # snapshots on device, D2H in background
    else:
        save_ckpt = lambda st: ckpt.save(jax.device_get(st))
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
    state = replicate(mesh, state)

    # same single-process SIGTERM preemption save as main()
    import signal

    preempted = {"flag": False}
    prev_handler = signal.signal(
        signal.SIGTERM, lambda signum, frame: preempted.update(flag=True))

    rng = jax.random.PRNGKey(args.seed + 1)
    diverged = False
    global_step = int(jax.device_get(state.step))
    # same pre-save divergence check as main() (closes the --log_every window)
    latest = {"metrics": None, "step": 0}

    def metrics_ok() -> bool:
        if not args.nan_guard or latest["metrics"] is None:
            return True
        m = {k: float(v) for k, v in jax.device_get(latest["metrics"]).items()}
        if args.fault_inject_nan_at and latest["step"] >= args.fault_inject_nan_at:
            m["d_loss"] = float("nan")  # --fault_inject_nan_at drill
        if all(np.isfinite(v) for v in m.values()):
            return True
        logger.error(
            "non-finite metrics at step %d (pre-save check) — divergence; "
            "keeping the last good checkpoint and exiting 3", latest["step"])
        return False

    for epoch in range(args.total_epoch):
        for batch in loader:
            # batch lands sharded over the data mesh; state/rng replicated
            batch = shard_batch(mesh, prepare(batch))
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, batch, replicate(mesh, step_rng))
            global_step += 1
            latest["metrics"], latest["step"] = metrics, global_step
            if global_step % args.log_every == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                if args.fault_inject_nan_at and global_step >= args.fault_inject_nan_at:
                    m["d_loss"] = float("nan")  # --fault_inject_nan_at drill
                if args.nan_guard and not all(np.isfinite(v) for v in m.values()):
                    diverged = True
                    logger.error(
                        "non-finite metrics at step %d: %s — divergence; "
                        "keeping the last good checkpoint (skipping further "
                        "saves) and exiting 3", global_step,
                        {k: v for k, v in m.items() if not np.isfinite(v)})
                    break
                logger.info("epoch %d step %d: %s", epoch + 1, global_step,
                            {k: round(v, 4) for k, v in m.items()})
                writer.write(global_step, m)
                writer.write_images(global_step, "real", jax.device_get(batch["images"])[:16])
            if evaluator is not None and global_step % args.eval_every == 0:
                host_state = jax.device_get(state)
                em = {k: float(v) for k, v in evaluator(host_state).items()}
                writer.write(global_step, em)
                logger.info("eval step %d: %s", global_step,
                            {k: round(v, 4) for k, v in em.items()})
            if preempted["flag"]:
                break
        if diverged:
            break
        if preempted["flag"]:
            logger.info("SIGTERM: saving checkpoint at step %d and exiting",
                        global_step)
            break
        if (epoch + 1) % args.save_every_epochs == 0:
            if not metrics_ok():
                diverged = True
                break
            save_ckpt(state)
    if not diverged:
        if metrics_ok():
            save_ckpt(state)
        else:
            diverged = True
    getattr(ckpt, "wait", lambda: None)()  # drain any in-flight async save
    if prev_handler is not None:
        signal.signal(signal.SIGTERM, prev_handler)
    writer.close()
    if diverged:
        raise SystemExit(3)
    logger.info("done: %d steps", global_step)


if __name__ == "__main__":
    main()
