"""Minimal repro for the o=31 / b=128 TPU compile-helper crash.

Observed (docs/perf_r4.md, 2026-08-19, deterministic 2/2 on this sandbox's
axon-tunneled v5e toolchain): compiling the flagship G+D train step at VG
shape (o=31 object slots, 179 classes) with per-chip batch 128 and NO object
budget crashes the remote compile-helper subprocess after the full 4-12 min
compile wait. The same program compiles and runs at b=64, and at b=128 with
``--d_obj_budget 12`` (which shrinks the D object program: RoIAlign taps +
object/appearance heads over b*o=3968 rois are the suspected trigger).

This script reproduces the failing compile in isolation so the bug can be
reported upstream against the XLA/TPU toolchain. It lowers and compiles the
step WITHOUT executing it (AOT ``.lower().compile()``), so no training state
beyond shape metadata matters. Narrow with the flags below; the default is
the known-fatal configuration.

Usage:
  python scripts/repro_compile_crash.py                  # known-fatal config
  python scripts/repro_compile_crash.py --batch 64       # compiles fine
  python scripts/repro_compile_crash.py --d_obj_budget 12  # compiles fine
  python scripts/repro_compile_crash.py --d_only         # D fwd+bwd only,
                                                         # to bisect G out
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--objects", type=int, default=31)
    p.add_argument("--num_classes", type=int, default=179)
    p.add_argument("--d_obj_budget", type=int, default=0)
    p.add_argument("--d_only", action="store_true",
                   help="compile only the D forward+backward (bisection aid: "
                        "the object/app-head RoI program is the suspected "
                        "trigger)")
    p.add_argument("--no_mixed", action="store_true")
    args = p.parse_args(argv)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from layout2img_tpu.data.synthetic import synthetic_batch
    from layout2img_tpu.models.discriminators import LayoutDiscriminator
    from layout2img_tpu.models.generators import make_generator
    from layout2img_tpu.parallel.mesh import default_compiler_options

    t0 = time.perf_counter()

    def log(msg):
        print(f"[repro +{time.perf_counter() - t0:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    log(f"backend={jax.default_backend()} batch={args.batch} "
        f"o={args.objects} classes={args.num_classes} "
        f"d_obj_budget={args.d_obj_budget} d_only={args.d_only}")

    num_classes = args.num_classes
    batch = synthetic_batch(np.random.default_rng(0), args.batch, 128,
                            args.objects, num_classes)
    # VG regime: ~10 real objects, the rest pad slots
    from layout2img_tpu.data.synthetic import PAD_BOX

    batch["labels"][:, 10:] = 0
    batch["boxes"][:, 10:] = np.asarray(PAD_BOX, np.float32)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    disc = LayoutDiscriminator(num_classes=num_classes, image_size=128,
                               app_head=True)
    mixed = not args.no_mixed
    dtype = jnp.bfloat16 if mixed else jnp.float32

    if args.d_only:
        from layout2img_tpu.losses.gan import hinge_d_fake, hinge_d_real

        log("initializing D (jitted)")
        d_vars = dict(jax.jit(disc.init)(
            jax.random.PRNGKey(0), batch["images"], batch["boxes"],
            batch["labels"]))
        d_params = d_vars.pop("params")
        labels = batch["labels"]
        if args.d_obj_budget:
            k = args.d_obj_budget
            order = jnp.argsort((labels == 0).astype(jnp.int32), axis=1,
                                stable=True)[:, :k]
            labels = jnp.take_along_axis(labels, order, axis=1)
            boxes = jnp.take_along_axis(batch["boxes"], order[:, :, None], axis=1)
        else:
            boxes = batch["boxes"]
        valid = (labels != 0).astype(jnp.float32)

        def d_loss(params, images):
            out, _ = disc.apply({"params": params, **d_vars},
                                images.astype(dtype), boxes, labels,
                                mutable=["spectral"])
            return (hinge_d_real(out["image"]) + hinge_d_fake(out["image"])
                    + hinge_d_real(out["object"], valid)
                    + hinge_d_real(out["app"], valid))

        fn = jax.jit(jax.grad(d_loss),
                     compiler_options=default_compiler_options())
        log("lowering + compiling D fwd+bwd (AOT, no execution)")
        compiled = fn.lower(d_params, batch["images"]).compile()
        cost = compiled.cost_analysis() or {}
        log(f"COMPILED OK (flops={cost.get('flops')}, "
            f"bytes={cost.get('bytes accessed')})")
        return

    from layout2img_tpu.train.state import TrainConfig, create_train_state
    from layout2img_tpu.train.step import make_train_step

    gen = make_generator("ours_d_context128", num_classes)
    cfg = TrainConfig(mixed_precision=mixed, use_vgg_loss=False,
                      d_obj_budget=args.d_obj_budget)
    log("initializing train state (jitted)")
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, batch, cfg)
    step = jax.jit(make_train_step(gen, disc, cfg), donate_argnums=(0,),
                   compiler_options=default_compiler_options())
    log("lowering + compiling the full train step (AOT, no execution) — "
        "the known-fatal config crashes the compile helper here")
    compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
    log("COMPILED OK (this toolchain does not reproduce the crash)")
    mem = compiled.memory_analysis()
    log(f"memory analysis: {mem}")


if __name__ == "__main__":
    main()
