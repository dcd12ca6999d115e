"""Benchmark: full GAN train step (G + D, hinge + pixel + VGG-perceptual)
at 128x128, flagship Ours-D context config, on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

Methodology notes:
- K train steps are fused into one dispatch with ``lax.scan`` — the
  remote-device transport in this sandbox costs ~1s per dispatch, which
  would otherwise dominate; fusing the step loop on device is the correct
  TPU-native structure regardless (no host round-trip per step).
- vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
  We normalize against an estimated PyTorch single-GPU baseline of 25 img/s
  for the same 128x128 G+D hinge step (LostGAN-class model on the V100-era
  hardware implied by the 2021 SLURM setup); the driver target is >=3x,
  i.e. vs_baseline >= 3.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

TORCH_GPU_BASELINE_IMG_S = 25.0


def log(msg):
    print(f"[bench +{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.perf_counter()


def main():
    from layout2img_tpu.data.synthetic import synthetic_batch
    from layout2img_tpu.losses.perceptual import VGGLoss, VGG19Features
    from layout2img_tpu.models.discriminators import LayoutDiscriminator
    from layout2img_tpu.models.generators import make_generator
    from layout2img_tpu.train.state import TrainConfig, create_train_state
    from layout2img_tpu.train.step import make_train_step

    # batch 128 is the measured single-chip sweet spot on v5e (236 img/s vs
    # 222 at batch 64; batch 256 exceeds the 16G HBM). Scan length does not
    # change the number materially (236.2 at 50x2 vs 235.6 at 10x3).
    batch_size = int(os.environ.get("BENCH_BATCH", "128"))
    scan_len = int(os.environ.get("BENCH_SCAN", "10"))
    n_scans = int(os.environ.get("BENCH_SCANS", "3"))
    # BENCH_MODEL selects any generator preset (default: flagship). The
    # image size / mask canvas follow the preset; VG shape via BENCH_OBJ=31
    # BENCH_CLASSES=179.
    preset = os.environ.get("BENCH_MODEL", "ours_d_context128")
    num_classes = int(os.environ.get("BENCH_CLASSES", "184"))
    num_obj = int(os.environ.get("BENCH_OBJ", "8"))
    log(f"building models (model={preset}, batch={batch_size}, scan={scan_len}x{n_scans}, "
        f"mixed={os.environ.get('BENCH_MIXED', '1')=='1'}, remat={os.environ.get('BENCH_REMAT', 'none')})")
    gen = make_generator(preset, num_classes)
    # size from the constructed generator, never a name-substring guess
    size = gen.image_size
    disc = LayoutDiscriminator(
        num_classes=num_classes, image_size=size, app_head=True,
        remat_blocks=int(os.environ.get("BENCH_REMAT_D_BLOCKS", "0")),
    )

    batch = synthetic_batch(np.random.default_rng(0), batch_size, size, num_obj, num_classes)
    # BENCH_VALID_MAX caps the number of REAL objects per image (the rest of
    # the o slots become pads), modelling real VG layouts: o=31 slots but
    # ~6-10 annotated objects. This is the regime where BENCH_D_OBJ_BUDGET
    # is exact (budget >= valid count) and shows its win.
    valid_max = int(os.environ.get("BENCH_VALID_MAX", "0"))
    if valid_max:
        from layout2img_tpu.data.synthetic import PAD_BOX

        batch["labels"][:, valid_max:] = 0
        batch["boxes"][:, valid_max:] = np.asarray(PAD_BOX, np.float32)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    mixed = os.environ.get("BENCH_MIXED", "1") == "1"
    fused_d = os.environ.get("BENCH_FUSED_D", "0") == "1"
    remat = os.environ.get("BENCH_REMAT", "none")
    d_obj_budget = int(os.environ.get("BENCH_D_OBJ_BUDGET", "0"))
    g_obj_budget = int(os.environ.get("BENCH_G_OBJ_BUDGET", "0"))
    if g_obj_budget:
        from layout2img_tpu.models.generators import obj_budget_error

        why = obj_budget_error(gen)
        if why is not None:
            raise SystemExit(f"BENCH_G_OBJ_BUDGET is not exact for {preset}: {why}")
    cfg = TrainConfig(mixed_precision=mixed, fused_d=fused_d, remat=remat,
                      d_obj_budget=d_obj_budget, g_obj_budget=g_obj_budget)
    if (jax.default_backend() == "tpu" and num_obj >= 31 and batch_size >= 128
            and not (d_obj_budget or g_obj_budget)):
        # known-fatal compile region on this toolchain (docs/perf_r4.md,
        # deterministic 2/2): the un-budgeted o>=31 object program at b>=128
        # crashes the remote compile helper AFTER the 4-12 min compile wait.
        # Minimal repro: scripts/repro_compile_crash.py.
        log("WARNING: known compile-crash region (un-budgeted o>=31 at "
            "b>=128) — set BENCH_D_OBJ_BUDGET=12 (and BENCH_G_OBJ_BUDGET=12 "
            "on eligible models); continuing anyway")
    log("initializing VGG (jitted)")
    vgg_params = jax.jit(VGG19Features().init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )["params"]
    vgg = VGGLoss(vgg_params)
    log("initializing train state (jitted)")
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, batch, cfg)
    train_step = make_train_step(gen, disc, cfg, vgg_loss=vgg)

    def multi_step(state, batch, rngs):
        def body(s, rng):
            s, metrics = train_step(s, batch, rng)
            return s, metrics["d_loss"]

        return jax.lax.scan(body, state, rngs)

    from layout2img_tpu.parallel.mesh import default_compiler_options

    # BENCH_XLA_OPTS: JSON dict of extra XLA compile options, merged over the
    # defaults (scripts/sweep_xla_flags.py drives this). Must travel via
    # compiler_options — with the remote-TPU transport, compilation happens
    # server-side, so a client XLA_FLAGS env would not reach the compiler.
    opts = default_compiler_options() or {}
    opts.update(json.loads(os.environ.get("BENCH_XLA_OPTS", "{}")))
    jit_multi = jax.jit(multi_step, donate_argnums=(0,), compiler_options=opts or None)
    rngs = jax.random.split(jax.random.PRNGKey(1), scan_len)

    log("compiling + warmup scan")
    state, losses = jit_multi(state, batch, rngs)
    jax.block_until_ready(losses)
    log(f"warmup done (d_loss {float(losses[-1]):.3f}); timing {n_scans} scans")

    t0 = time.perf_counter()
    for i in range(n_scans):
        state, losses = jit_multi(state, batch, jax.random.split(jax.random.PRNGKey(2 + i), scan_len))
    # value readback, not just block_until_ready: on the axon tunnel the
    # latter can return before remote execution completes
    final_loss = float(losses[-1])
    dt = time.perf_counter() - t0
    log(f"final d_loss {final_loss:.3f}")

    steps = scan_len * n_scans
    img_s = batch_size * steps / dt
    log(f"{steps} steps in {dt:.2f}s")
    print(
        json.dumps(
            {
                "metric": f"gan_train_step_images_per_sec_{size}px",
                "value": round(img_s, 3),
                "unit": "img/s/chip",
                "vs_baseline": round(img_s / TORCH_GPU_BASELINE_IMG_S, 3),
                # the reference publishes no throughput; the divisor is an
                # estimate, so the multiple is labeled at the source
                "baseline": "estimated 25 img/s torch-GPU (reference publishes no throughput)",
            }
        )
    )


if __name__ == "__main__":
    main()
