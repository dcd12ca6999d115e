"""Benchmark: full GAN train step (G + D, hinge + pixel + VGG-perceptual)
at 128x128, flagship Ours-D context config, on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

vs_baseline: the reference publishes no throughput numbers
(BASELINE.md — no benchmarks/ dir). We normalize against an estimated
PyTorch single-GPU baseline of 25 img/s for the same 128x128 G+D hinge step
(LostGAN-class model, V100-era hardware implied by the 2021 SLURM setup);
the driver's target is >=3x that baseline, i.e. vs_baseline >= 3.0.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

TORCH_GPU_BASELINE_IMG_S = 25.0


def main():
    from layout2img_tpu.data.synthetic import synthetic_batch
    from layout2img_tpu.losses.perceptual import VGGLoss
    from layout2img_tpu.models.discriminators import LayoutDiscriminator
    from layout2img_tpu.models.generators import make_generator
    from layout2img_tpu.train.state import TrainConfig, create_train_state
    from layout2img_tpu.train.step import make_train_step

    batch_size = int(os.environ.get("BENCH_BATCH", "16"))
    num_classes, num_obj, size = 184, 8, 128
    steps = int(os.environ.get("BENCH_STEPS", "20"))

    gen = make_generator("ours_d_context128", num_classes)
    disc = LayoutDiscriminator(num_classes=num_classes, image_size=size, app_head=True)

    batch = synthetic_batch(np.random.default_rng(0), batch_size, size, num_obj, num_classes)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    cfg = TrainConfig()
    vgg = VGGLoss()  # random filters: same FLOP cost as pretrained VGG19
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, batch, cfg)
    step = jax.jit(make_train_step(gen, disc, cfg, vgg_loss=vgg), donate_argnums=(0,))

    rng = jax.random.PRNGKey(1)
    # warmup / compile
    state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics)
    state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    img_s = batch_size * steps / dt
    print(
        json.dumps(
            {
                "metric": "gan_train_step_images_per_sec_128px",
                "value": round(img_s, 3),
                "unit": "img/s/chip",
                "vs_baseline": round(img_s / TORCH_GPU_BASELINE_IMG_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
