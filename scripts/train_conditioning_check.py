"""Semantic end-to-end check: does the conditioning path learn?

Synthetic task: each class is a fixed color; images are class-colored
rectangles at their boxes on a gray background. A correctly-wired
generator (label embedding -> context -> ISLA modulation inside mask
footprints) must learn to paint the right color inside the right box.

Metric: mean correlation between generated and target colors inside valid
boxes, before vs after training. Run: python scripts/train_conditioning_check.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from layout2img_tpu.models.discriminators import LayoutDiscriminator
from layout2img_tpu.models.generators import make_generator
from layout2img_tpu.train.state import TrainConfig, create_train_state
from layout2img_tpu.train.step import make_sample_fn, make_train_step

NUM_CLASSES, B, O, S, CH = 12, 32, 4, 64, 24
PALETTE = np.stack(
    [np.zeros(3)]
    + [np.array([((c * 37) % 11) / 10, ((c * 53) % 7) / 6, ((c * 71) % 5) / 4]) * 2 - 1
       for c in range(1, NUM_CLASSES)]
)


def make_batch(rng):
    labels = np.zeros((B, O), np.int32)
    boxes = np.tile(np.asarray([-0.6, -0.6, 0.5, 0.5], np.float32), (B, O, 1))
    images = np.full((B, S, S, 3), -0.2, np.float32)  # gray bg
    for i in range(B):
        n = int(rng.integers(2, O + 1))
        for j in range(n):
            labels[i, j] = int(rng.integers(1, NUM_CLASSES))
            x0, y0 = rng.uniform(0, 0.55, 2)
            w, h = rng.uniform(0.25, 0.4, 2)
            boxes[i, j] = (x0, y0, w, h)
            px = (np.array([x0, y0, x0 + w, y0 + h]) * S).astype(int).clip(0, S)
            images[i, px[1]:px[3], px[0]:px[2]] = PALETTE[labels[i, j]]
    return {
        "images": jnp.asarray(images),
        "labels": jnp.asarray(labels),
        "boxes": jnp.asarray(boxes),
    }


def color_score(imgs, labels, boxes):
    """Mean cosine similarity between box-interior mean color and the class color."""
    imgs = np.asarray(imgs)
    scores = []
    for i in range(imgs.shape[0]):
        for j in range(labels.shape[1]):
            if labels[i, j] == 0:
                continue
            x0, y0, w, h = np.asarray(boxes[i, j])
            px = (np.array([x0 + 0.25 * w, y0 + 0.25 * h, x0 + 0.75 * w, y0 + 0.75 * h]) * S).astype(int)
            region = imgs[i, px[1]:px[3], px[0]:px[2]]
            if region.size == 0:
                continue
            got = region.reshape(-1, 3).mean(0)
            want = PALETTE[labels[i, j]]
            scores.append(
                float(got @ want / (np.linalg.norm(got) * np.linalg.norm(want) + 1e-6))
            )
    return float(np.mean(scores))


def main():
    rng_np = np.random.default_rng(0)
    gen = make_generator("ours_d_context128", NUM_CLASSES, ch=CH, image_size=64,
                         num_mask_classes=NUM_CLASSES)
    disc = LayoutDiscriminator(num_classes=NUM_CLASSES, image_size=S, ch=CH, app_head=True)
    batches = [make_batch(rng_np) for _ in range(8)]
    cfg = TrainConfig(use_vgg_loss=False, mixed_precision=True)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, batches[0], cfg)
    step = make_train_step(gen, disc, cfg)
    sample = jax.jit(make_sample_fn(gen, cfg))

    eval_batch = make_batch(rng_np)

    def score(state):
        img = sample(state.g_params, state.g_state, eval_batch["boxes"],
                     eval_batch["labels"], jax.random.PRNGKey(7))
        return color_score(img, np.asarray(eval_batch["labels"]), np.asarray(eval_batch["boxes"]))

    s0 = score(state)
    print(f"color-conditioning score before training: {s0:+.3f}")

    def chunk(state, rngs, batch):
        def body(s, rng):
            s, m = step(s, batch, rng)
            return s, (m["d_loss"], m["pixel_loss"])

        return jax.lax.scan(body, state, rngs)

    jchunk = jax.jit(chunk, donate_argnums=(0,))
    t0 = time.perf_counter()
    for i in range(int(__import__('os').environ.get('COND_CHUNKS', '16'))):
        rngs = jax.random.split(jax.random.PRNGKey(100 + i), 50)
        state, (d_l, p_l) = jchunk(state, rngs, batches[i % len(batches)])
        if (i + 1) % 4 == 0:
            s = score(state)
            print(f"steps {(i + 1) * 50:4d}: d_loss {float(d_l[-1]):6.3f} "
                  f"pixel {float(p_l[-1]):5.3f} color-score {s:+.3f} "
                  f"({time.perf_counter() - t0:5.1f}s)")
    s1 = score(state)
    print(f"\ncolor-conditioning score: {s0:+.3f} -> {s1:+.3f}")

    # visual artifact: target layouts vs generated, before/after
    import os
    os.makedirs("docs/images", exist_ok=True)
    from layout2img_tpu.utils.logging import MetricWriter
    from layout2img_tpu.cli.visualize import draw_boxes

    img_after = np.asarray(sample(state.g_params, state.g_state, eval_batch["boxes"],
                                  eval_batch["labels"], jax.random.PRNGKey(7)))
    rows = []
    tgt = np.asarray(eval_batch["images"])
    for k in range(6):
        rows.append(np.concatenate([
            draw_boxes(tgt[k], np.asarray(eval_batch["boxes"][k]), np.asarray(eval_batch["labels"][k])),
            np.clip(img_after[k] * 0.5 + 0.5, 0, 1),
        ], axis=1))
    grid = np.concatenate(rows, axis=0)
    import PIL.Image
    PIL.Image.fromarray((grid * 255).astype(np.uint8)).save(
        "docs/images/conditioning_target_vs_generated.png")
    print("wrote docs/images/conditioning_target_vs_generated.png")
    assert s1 > 0.5 and s1 > s0 + 0.3, "conditioning did not learn"
    print("CONDITIONING OK")


if __name__ == "__main__":
    main()
