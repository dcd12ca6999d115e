"""Training-dynamics sanity: run a few hundred GAN steps on-device and check
the adversarial losses behave (D loss falls from its initial value, G/D stay
finite, samples move away from initialization).

Run: python scripts/train_sanity.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from layout2img_tpu.data.synthetic import synthetic_batch
from layout2img_tpu.models.discriminators import LayoutDiscriminator
from layout2img_tpu.models.generators import make_generator
from layout2img_tpu.train.state import TrainConfig, create_train_state
from layout2img_tpu.train.step import make_sample_fn, make_train_step


def main():
    num_classes, b, o, size, ch = 16, 16, 8, 64, 16
    gen = make_generator("lostgan64", num_classes, ch=ch)
    disc = LayoutDiscriminator(num_classes=num_classes, image_size=size, ch=ch)
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_batch(np.random.default_rng(0), b, size, o, num_classes)
    )
    cfg = TrainConfig(use_vgg_loss=False, mixed_precision=True)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, batch, cfg)
    step = make_train_step(gen, disc, cfg)

    sample = jax.jit(make_sample_fn(gen, cfg))
    img0 = np.asarray(sample(state.g_params, state.g_state, batch["boxes"], batch["labels"], jax.random.PRNGKey(9)))

    def chunk(state, rngs):
        def body(s, rng):
            s, m = step(s, batch, rng)
            return s, (m["d_loss"], m["g_loss"])

        return jax.lax.scan(body, state, rngs)

    jchunk = jax.jit(chunk, donate_argnums=(0,))
    t0 = time.perf_counter()
    hist_d, hist_g = [], []
    for i in range(6):
        rngs = jax.random.split(jax.random.PRNGKey(10 + i), 50)
        state, (d_l, g_l) = jchunk(state, rngs)
        hist_d.append(np.asarray(d_l))
        hist_g.append(np.asarray(g_l))
        print(f"steps {(i + 1) * 50:4d}: d_loss {float(d_l[-1]):7.4f}  g_loss {float(g_l[-1]):7.4f}"
              f"  ({time.perf_counter() - t0:5.1f}s)")
    d = np.concatenate(hist_d)
    g = np.concatenate(hist_g)
    assert np.isfinite(d).all() and np.isfinite(g).all(), "losses diverged"
    # D should learn to separate: mean over last 50 well below the initial hinge (~4)
    assert d[:10].mean() > d[-50:].mean(), (d[:10].mean(), d[-50:].mean())

    img1 = np.asarray(sample(state.g_params, state.g_state, batch["boxes"], batch["labels"], jax.random.PRNGKey(9)))
    delta = np.abs(img1 - img0).mean()
    print(f"sample drift after 300 steps: {delta:.4f}")
    assert delta > 0.01, "generator did not move"
    print("SANITY OK: d_loss", d[:5].round(3), "->", d[-5:].round(3))


if __name__ == "__main__":
    main()
