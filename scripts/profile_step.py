"""Component-level timing of the flagship train step on the real device.

Times (scan-fused to amortize dispatch): G forward, D forward, VGG loss
forward, full step without VGG, full step. Run:
  python scripts/profile_step.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from layout2img_tpu.data.synthetic import synthetic_batch
from layout2img_tpu.losses.perceptual import VGG19Features, VGGLoss
from layout2img_tpu.models.discriminators import LayoutDiscriminator
from layout2img_tpu.models.generators import make_generator
from layout2img_tpu.train.state import TrainConfig, create_train_state
from layout2img_tpu.train.step import make_train_step

B, O, S, NC = 16, 8, 128, 184
K = 50


def _readback(out):
    """Force a VALUE transfer: on the axon tunnel block_until_ready can
    return before remote execution completes."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf[-1]).ravel()[0])


def _floor():
    """Median dispatch+scalar-readback round-trip (~0.1 s on this tunnel),
    subtracted from timed regions."""
    ts = []
    for i in range(3):
        y = jax.jit(lambda s: s * 2 + 1)(jnp.float32(i + 17))
        t0 = time.perf_counter()
        _ = float(y)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1]


def timed(name, fn, warm_xs, timed_xs):
    """Time fn(timed_xs) after warming (with readback, so compile and the
    warmup execution cannot leak into the timed region) with fn(warm_xs).
    The inputs differ as anti-caching hygiene; the single readback's
    round-trip latency is subtracted."""
    _readback(fn(warm_xs))  # compile + warm, fully drained
    fl = _floor()
    t0 = time.perf_counter()
    out = fn(timed_xs)
    _readback(out)
    dt = max(time.perf_counter() - t0 - fl, 1e-9) / K
    print(f"{name:28s} {dt * 1000:8.2f} ms/step  ({B / dt:7.1f} img/s)")
    return dt


def scan_of(f, *const_args):
    def run(xs):
        def body(c, x):
            return c + 1, f(*const_args, x)

        _, ys = jax.lax.scan(body, 0, xs)
        return ys

    return jax.jit(run)


def main():
    gen = make_generator("ours_d_context128", NC)
    disc = LayoutDiscriminator(num_classes=NC, image_size=S, app_head=True)
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_batch(np.random.default_rng(0), B, S, O, NC)
    )
    cfg = TrainConfig(mixed_precision=True)
    vgg_params = jax.jit(VGG19Features().init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    vgg = VGGLoss(vgg_params)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, batch, cfg)

    g_in = {"params": state.g_params, **state.g_state}
    d_in = {"params": state.d_params, **state.d_state}
    z = jnp.zeros((B, O, 128), jnp.bfloat16)
    z_im = jnp.zeros((B, 128), jnp.bfloat16)
    imgs = batch["images"].astype(jnp.bfloat16)

    # G forward only
    def g_fwd(_, rng):
        zz = jax.random.normal(rng, z.shape, z.dtype)
        return gen.apply(g_in, zz, batch["boxes"], batch["labels"], z_im,
                         train=False, update_stats=False)

    rngs = jax.random.split(jax.random.PRNGKey(0), K)
    rngs2 = jax.random.split(jax.random.PRNGKey(1), K)
    timed("G forward (eval)", scan_of(g_fwd, 0), rngs, rngs2)

    # D forward only
    def d_fwd(_, rng):
        noise = jax.random.normal(rng, imgs.shape, imgs.dtype) * 0.01
        out = disc.apply(d_in, imgs + noise, batch["boxes"], batch["labels"],
                         update_stats=False)
        return out["image"], out["object"], out["app"]

    timed("D forward", scan_of(d_fwd, 0), rngs, rngs2)

    # VGG loss forward
    def vgg_fwd(_, rng):
        noise = jax.random.normal(rng, imgs.shape, imgs.dtype) * 0.01
        return vgg(imgs + noise, imgs)

    timed("VGG loss forward", scan_of(vgg_fwd, 0), rngs, rngs2)

    # full steps
    for name, use_vgg in (("full step (no VGG)", False), ("full step (VGG)", True)):
        cfg2 = TrainConfig(mixed_precision=True, use_vgg_loss=use_vgg)
        st = make_train_step(gen, disc, cfg2, vgg_loss=vgg if use_vgg else None)

        def multi(state, rngs):
            def body(s, rng):
                s, m = st(s, batch, rng)
                return s, m["d_loss"]

            return jax.lax.scan(body, state, rngs)

        jmulti = jax.jit(multi)
        st_state, losses = jmulti(state, rngs)  # compile+warm
        _ = float(losses[-1])  # drain warmup+compile before timing
        fl = _floor()
        t0 = time.perf_counter()
        st_state, losses = jmulti(st_state, rngs2)
        _ = float(losses[-1])  # value readback (see _readback)
        dt = max(time.perf_counter() - t0 - fl, 1e-9) / K
        print(f"{name:28s} {dt * 1000:8.2f} ms/step  ({B / dt:7.1f} img/s)")


if __name__ == "__main__":
    main()
