"""Tests for the Ours-ED fg/bg trainer and the layout2im CVAE-GAN trainer."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from layout2img_tpu.data.coco import split_fg_bg
from layout2img_tpu.data.synthetic import synthetic_batch


def _bgfg_batch(rng, b=2, o=4):
    batch = synthetic_batch(rng, b, 64, o, num_classes=184)
    extra = {k: [] for k in ("labels_fg", "boxes_fg", "labels_bg", "boxes_bg")}
    for i in range(b):
        s = split_fg_bg(batch["labels"][i], batch["boxes"][i])
        for k in extra:
            extra[k].append(s[k])
    batch.update({k: np.stack(v) for k, v in extra.items()})
    return jax.tree_util.tree_map(jnp.asarray, batch)


def test_bgfg_train_step(rng):
    from layout2img_tpu.models.discriminators import LayoutDiscriminator
    from layout2img_tpu.models.generators import BgFgGenerator
    from layout2img_tpu.train.state import TrainConfig
    from layout2img_tpu.train.step_bgfg import make_bgfg_train_step

    batch = _bgfg_batch(rng)
    gen = BgFgGenerator(num_fg_classes=91, num_bg_classes=93, ch=4)
    disc = LayoutDiscriminator(num_classes=184, image_size=64, ch=4)
    cfg = TrainConfig(use_vgg_loss=False)

    # custom init (BgFg has a different signature than create_train_state expects)
    import optax
    from layout2img_tpu.train.state import GANTrainState

    b, o = batch["labels"].shape
    z = jnp.zeros((b, o, 128))
    z_im = jnp.zeros((b, 128))
    g_vars = jax.jit(gen.init)(
        jax.random.PRNGKey(0), z, batch["boxes_fg"], batch["labels_fg"],
        z, batch["boxes_bg"], batch["labels_bg"], z_im, z_im,
    )
    d_vars = jax.jit(disc.init)(
        jax.random.PRNGKey(1), batch["images"], batch["boxes"], batch["labels"]
    )
    g_vars, d_vars = dict(g_vars), dict(d_vars)
    g_params, d_params = g_vars.pop("params"), d_vars.pop("params")
    tx = optax.adam(1e-4, b1=0, b2=0.999)
    state = GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params, g_state=g_vars,
        d_params=d_params, d_state=d_vars,
        g_opt_state=tx.init(g_params), d_opt_state=tx.init(d_params),
        g_tx=tx, d_tx=tx,
    )
    step = jax.jit(make_bgfg_train_step(gen, disc, cfg))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_layout2im_train_step(rng):
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

    batch = synthetic_batch(rng, 2, 64, 4, num_classes=10)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    gen = Layout2ImGenerator(num_classes=10)
    d_img = Layout2ImImageDiscriminator(conv_dim=8)
    d_obj = Layout2ImObjectDiscriminator(num_classes=10, conv_dim=8)
    cfg = Layout2ImConfig()
    state = create_layout2im_state(jax.random.PRNGKey(0), gen, d_img, d_obj, batch, cfg)
    step = jax.jit(make_layout2im_train_step(gen, d_img, d_obj, cfg))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    for k in ("d_loss", "g_loss", "img_rec_l1", "kl", "z_rec_l1"):
        assert np.isfinite(float(metrics[k])), k
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.g_params, new_state.g_params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_bgfg_step_data_parallel_matches_single(rng):
    """cli.train main_special jits the Ours-ED step over a 1-D data mesh
    (the reference's nn.DataParallel, train_ours.py:71-73); sharded-batch
    numerics must match the unsharded run."""
    from layout2img_tpu.models.discriminators import LayoutDiscriminator
    from layout2img_tpu.models.generators import BgFgGenerator
    from layout2img_tpu.parallel.mesh import (
        jit_train_step,
        make_mesh,
        replicate,
        shard_batch,
    )
    from layout2img_tpu.train.state import TrainConfig
    from layout2img_tpu.train.step_bgfg import create_bgfg_state, make_bgfg_train_step

    batch = _bgfg_batch(rng, b=8)
    gen = BgFgGenerator(num_fg_classes=91, num_bg_classes=93, ch=4)
    disc = LayoutDiscriminator(num_classes=184, image_size=64, ch=4)
    cfg = TrainConfig(use_vgg_loss=False)
    state = create_bgfg_state(jax.random.PRNGKey(0), gen, disc, batch, cfg)
    step = make_bgfg_train_step(gen, disc, cfg)
    ref_state, ref_metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(2))

    mesh = make_mesh(jax.devices("cpu")[:8])
    pstep = jit_train_step(step, mesh, donate_state=False)
    new_state, metrics = pstep(
        replicate(mesh, state), shard_batch(mesh, batch),
        replicate(mesh, jax.random.PRNGKey(2)))
    np.testing.assert_allclose(
        float(metrics["d_loss"]), float(ref_metrics["d_loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(metrics["g_loss"]), float(ref_metrics["g_loss"]), rtol=1e-4)
    a = jax.tree_util.tree_leaves(ref_state.g_params)[0]
    b = jax.tree_util.tree_leaves(new_state.g_params)[0]
    # one-Adam-step bound: collective reassociation can flip sign(g) on
    # near-zero grads (same rationale as test_train_step_data_parallel_...)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-4)


def test_layout2im_step_data_parallel_matches_single(rng):
    """Same for the layout2im CVAE-GAN step (reference DataParallel,
    train_ours_layout2img.py:70-72)."""
    from layout2img_tpu.models.layout2im import (
        Layout2ImGenerator,
        Layout2ImImageDiscriminator,
        Layout2ImObjectDiscriminator,
    )
    from layout2img_tpu.parallel.mesh import (
        jit_train_step,
        make_mesh,
        replicate,
        shard_batch,
    )
    from layout2img_tpu.train.step_layout2im import (
        Layout2ImConfig,
        create_layout2im_state,
        make_layout2im_train_step,
    )

    batch = synthetic_batch(rng, 8, 64, 4, num_classes=10)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    gen = Layout2ImGenerator(num_classes=10)
    d_img = Layout2ImImageDiscriminator(conv_dim=8)
    d_obj = Layout2ImObjectDiscriminator(num_classes=10, conv_dim=8)
    cfg = Layout2ImConfig()
    state = create_layout2im_state(jax.random.PRNGKey(0), gen, d_img, d_obj, batch, cfg)
    step = make_layout2im_train_step(gen, d_img, d_obj, cfg)
    ref_state, ref_metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(jax.devices("cpu")[:8])
    pstep = jit_train_step(step, mesh, donate_state=False)
    new_state, metrics = pstep(
        replicate(mesh, state), shard_batch(mesh, batch),
        replicate(mesh, jax.random.PRNGKey(1)))
    np.testing.assert_allclose(
        float(metrics["d_loss"]), float(ref_metrics["d_loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(metrics["g_loss"]), float(ref_metrics["g_loss"]), rtol=1e-4)
    a = jax.tree_util.tree_leaves(ref_state.g_params)[0]
    b = jax.tree_util.tree_leaves(new_state.g_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-4)
