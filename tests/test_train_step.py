"""End-to-end train-step tests on tiny configs: losses finite and decreasing
machinery intact, state updated, and the data-parallel mesh path compiles and
matches single-device numerics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layout2img_tpu.data.synthetic import synthetic_batch
from layout2img_tpu.models.discriminators import LayoutDiscriminator
from layout2img_tpu.models.generators import make_generator
from layout2img_tpu.parallel.mesh import (
    jit_train_step,
    jit_train_step_2d,
    make_mesh,
    make_mesh_2d,
    replicate,
    shard_batch,
    shard_batch_2d,
)
from layout2img_tpu.train.state import TrainConfig, create_train_state
from layout2img_tpu.train.step import make_sample_fn, make_train_step


def _tiny_setup(rng, b=2, o=4, size=64, num_classes=10, app=False):
    gen = make_generator(
        "lostgan64" if size == 64 else "ours_d_base128",
        num_classes,
        ch=4,
        num_mask_classes=num_classes,
    )
    disc = LayoutDiscriminator(num_classes=num_classes, image_size=size, ch=4, app_head=app)
    batch = synthetic_batch(rng, b, size, o, num_classes)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    cfg = TrainConfig(use_vgg_loss=False)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, batch, cfg)
    step = make_train_step(gen, disc, cfg)
    return gen, disc, batch, cfg, state, step


def test_train_step_runs_and_updates(rng):
    gen, disc, batch, cfg, state, step = _tiny_setup(rng, app=True, size=128)
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.g_params, new_state.g_params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    # app-head metrics present
    assert "d_loss_rapp" in metrics and "g_loss_app" in metrics
    # spectral state advanced on both nets
    u_old = jax.tree_util.tree_leaves(state.d_state["spectral"])[0]
    u_new = jax.tree_util.tree_leaves(new_state.d_state["spectral"])[0]
    assert float(jnp.max(jnp.abs(u_old - u_new))) > 0


@pytest.mark.slow
def test_train_step_multiple_steps_stable(rng):
    gen, disc, batch, cfg, state, step = _tiny_setup(rng)
    jstep = jax.jit(step)
    for i in range(3):
        state, metrics = jstep(state, batch, jax.random.PRNGKey(i))
    assert int(state.step) == 3
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))


@pytest.mark.slow
def test_train_step_data_parallel_matches_single(rng):
    """The whole DataParallel+SyncBN apparatus: one jit over a mesh.
    Sharded-batch numerics must match the unsharded run."""
    gen, disc, batch, cfg, state, step = _tiny_setup(rng, b=8)
    ref_state, ref_metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(jax.devices("cpu")[:8])
    pstep = jit_train_step(step, mesh, donate_state=False)
    sstate = replicate(mesh, state)
    sbatch = shard_batch(mesh, batch)
    new_state, metrics = pstep(sstate, sbatch, replicate(mesh, jax.random.PRNGKey(1)))

    np.testing.assert_allclose(
        float(metrics["d_loss"]), float(ref_metrics["d_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(metrics["g_loss"]), float(ref_metrics["g_loss"]), rtol=1e-4
    )
    a = jax.tree_util.tree_leaves(ref_state.g_params)[0]
    b = jax.tree_util.tree_leaves(new_state.g_params)[0]
    # Adam's first-step update is ~sign(g)*lr; sharded-collective
    # reassociation can flip the sign of a handful of near-zero gradients,
    # so bound the disagreement by one Adam step (lr=1e-4), matching
    # test_remat_step_matches_plain's rationale.
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["tensor", "spatial"])
def test_train_step_2d_mesh_matches_single(rng, mode):
    """(data, model) 2-D mesh: tensor mode shards every rank>=2 param's
    trailing feature axis + its Adam moments over 'model'; spatial mode
    shards the image/activation H axis. Both are pure sharding annotations
    on the same jitted step and must reproduce single-device numerics."""
    gen, disc, batch, cfg, state, step = _tiny_setup(rng, b=4)
    ref_state, ref_metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh_2d(jax.devices("cpu")[:8], model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    pstep = jit_train_step_2d(step, mesh, state, mode=mode, donate_state=False)
    sstate = jax.device_put(state, pstep.state_shardings)
    if mode == "tensor":
        # the sharding rule actually engaged: some kernel is model-sharded
        from jax.sharding import PartitionSpec as P

        specs = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda s: s.spec, pstep.state_shardings)
        )
        assert any(spec != P() for spec in specs)
    sbatch = shard_batch_2d(mesh, batch, mode)
    if mode == "spatial":
        # the image H axis really is sharded over 'model'
        assert "model" in str(sbatch["images"].sharding.spec)
    new_state, metrics = pstep(sstate, sbatch, replicate(mesh, jax.random.PRNGKey(1)))

    np.testing.assert_allclose(
        float(metrics["d_loss"]), float(ref_metrics["d_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(metrics["g_loss"]), float(ref_metrics["g_loss"]), rtol=2e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.g_params)[:3],
        jax.tree_util.tree_leaves(new_state.g_params)[:3],
    ):
        # same one-Adam-step bound as the data-parallel test above
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-4)


@pytest.mark.slow
def test_fused_d_step_matches_separate(rng):
    """fused_d=True (one 2b-batch D apply) must match the two-pass step.

    Scores are exactly identical (test_batched_d_pass_scores_identical); the
    only numeric delta is spectral-u settling (the fused pass runs one power
    iteration where the separate passes run two), so warm the state up first
    and compare at a tolerance that the settled u supports.
    """
    gen, disc, batch, cfg, state, step = _tiny_setup(rng, app=True, size=128)
    jstep = jax.jit(step)
    for i in range(5):  # settle spectral u
        state, _ = jstep(state, batch, jax.random.PRNGKey(i))

    cfg_fused = TrainConfig(use_vgg_loss=False, fused_d=True)
    step_fused = jax.jit(make_train_step(gen, disc, cfg_fused))

    ref_state, ref_metrics = jstep(state, batch, jax.random.PRNGKey(9))
    new_state, metrics = step_fused(state, batch, jax.random.PRNGKey(9))

    assert set(metrics) == set(ref_metrics)
    for k in ref_metrics:
        np.testing.assert_allclose(
            float(metrics[k]), float(ref_metrics[k]), rtol=5e-3, atol=5e-4
        ), k
    a = jax.tree_util.tree_leaves(ref_state.g_params)[0]
    b = jax.tree_util.tree_leaves(new_state.g_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-4)


@pytest.mark.slow
def test_remat_step_matches_plain(rng):
    """remat='gd' wraps the same math in jax.checkpoint — metrics and updated
    params must match the plain step to float tolerance."""
    gen, disc, batch, cfg, state, step = _tiny_setup(rng, app=True, size=128)
    step_remat = jax.jit(make_train_step(
        gen, disc, TrainConfig(use_vgg_loss=False, remat="gd")))

    ref_state, ref_metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    new_state, metrics = step_remat(state, batch, jax.random.PRNGKey(1))

    assert set(metrics) == set(ref_metrics)
    for k in ref_metrics:
        np.testing.assert_allclose(
            float(metrics[k]), float(ref_metrics[k]), rtol=1e-4, atol=1e-5
        ), k
    # Param updates: Adam normalizes first-step gradients to ~sign(g)*lr, so
    # fp32 reassociation under XLA's different fusion schedule can flip the
    # direction of near-zero gradients. Bound the disagreement by one Adam
    # step (lr=1e-4) instead of asserting bitwise-equal updates.
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.g_params),
                    jax.tree_util.tree_leaves(new_state.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.d_params),
                    jax.tree_util.tree_leaves(new_state.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-4)


@pytest.mark.slow
def test_remat_d_blocks_matches_plain(rng):
    """Per-block D remat (remat_blocks=3) is the same math — metrics, params,
    and the param TREE STRUCTURE must match the un-rematted discriminator
    (so checkpoints are interchangeable)."""
    gen, disc, batch, cfg, state, step = _tiny_setup(rng, app=True, size=128)
    disc_r = LayoutDiscriminator(num_classes=10, image_size=128, ch=4,
                                 app_head=True, remat_blocks=3)
    # identical init structure: reuse the plain state directly
    step_remat = jax.jit(make_train_step(gen, disc_r, cfg))

    ref_state, ref_metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    new_state, metrics = step_remat(state, batch, jax.random.PRNGKey(1))

    assert (jax.tree_util.tree_structure(ref_state.d_params)
            == jax.tree_util.tree_structure(new_state.d_params))
    for k in ref_metrics:
        np.testing.assert_allclose(
            float(metrics[k]), float(ref_metrics[k]), rtol=1e-4, atol=1e-5
        ), k
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.d_params),
                    jax.tree_util.tree_leaves(new_state.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-4)


def test_d_obj_budget_matches_plain(rng):
    """d_obj_budget=K compacts the valid object slots to the front and gives
    D only K of them. When K covers every valid object, the step is the same
    math as the full-o run (pad slots carry zero weight in the masked hinges
    and D has no cross-object coupling) — metrics and BOTH nets' updated
    params must match."""
    gen, disc, batch, cfg, state, step = _tiny_setup(rng, o=4, app=True, size=128)
    # widen the object axis to o=8 with pure pad slots (label 0, pad box)
    from layout2img_tpu.data.synthetic import PAD_BOX

    labels = jnp.concatenate(
        [batch["labels"], jnp.zeros_like(batch["labels"])], axis=1)
    boxes = jnp.concatenate(
        [batch["boxes"],
         jnp.tile(jnp.asarray(PAD_BOX, jnp.float32), (2, 4, 1))], axis=1)
    wide = {"images": batch["images"], "labels": labels, "boxes": boxes}

    cfg_b = TrainConfig(use_vgg_loss=False, d_obj_budget=4)
    step_b = jax.jit(make_train_step(gen, disc, cfg_b))
    # same init state works: the budget only reindexes D inputs
    ref_state, ref_metrics = jax.jit(step)(state, wide, jax.random.PRNGKey(1))
    new_state, metrics = step_b(state, wide, jax.random.PRNGKey(1))

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(metrics[k]), float(ref_metrics[k]), rtol=1e-4, atol=1e-5,
            err_msg=k)
    for params_ref, params_new in ((ref_state.d_params, new_state.d_params),
                                   (ref_state.g_params, new_state.g_params)):
        for a, b in zip(jax.tree_util.tree_leaves(params_ref),
                        jax.tree_util.tree_leaves(params_new)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-4)


def test_g_obj_budget_matches_plain(rng):
    """g_obj_budget=K compacts the valid slots and runs the WHOLE step (G
    forward included) on K of them. Pad slots contribute exactly zero to the
    generated image (off-canvas pad boxes splat to zero masks, pad attention
    keys are -1e9-masked, ISLA mask-weighted sums ignore zero masks), so with
    K covering every valid object the step is the same math — metrics and
    both nets' updated params must match the full-width run. Also stacks a
    further d_obj_budget truncation on top (D sees 3 of G's 4 slots; the
    4th is pure pad, so that is exact too)."""
    from layout2img_tpu.data.synthetic import PAD_BOX, synthetic_batch

    num_classes = 10
    gen = make_generator("ours_d_context128", num_classes, ch=4,
                         num_mask_classes=num_classes)
    disc = LayoutDiscriminator(num_classes=num_classes, image_size=128, ch=4,
                               app_head=True)
    batch = synthetic_batch(rng, 2, 128, 4, num_classes)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    # 3 valid slots + 5 pads: slot 3 padded, then widen 4 -> 8 with pure pads
    labels = batch["labels"].at[:, 3].set(0)
    boxes = batch["boxes"].at[:, 3].set(jnp.asarray(PAD_BOX, jnp.float32))
    labels = jnp.concatenate([labels, jnp.zeros_like(labels)], axis=1)
    boxes = jnp.concatenate(
        [boxes, jnp.tile(jnp.asarray(PAD_BOX, jnp.float32), (2, 4, 1))], axis=1)
    wide = {"images": batch["images"], "labels": labels, "boxes": boxes}

    cfg = TrainConfig(use_vgg_loss=False)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, wide, cfg)
    step = jax.jit(make_train_step(gen, disc, cfg))
    cfg_b = TrainConfig(use_vgg_loss=False, g_obj_budget=4, d_obj_budget=3)
    step_b = jax.jit(make_train_step(gen, disc, cfg_b))

    ref_state, ref_metrics = step(state, wide, jax.random.PRNGKey(1))
    new_state, metrics = step_b(state, wide, jax.random.PRNGKey(1))

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(metrics[k]), float(ref_metrics[k]), rtol=1e-4, atol=1e-5,
            err_msg=k)
    for params_ref, params_new in ((ref_state.d_params, new_state.d_params),
                                   (ref_state.g_params, new_state.g_params)):
        for a, b in zip(jax.tree_util.tree_leaves(params_ref),
                        jax.tree_util.tree_leaves(params_new)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-4)

    # serving path: the budgeted sampler renders the same images
    sample = jax.jit(make_sample_fn(gen, cfg))
    sample_b = jax.jit(make_sample_fn(gen, cfg, obj_budget=4))
    img_ref = sample(state.g_params, state.g_state, boxes, labels,
                     jax.random.PRNGKey(2))
    img_new = sample_b(state.g_params, state.g_state, boxes, labels,
                       jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(img_new), np.asarray(img_ref),
                               atol=1e-5)


def test_obj_budget_eligibility():
    """The exactness guard: v1-trunk and legacy-attention generators are
    rejected (BN couples slots / the scramble mixes layout), the flagship
    is eligible."""
    from layout2img_tpu.models.generators import obj_budget_error

    assert obj_budget_error(make_generator("ours_d_context128", 10)) is None
    assert obj_budget_error(make_generator("graph128", 10)) is not None
    assert obj_budget_error(
        make_generator("ours_d_context128", 10, legacy_attention=True)
    ) is not None
    assert obj_budget_error(make_generator("lostgan64", 10)) is not None


@pytest.mark.slow
def test_ema_updates_and_roundtrips(rng, tmp_path):
    """EMA params track g_params without changing the training math, and
    survive a checkpoint round-trip even into a template built without EMA."""
    from layout2img_tpu.train.checkpoint import CheckpointManager

    gen = make_generator("lostgan64", 10, ch=4)
    disc = LayoutDiscriminator(num_classes=10, image_size=64, ch=4)
    batch = jax.tree_util.tree_map(jnp.asarray, synthetic_batch(rng, 2, 64, 4, 10))

    cfg_ema = TrainConfig(use_vgg_loss=False, ema_decay=0.5)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, batch, cfg_ema)
    assert state.ema_params is not None
    step = jax.jit(make_train_step(gen, disc, cfg_ema))

    # training metrics identical to a no-EMA run (EMA is passive)
    cfg_plain = TrainConfig(use_vgg_loss=False)
    state_plain = create_train_state(jax.random.PRNGKey(0), gen, disc, batch, cfg_plain)
    step_plain = jax.jit(make_train_step(gen, disc, cfg_plain))
    s1, m1 = step(state, batch, jax.random.PRNGKey(1))
    s0, m0 = step_plain(state_plain, batch, jax.random.PRNGKey(1))
    for k in m0:
        np.testing.assert_allclose(float(m1[k]), float(m0[k]), rtol=1e-6)

    # ema = decay*init + (1-decay)*new, elementwise
    leaf = lambda t: jax.tree_util.tree_leaves(t)[0]
    want = 0.5 * leaf(state.g_params) + 0.5 * leaf(s1.g_params)
    np.testing.assert_allclose(np.asarray(leaf(s1.ema_params)), np.asarray(want), rtol=1e-6)

    # round-trip incl. restore into an EMA-less template (sampler path)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save(jax.device_get(s1))
    restored = ckpt.restore(state_plain)
    np.testing.assert_allclose(
        np.asarray(leaf(restored.ema_params)), np.asarray(leaf(s1.ema_params))
    )
    ckpt.close()

    # restore an EMA-LESS checkpoint into an EMA template: the average must
    # start from a COPY of the restored g_params — aliasing the same buffer
    # into both fields would make the donated jitted step donate it twice
    ckpt2 = CheckpointManager(str(tmp_path / "ckpt2"))
    ckpt2.save(jax.device_get(s0))  # s0 trained without EMA
    restored2 = ckpt2.restore(state)  # template built with ema_decay
    l_g, l_e = leaf(restored2.g_params), leaf(restored2.ema_params)
    np.testing.assert_allclose(np.asarray(l_e), np.asarray(l_g))
    assert l_e.unsafe_buffer_pointer() != l_g.unsafe_buffer_pointer()
    ckpt2.close()


def test_sampler(rng):
    gen, disc, batch, cfg, state, step = _tiny_setup(rng)
    sample = make_sample_fn(gen, cfg)
    img = sample(
        state.g_params, state.g_state, batch["boxes"], batch["labels"], jax.random.PRNGKey(0)
    )
    assert img.shape == batch["images"].shape
    arr = np.asarray(img)
    assert np.isfinite(arr).all() and arr.min() >= -1 and arr.max() <= 1


@pytest.mark.slow
@pytest.mark.parametrize("preset", ["ours_d_context128", "graph128"])
def test_generator_stays_bf16_under_cast_params(rng, preset):
    """Regression: with bf16-cast params and bf16 z/z_im (f32 boxes, as the
    mixed-precision train step produces), the generator forward must stay
    bfloat16 end-to-end. Silent f32 promotions (spectral-norm sigma, numpy
    attention scales, f32 sampling matrices, the f32 GCN adjacency) once
    cost ~10% throughput while reporting themselves as mixed precision."""
    from layout2img_tpu.utils.casting import cast_floating

    gen = make_generator(preset, 10, ch=4, num_mask_classes=10)
    z = jnp.zeros((2, 4, 128))
    z_im = jnp.zeros((2, 128))
    boxes = jnp.full((2, 4, 4), 0.25)
    labels = jnp.ones((2, 4), jnp.int32)
    v = jax.jit(gen.init)(jax.random.PRNGKey(0), z, boxes, labels, z_im)
    vb = {"params": cast_floating(dict(v)["params"], jnp.bfloat16),
          **{k: val for k, val in dict(v).items() if k != "params"}}
    out = jax.jit(lambda vb, z, zi: gen.apply(
        vb, z, boxes, labels, zi, train=False, update_stats=False
    ))(vb, z.astype(jnp.bfloat16), z_im.astype(jnp.bfloat16))
    assert out.dtype == jnp.bfloat16, out.dtype


@pytest.mark.slow
def test_layout2im_sample_stays_bf16(rng):
    """Same regression for the layout2im serving path (bf16 masks + params)."""
    from layout2img_tpu.models.layout2im import Layout2ImGenerator
    from layout2img_tpu.ops.bbox import bbox_mask
    from layout2img_tpu.utils.casting import cast_floating

    g = Layout2ImGenerator(num_classes=10)
    images = jnp.zeros((2, 64, 64, 3))
    boxes = jnp.full((2, 4, 4), 0.25)
    labels = jnp.ones((2, 4), jnp.int32)
    masks = bbox_mask(boxes, 64, 64)
    z = jnp.zeros((2, 4, 8))
    v = dict(jax.jit(g.init)(jax.random.PRNGKey(0), images, labels, boxes,
                             masks, z, jax.random.PRNGKey(1)))
    vb = {"params": cast_floating(v["params"], jnp.bfloat16),
          **{k: val for k, val in v.items() if k != "params"}}
    out = jax.jit(lambda vb, masks, z: g.apply(
        vb, labels, boxes, masks, z, method=Layout2ImGenerator.sample
    ))(vb, masks.astype(jnp.bfloat16), z.astype(jnp.bfloat16))
    assert out.dtype == jnp.bfloat16, out.dtype


@pytest.mark.slow
def test_train_step_mixed_precision(rng):
    from layout2img_tpu.train.state import TrainConfig, create_train_state
    from layout2img_tpu.train.step import make_train_step
    from layout2img_tpu.models.generators import make_generator
    from layout2img_tpu.models.discriminators import LayoutDiscriminator

    gen = make_generator("lostgan64", 10, ch=4)
    disc = LayoutDiscriminator(num_classes=10, image_size=64, ch=4)
    batch = jax.tree_util.tree_map(jnp.asarray, synthetic_batch(rng, 2, 64, 4, 10))
    cfg = TrainConfig(use_vgg_loss=False, mixed_precision=True)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, batch, cfg)
    step = jax.jit(make_train_step(gen, disc, cfg))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # master params stay fp32
    for leaf in jax.tree_util.tree_leaves(new_state.g_params):
        assert leaf.dtype == jnp.float32


def test_vgg_loss_bf16_close_to_f32(rng):
    """--mixed_precision runs the VGG stack in bf16; the value must track the
    f32 loss (f32 tap accumulation) and still return a float32 scalar."""
    from layout2img_tpu.losses.perceptual import VGGLoss

    vgg = VGGLoss()
    fake = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).clip(-1, 1), jnp.float32)
    real = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).clip(-1, 1), jnp.float32)
    f32 = jax.jit(lambda a, b: vgg(a, b))(fake, real)
    bf16 = jax.jit(lambda a, b: vgg(a, b, dtype=jnp.bfloat16))(
        fake.astype(jnp.bfloat16), real.astype(jnp.bfloat16))
    assert f32.dtype == jnp.float32 and bf16.dtype == jnp.float32
    assert abs(float(f32) - float(bf16)) < 0.05 * abs(float(f32)) + 1e-3

    g = jax.grad(lambda a: vgg(a, real, dtype=jnp.bfloat16))(fake)
    assert np.isfinite(np.asarray(g, np.float32)).all() and np.abs(np.asarray(g, np.float32)).max() > 0


@pytest.mark.slow
def test_sample_fn_sharded_matches_single(rng):
    """Multi-chip serving path (cli.sample): batch sharded over the mesh with
    replicated params produces the same images as the single-device jit —
    the z draw is counter-based (placement-invariant) and eval-mode BN has
    no cross-sample coupling."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    gen, disc, batch, cfg, state, step = _tiny_setup(rng, b=8)
    sample = make_sample_fn(gen, cfg)
    key = jax.random.PRNGKey(3)
    ref = jax.jit(sample)(
        state.g_params, state.g_state, batch["boxes"], batch["labels"], key)

    mesh = make_mesh(jax.devices()[:8])
    repl, data = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
    out = jax.jit(sample)(
        jax.device_put(state.g_params, repl),
        jax.device_put(state.g_state, repl),
        jax.device_put(batch["boxes"], data),
        jax.device_put(batch["labels"], data),
        key,
    )
    assert out.sharding.is_equivalent_to(data, out.ndim)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_async_saver_survives_donation(rng, tmp_path):
    """AsyncSaver must capture the state BEFORE the next donated step
    invalidates its buffers: save at step 1, keep training (donating), and
    the restored checkpoint equals the state at step 1 — not a later one,
    and not garbage from a freed buffer."""
    from layout2img_tpu.train.checkpoint import AsyncSaver, CheckpointManager

    gen, disc, batch, cfg, state, step = _tiny_setup(rng)
    jstep = jax.jit(step, donate_argnums=(0,))

    state, _ = jstep(state, batch, jax.random.PRNGKey(0))
    want = jax.device_get(state.g_params)  # host copy of the step-1 params

    ckpt = AsyncSaver(CheckpointManager(str(tmp_path / "ckpt")))
    ckpt.save(state)
    # keep training immediately: donation consumes the old state's buffers
    # while the async D2H/write is (potentially) still running
    for i in range(2):
        state, _ = jstep(state, batch, jax.random.PRNGKey(1 + i))
    ckpt.wait()

    template = create_train_state(
        jax.random.PRNGKey(0), gen, disc, batch, TrainConfig(use_vgg_loss=False))
    restored = ckpt.restore(template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # params kept moving after the snapshot (the saved copy is not aliased)
    moved = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(want),
                        jax.tree_util.tree_leaves(state.g_params)))
    assert moved > 0
    ckpt.close()


@pytest.mark.slow
def test_checkpoint_manager_async_save_survives_donation(rng, tmp_path):
    """CheckpointManager(async_save=True) — the multi-host async mode — must
    serialize off-device inside save() (Orbax contract), so training may
    donate the state buffers immediately after save() returns and the
    finalized checkpoint still equals the state at save time."""
    from layout2img_tpu.train.checkpoint import CheckpointManager

    gen, disc, batch, cfg, state, step = _tiny_setup(rng)
    jstep = jax.jit(step, donate_argnums=(0,))

    state, _ = jstep(state, batch, jax.random.PRNGKey(0))
    want = jax.device_get(state.g_params)

    ckpt = CheckpointManager(str(tmp_path / "ckpt"), async_save=True)
    ckpt.save(state)
    for i in range(2):
        state, _ = jstep(state, batch, jax.random.PRNGKey(1 + i))
    ckpt.wait()

    template = create_train_state(
        jax.random.PRNGKey(0), gen, disc, batch, TrainConfig(use_vgg_loss=False))
    restored = CheckpointManager(str(tmp_path / "ckpt")).restore(template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.close()
