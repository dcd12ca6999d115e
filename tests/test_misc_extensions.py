"""Tests: paste_boxes golden, ConvLSTM fusion variant, EMA, multi-host helper."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from layout2img_tpu.ops.interp import crop_boxes, masks_to_layout, paste_boxes


def test_paste_boxes_matches_masks_to_layout(rng):
    """Single-channel paste must equal masks_to_layout exactly."""
    b, o, m = 2, 3, 16
    crops = rng.random((b, o, m, m, 1)).astype(np.float32)
    boxes = np.concatenate(
        [rng.random((b, o, 2)) * 0.5, rng.random((b, o, 2)) * 0.4 + 0.1], -1
    ).astype(np.float32)
    got = np.asarray(paste_boxes(jnp.asarray(crops), jnp.asarray(boxes), 48))
    want = np.asarray(masks_to_layout(jnp.asarray(boxes), jnp.asarray(crops[..., 0]), 48))
    np.testing.assert_allclose(got[..., 0], want, rtol=1e-5, atol=1e-6)


def test_paste_boxes_multichannel_roundtrip_center(rng):
    """crop -> paste round-trips a linear gradient exactly in the box
    interior (bilinear resampling is exact on affine images)."""
    b, o = 1, 1
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64
    img = np.stack([xx, yy, xx + yy], -1)[None]
    boxes = np.array([[[0.25, 0.25, 0.5, 0.5]]], np.float32)
    crops = crop_boxes(jnp.asarray(img), jnp.asarray(boxes), 32)
    back = np.asarray(paste_boxes(crops, jnp.asarray(boxes), 64))
    # sub-pixel convention mismatch between the reference's crop (inclusive
    # endpoint linspace) and uncrop (grid inverse) bounds the roundtrip
    np.testing.assert_allclose(
        back[0, 0, 20:44, 20:44], img[0, 20:44, 20:44], atol=2.5e-2
    )
    # outside the box must be zero
    assert np.abs(back[0, 0, :14]).max() == 0.0


def test_convlstm_fusion_variant(rng):
    from layout2img_tpu.models.layout2im import Layout2ImGenerator
    from layout2img_tpu.ops.bbox import bbox_mask

    b, o, zd = 1, 3, 8
    images = jnp.asarray(rng.uniform(-1, 1, (b, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, 8, (b, o)).astype(np.int32))
    boxes = jnp.asarray((rng.random((b, o, 4)) * 0.4 + 0.1).astype(np.float32))
    masks = bbox_mask(boxes, 64, 64)
    z_rand = jnp.asarray(rng.standard_normal((b, o, zd)).astype(np.float32))

    gen = Layout2ImGenerator(num_classes=8, fusion="convlstm")
    variables = gen.init(jax.random.PRNGKey(0), images, labels, boxes, masks, z_rand, jax.random.PRNGKey(1))
    assert "clstm" in variables["params"]["layout_encoder"]
    out, _ = gen.apply(
        variables, images, labels, boxes, masks, z_rand, jax.random.PRNGKey(1),
        mutable=["batch_stats"],
    )
    assert out["img_rand"].shape == (b, 64, 64, 3)
    assert np.isfinite(np.asarray(out["img_rand"])).all()


def test_convlstm_pad_steps_keep_state(rng):
    from layout2img_tpu.models.convlstm import LayoutConvLSTM

    b, o, s, c = 2, 4, 8, 16
    feats = jnp.asarray(rng.standard_normal((b, o, s, s, c)).astype(np.float32))
    valid = jnp.asarray(np.array([[1, 1, 0, 0], [1, 1, 1, 1]], np.float32))
    mod = LayoutConvLSTM((8, 8))
    variables = mod.init(jax.random.PRNGKey(0), feats, valid)
    out1 = mod.apply(variables, feats, valid)
    # perturbing padded slots must not change the output of row 0
    feats2 = feats.at[0, 2:].add(100.0)
    out2 = mod.apply(variables, feats2, valid)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]), rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(out1[1]) - np.asarray(out2[1])).max() == 0  # row 1 untouched slots


def test_ema(rng):
    from layout2img_tpu.train.ema import ema_init, ema_update

    p = {"a": jnp.ones(3), "b": jnp.zeros(2)}
    ema = ema_init(p)
    p2 = {"a": jnp.full(3, 2.0), "b": jnp.ones(2)}
    ema = ema_update(ema, p2, decay=0.9)
    np.testing.assert_allclose(np.asarray(ema["a"]), 1.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ema["b"]), 0.1, rtol=1e-6)


def test_shard_host_local_batch_single_process(rng):
    from layout2img_tpu.parallel.mesh import make_mesh, shard_host_local_batch

    mesh = make_mesh(jax.devices("cpu")[:8])
    batch = {"x": rng.standard_normal((16, 4)).astype(np.float32)}
    sharded = shard_host_local_batch(mesh, batch)
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


def test_device_prefetch(rng):
    from layout2img_tpu.data.prefetch import device_prefetch

    batches = [{"x": rng.standard_normal((4, 3)).astype(np.float32)} for _ in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for a, b in zip(out, batches):
        np.testing.assert_array_equal(np.asarray(a["x"]), b["x"])


def test_device_prefetch_propagates_errors():
    """A loader/transfer failure must raise in the training loop, not
    silently end the epoch early (the worker used to swallow it)."""
    import pytest

    from layout2img_tpu.data.prefetch import device_prefetch

    def gen():
        yield {"x": np.ones(2, np.float32)}
        raise RuntimeError("loader failed")

    it = device_prefetch(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="loader failed"):
        next(it)


def test_npy_batches_float_range_detection(tmp_path):
    """--npy floats in [0,1] / [0,255] are rescaled to the [-1,1] Inception
    domain instead of silently passing through."""
    from layout2img_tpu.cli.evaluate import _npy_batches

    arr01 = np.random.default_rng(0).random((4, 8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "a.npy")
    np.save(p, arr01)
    out = np.concatenate(list(_npy_batches(p, 2, None)))
    np.testing.assert_allclose(out, arr01 * 2 - 1, rtol=1e-6)

    arr_pm1 = arr01 * 2 - 1  # already [-1,1]: pass-through
    np.save(p, arr_pm1)
    out = np.concatenate(list(_npy_batches(p, 2, None)))
    np.testing.assert_allclose(out, arr_pm1, rtol=1e-6)

    arr255 = arr01 * 255.0  # [0,255] floats
    np.save(p, arr255)
    out = np.concatenate(list(_npy_batches(p, 2, None)))
    np.testing.assert_allclose(out, arr01 * 2 - 1, rtol=1e-5)

    arr8 = (arr01 * 255).astype(np.uint8)
    np.save(p, arr8)
    out = np.concatenate(list(_npy_batches(p, 2, None)))
    np.testing.assert_allclose(out, arr8.astype(np.float32) / 255 * 2 - 1)


@pytest.mark.slow
def test_cli_train_smoke_synthetic(tmp_path):
    """The CLI surface end-to-end on a minimal config (also covered by the
    project verify skill; kept here so the suite exercises it)."""
    from layout2img_tpu.cli.train import main

    main([
        "--model", "lostgan", "--dataset", "synthetic", "--total_epoch", "1",
        "--steps_per_epoch", "1", "--batch_size", "2", "--img_size", "64",
        "--ch", "4", "--no_vgg", "--log_every", "1", "--out_path", str(tmp_path),
    ])
    import os

    root = tmp_path / "synthetic" / "64" / "lostgan"
    assert (root / "metrics.jsonl").exists()
    assert (root / "ckpt").exists() and os.listdir(root / "ckpt")


@pytest.mark.slow
def test_cli_train_smoke_model_parallel(tmp_path):
    """--model_parallel 2 on the 8-device CPU mesh: the (data, model)
    tensor-parallel path through the full CLI (sharded state placement,
    prefetch put_fn, checkpoint save of sharded arrays)."""
    from layout2img_tpu.cli.train import main

    main([
        "--model", "lostgan", "--dataset", "synthetic", "--total_epoch", "1",
        "--steps_per_epoch", "1", "--batch_size", "4", "--img_size", "64",
        "--ch", "4", "--no_vgg", "--log_every", "1", "--out_path", str(tmp_path),
        "--model_parallel", "2", "--mp_mode", "tensor",
    ])
    import os

    root = tmp_path / "synthetic" / "64" / "lostgan"
    assert (root / "metrics.jsonl").exists()
    assert (root / "ckpt").exists() and os.listdir(root / "ckpt")


@pytest.mark.slow
def test_cli_export_roundtrip(tmp_path):
    """Export a tiny generator to a StableHLO artifact, then load and run it
    through the same CLI (--run) — the serving path end-to-end."""
    from layout2img_tpu.cli.export import main

    out = str(tmp_path / "gen.stablehlo")
    main(["--model", "lostgan", "--dataset", "synthetic", "--img_size", "64",
          "--ch", "4", "--batch_size", "2", "--out", out])
    assert (tmp_path / "gen.stablehlo").exists()
    assert (tmp_path / "gen.stablehlo.json").exists()
    main(["--run", out])
    # bf16 serving-precision artifact round-trips too
    out16 = str(tmp_path / "gen16.stablehlo")
    main(["--model", "lostgan", "--dataset", "synthetic", "--img_size", "64",
          "--ch", "4", "--batch_size", "2", "--bf16", "--out", out16])
    main(["--run", out16])


def test_top_level_api():
    import layout2img_tpu as l2i

    gen = l2i.make_generator("lostgan64", 10, ch=4)
    assert gen.num_classes == 10
    assert l2i.TrainConfig().z_dim == 128


@pytest.mark.slow
def test_batched_d_pass_scores_identical(rng):
    """Concatenating real+fake into one D pass must give identical scores to
    two passes (no cross-sample coupling in the D) — the basis for the
    fused-D train-step optimization."""
    from layout2img_tpu.models.discriminators import LayoutDiscriminator

    b, o = 2, 4
    disc = LayoutDiscriminator(num_classes=10, image_size=64, ch=4)
    imgs_r = jnp.asarray(rng.standard_normal((b, 64, 64, 3)).astype(np.float32))
    imgs_f = jnp.asarray(rng.standard_normal((b, 64, 64, 3)).astype(np.float32))
    boxes = jnp.asarray((rng.random((b, o, 4)) * 0.4 + 0.1).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, 10, (b, o)).astype(np.int32))
    variables = disc.init(jax.random.PRNGKey(0), imgs_r, boxes, labels)

    out_r = disc.apply(variables, imgs_r, boxes, labels, update_stats=False)
    out_f = disc.apply(variables, imgs_f, boxes, labels, update_stats=False)
    both = disc.apply(
        variables,
        jnp.concatenate([imgs_r, imgs_f]),
        jnp.concatenate([boxes, boxes]),
        jnp.concatenate([labels, labels]),
        update_stats=False,
    )
    np.testing.assert_allclose(np.asarray(both["image"][:b]), np.asarray(out_r["image"]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(both["image"][b:]), np.asarray(out_f["image"]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(both["object"][:b]), np.asarray(out_r["object"]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(both["object"][b:]), np.asarray(out_f["object"]), rtol=2e-5, atol=2e-5)
