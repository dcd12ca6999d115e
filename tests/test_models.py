"""Forward-shape and sanity tests for the generator/discriminator zoo
(tiny channel configs so they run on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layout2img_tpu.models.discriminators import LayoutDiscriminator
from layout2img_tpu.models.generators import BgFgGenerator, LostGANGenerator, make_generator


def _layout(rng, b=2, o=4, num_classes=10):
    z = rng.standard_normal((b, o, 128)).astype(np.float32)
    xy = rng.random((b, o, 2)).astype(np.float32) * 0.5
    wh = rng.random((b, o, 2)).astype(np.float32) * 0.45 + 0.05
    boxes = np.concatenate([xy, wh], -1)
    labels = rng.integers(1, num_classes, (b, o)).astype(np.int32)
    labels[:, -1] = 0
    boxes[:, -1] = [-0.6, -0.6, 0.5, 0.5]
    z_im = rng.standard_normal((b, 128)).astype(np.float32)
    return jnp.asarray(z), jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(z_im)


GEN_CASES = [
    ("lostgan128", dict(), 128),
    ("ours_d_base128", dict(), 128),
    ("ours_d_context128", dict(), 128),
    ("context128", dict(), 128),
    ("context128_nogeo", dict(), 128),
    ("graph128", dict(), 128),
]


@pytest.mark.parametrize("preset,overrides,size", GEN_CASES)
def test_generator_presets_forward(rng, preset, overrides, size):
    num_classes = 10
    gen = make_generator(preset, num_classes, ch=4, num_mask_classes=num_classes, **overrides)
    z, boxes, labels, z_im = _layout(rng, num_classes=num_classes)
    variables = gen.init(jax.random.PRNGKey(0), z, boxes, labels, z_im)
    img, _ = gen.apply(
        variables, z, boxes, labels, z_im, mutable=["batch_stats", "spectral"]
    )
    assert img.shape == (2, size, size, 3)
    arr = np.asarray(img)
    assert np.isfinite(arr).all()
    assert arr.min() >= -1.0 and arr.max() <= 1.0


def test_generator_64(rng):
    gen = LostGANGenerator(num_classes=10, image_size=64, ch=4, emb_dim=128, mask_trunk="v1")
    z, boxes, labels, z_im = _layout(rng)
    variables = gen.init(jax.random.PRNGKey(0), z, boxes, labels, z_im)
    img, _ = gen.apply(variables, z, boxes, labels, z_im, mutable=["batch_stats", "spectral"])
    assert img.shape == (2, 64, 64, 3)


def test_generator_256(rng):
    gen = make_generator("ours_d_base256", 10, ch=2, num_mask_classes=10)
    z, boxes, labels, z_im = _layout(rng)
    variables = gen.init(jax.random.PRNGKey(0), z, boxes, labels, z_im)
    img, _ = gen.apply(variables, z, boxes, labels, z_im, mutable=["batch_stats", "spectral"])
    assert img.shape == (2, 256, 256, 3)


def test_bgfg_generator(rng):
    b, o = 2, 3
    gen = BgFgGenerator(num_fg_classes=5, num_bg_classes=6, ch=4)
    z_f, boxes_f, labels_f, z_im_f = _layout(rng, b, o, 5)
    z_b, boxes_b, labels_b, z_im_b = _layout(rng, b, o, 6)
    variables = gen.init(
        jax.random.PRNGKey(0), z_f, boxes_f, labels_f, z_b, boxes_b, labels_b, z_im_f, z_im_b
    )
    img, _ = gen.apply(
        variables, z_f, boxes_f, labels_f, z_b, boxes_b, labels_b, z_im_f, z_im_b,
        mutable=["batch_stats", "spectral"],
    )
    assert img.shape == (b, 64, 64, 3)


@pytest.mark.parametrize("size,app", [(128, True), (128, False), (64, False), (256, True)])
def test_discriminator_forward(rng, size, app):
    b, o, num_classes = 2, 4, 10
    disc = LayoutDiscriminator(num_classes=num_classes, image_size=size, ch=4, app_head=app)
    images = jnp.asarray(rng.standard_normal((b, size, size, 3)).astype(np.float32))
    _, boxes, labels, _ = _layout(rng, b, o, num_classes)
    variables = disc.init(jax.random.PRNGKey(0), images, boxes, labels)
    out, _ = disc.apply(variables, images, boxes, labels, mutable=["spectral"])
    assert out["image"].shape == (b, 1)
    assert out["object"].shape == (b, o)
    assert out["valid"].shape == (b, o)
    np.testing.assert_array_equal(np.asarray(out["valid"][:, -1]), 0.0)
    if app:
        assert out["app"].shape == (b, o)
    assert np.isfinite(np.asarray(out["image"])).all()
    assert np.isfinite(np.asarray(out["object"])).all()


def test_generator_eval_mode_deterministic(rng):
    gen = make_generator("ours_d_base128", 10, ch=4, num_mask_classes=10)
    z, boxes, labels, z_im = _layout(rng)
    variables = gen.init(jax.random.PRNGKey(0), z, boxes, labels, z_im)
    a = gen.apply(variables, z, boxes, labels, z_im, train=False, update_stats=False)
    b_ = gen.apply(variables, z, boxes, labels, z_im, train=False, update_stats=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_part_mask_generator(rng):
    gen = make_generator("context128_part", 10, ch=4, num_mask_classes=10)
    z, boxes, labels, z_im = _layout(rng)
    variables = gen.init(jax.random.PRNGKey(0), z, boxes, labels, z_im)
    img, _ = gen.apply(variables, z, boxes, labels, z_im, mutable=["batch_stats", "spectral"])
    assert img.shape == (2, 128, 128, 3)
    # part norm: weight projection has 3x features
    wp = variables["params"]["res1"]["b1"]["weight_proj"]["kernel"]
    assert wp.shape[-1] == 3 * 64  # 3 parts x in_ch(16*ch=64)
