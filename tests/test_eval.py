"""Eval subsystem tests: metric formulas (golden), inception/lpips plumbing,
checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layout2img_tpu.eval.metrics import fid_from_features, frechet_distance, inception_score


def test_inception_score_uniform_is_one():
    probs = np.full((30, 10), 0.1)
    mean, std = inception_score(probs, splits=3)
    assert abs(mean - 1.0) < 1e-6
    assert std < 1e-6


def test_inception_score_confident_diverse_is_high():
    # each image fully confident, classes uniformly covered -> IS == num_classes
    n, c = 30, 10
    probs = np.zeros((n, c))
    probs[np.arange(n), np.arange(n) % c] = 1.0
    mean, _ = inception_score(probs, splits=3)
    assert abs(mean - c) < 1e-6


def test_frechet_distance_identity_zero(rng):
    f = rng.standard_normal((500, 16))
    assert fid_from_features(f, f.copy()) < 1e-6


def test_frechet_distance_mean_shift():
    mu1, mu2 = np.zeros(4), np.ones(4) * 2
    s = np.eye(4)
    d = frechet_distance(mu1, s, mu2, s)
    assert abs(d - 16.0) < 1e-8  # ||mu||^2 = 4 * 4


def test_inception_v3_forward_shapes(rng):
    from layout2img_tpu.eval.inception import InceptionV3

    net = InceptionV3()
    x = jnp.asarray(rng.uniform(-1, 1, (2, 75, 75, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    feats, logits = net.apply(variables, x)
    assert feats.shape == (2, 2048)
    assert logits.shape == (2, 1000)
    assert np.isfinite(np.asarray(feats)).all()


def test_lpips_properties(rng):
    from layout2img_tpu.eval.lpips import LPIPS

    lp = LPIPS()
    a = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    d_same = np.asarray(lp(a, a))
    d_diff = np.asarray(lp(a, b))
    assert d_same.shape == (2,)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert (d_diff > 0).all()


def test_checkpoint_roundtrip(tmp_path, rng):
    from layout2img_tpu.data.synthetic import synthetic_batch
    from layout2img_tpu.models.discriminators import LayoutDiscriminator
    from layout2img_tpu.models.generators import make_generator
    from layout2img_tpu.train.checkpoint import CheckpointManager
    from layout2img_tpu.train.state import TrainConfig, create_train_state

    gen = make_generator("lostgan64", 10, ch=4)
    disc = LayoutDiscriminator(num_classes=10, image_size=64, ch=4)
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_batch(rng, 2, 64, 4, 10)
    )
    cfg = TrainConfig(use_vgg_loss=False)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, batch, cfg)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(state, step=7)
    assert mgr.latest_step() == 7

    # perturb then restore
    zeroed = state.replace(
        g_params=jax.tree_util.tree_map(jnp.zeros_like, state.g_params)
    )
    restored = mgr.restore(zeroed)
    a = jax.tree_util.tree_leaves(state.g_params)[0]
    b = jax.tree_util.tree_leaves(restored.g_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()
