"""Eval subsystem tests: metric formulas (golden), inception/lpips plumbing,
checkpoint round-trip."""

import os

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


def test_evaluate_input_modes(tmp_path, rng):
    """The eval driver's four input modes (reference IS.py:40-79): flat dir,
    npy, dir-of-dirs list, and superdir result*/images scanning — plus the
    batched decoder's shapes/range."""
    import argparse

    import PIL.Image

    from layout2img_tpu.cli.evaluate import (
        iter_file_batches,
        list_images,
        resolve_sources,
    )

    def write_imgs(d, n):
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            arr = rng.integers(0, 255, (16, 16, 3), np.uint8)
            PIL.Image.fromarray(arr).save(d / f"img{i}.png")

    flat = tmp_path / "flat"
    write_imgs(flat, 5)
    super_root = tmp_path / "super"
    for r in ("result_a", "result_b"):
        write_imgs(super_root / r / "images", 3)
    (super_root / "not_result").mkdir()
    lst = tmp_path / "dirs.txt"
    lst.write_text(f"{flat}\n{super_root / 'result_a' / 'images'}\n")
    npy = tmp_path / "imgs.npy"
    np.save(npy, rng.integers(0, 255, (4, 16, 16, 3), np.uint8))

    def args(**kw):
        base = dict(dir="", npy="", dir_list="", superdir="", batch_size=2,
                    limit=0, resize=0)
        base.update(kw)
        return argparse.Namespace(**base)

    # flat dir: 5 images in batches of 2 -> 2+2+1
    (name, batches), = resolve_sources(args(dir=str(flat)))
    shapes = [b.shape for b in batches]
    assert shapes == [(2, 16, 16, 3), (2, 16, 16, 3), (1, 16, 16, 3)]

    # npy (uint8 -> [-1, 1])
    (_, batches), = resolve_sources(args(npy=str(npy)))
    arrs = list(batches)
    assert sum(a.shape[0] for a in arrs) == 4
    assert all(a.min() >= -1 and a.max() <= 1 for a in arrs)

    # dir list: one source per line
    sources = resolve_sources(args(dir_list=str(lst)))
    assert [os.path.basename(os.path.dirname(n)) or n for n, _ in sources]
    assert len(sources) == 2

    # superdir: only result*/images picked up
    sources = resolve_sources(args(superdir=str(super_root)))
    assert len(sources) == 2
    assert all("images" in n for n, _ in sources)

    # value range + resize of the file decoder
    batch = next(iter_file_batches(list_images(str(flat)), 4, resize=8))
    assert batch.shape == (4, 8, 8, 3)
    assert batch.min() >= -1 and batch.max() <= 1

    # exactly-one-input enforcement
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        resolve_sources(args())
    with _pytest.raises(SystemExit):
        resolve_sources(args(dir=str(flat), npy=str(npy)))


def test_fid_stats_roundtrip(tmp_path, rng):
    """Precomputed-stats FID (save/load .npz, pytorch-fid convention) must
    equal the two-feature-set FID exactly."""
    from layout2img_tpu.eval.metrics import (
        feature_stats,
        load_feature_stats,
        save_feature_stats,
    )

    a = rng.normal(size=(64, 16))
    b = rng.normal(loc=0.3, size=(48, 16))
    direct = fid_from_features(a, b)

    mu_b, sig_b = feature_stats(b)
    path = tmp_path / "ref.npz"
    save_feature_stats(str(path), mu_b, sig_b, len(b))
    mu_l, sig_l, n = load_feature_stats(str(path))
    assert n == 48
    mu_a, sig_a = feature_stats(a)
    via_stats = frechet_distance(mu_a, sig_a, mu_l, sig_l)
    assert abs(via_stats - direct) < 1e-9

    # malformed files are rejected with a clear error
    bad = tmp_path / "bad.npz"
    np.savez(bad, mu=np.zeros(4))
    with pytest.raises(ValueError):
        load_feature_stats(str(bad))
    bad2 = tmp_path / "bad2.npz"
    np.savez(bad2, mu=np.zeros(4), sigma=np.zeros((3, 3)))
    with pytest.raises(ValueError):
        load_feature_stats(str(bad2))


@pytest.mark.slow
def test_evaluate_fid_stats_cli(tmp_path, rng):
    """fid --save_stats then --ref_stats through the real CLI (random-filter
    inception on tiny images): the cached-reference FID of the reference
    against itself is ~0."""
    import PIL.Image

    from layout2img_tpu.cli import evaluate as ev

    d = tmp_path / "real"
    d.mkdir()
    for i in range(8):
        arr = rng.integers(0, 255, (75, 75, 3), np.uint8)
        PIL.Image.fromarray(arr).save(d / f"img{i}.png")

    stats = tmp_path / "ref.npz"
    common = ["--batch_size", "4"]
    ev.main(["fid", "--dir", str(d), "--save_stats", str(stats)] + common)
    assert stats.exists()

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ev.main(["fid", "--dir", str(d), "--ref_stats", str(stats)] + common)
    line = [ln for ln in buf.getvalue().splitlines() if ln.startswith("FID:")][0]
    fid = float(line.split()[1])
    # identical distributions; covariance regularization keeps it near zero
    assert fid < 1.0

    with pytest.raises(SystemExit):
        ev.main(["fid", "--dir", str(d), "--ref_dir", str(d),
                 "--ref_stats", str(stats)] + common)
    with pytest.raises(SystemExit):
        ev.main(["fid", "--dir", str(d)] + common)


def test_kid_matches_naive_rederivation(rng):
    """kid_from_features against a per-pair double-loop rederivation of the
    unbiased polynomial-kernel MMD^2 on one full-set subset."""
    from layout2img_tpu.eval.metrics import kid_from_features

    m, d = 6, 5
    x = rng.normal(size=(m, d))
    y = rng.normal(size=(m, d)) + 0.5

    def k(a, b):
        return (float(a @ b) / d + 1.0) ** 3

    mmd = 0.0
    for i in range(m):
        for j in range(m):
            if i != j:
                mmd += (k(x[i], x[j]) + k(y[i], y[j])) / (m * (m - 1))
            mmd -= 2.0 * k(x[i], y[j]) / (m * m)
    # subset_size >= m and 1 subset => the estimator sees the full sets
    got, std = kid_from_features(x, y, subset_size=m, num_subsets=1)
    np.testing.assert_allclose(got, mmd, rtol=1e-10)
    assert std == 0.0


def test_kid_properties(rng):
    """Same distribution ~0 (unbiased, can go slightly negative); a mean
    shift is clearly positive; degenerate inputs rejected."""
    from layout2img_tpu.eval.metrics import kid_from_features

    a = rng.normal(size=(300, 16))
    b = rng.normal(size=(300, 16))
    same, _ = kid_from_features(a, b, subset_size=100, num_subsets=20)
    shifted, _ = kid_from_features(a, b + 1.0, subset_size=100, num_subsets=20)
    assert abs(same) < 0.05
    assert shifted > 10 * abs(same)

    with pytest.raises(ValueError):
        kid_from_features(a, rng.normal(size=(300, 8)))
    with pytest.raises(ValueError):
        kid_from_features(a[:1], b[:1])


def test_evaluate_kid_cli(tmp_path, rng):
    """kid through the real CLI (random-filter inception on tiny images):
    a directory against itself is ~0, and --ref_dir is required."""
    import PIL.Image

    from layout2img_tpu.cli import evaluate as ev

    d = tmp_path / "real"
    d.mkdir()
    for i in range(8):
        arr = rng.integers(0, 255, (75, 75, 3), np.uint8)
        PIL.Image.fromarray(arr).save(d / f"img{i}.png")

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ev.main(["kid", "--dir", str(d), "--ref_dir", str(d),
                 "--batch_size", "4", "--kid_subsets", "5"])
    line = [ln for ln in buf.getvalue().splitlines() if ln.startswith("KID:")][0]
    kid_e3 = float(line.split()[1])
    assert abs(kid_e3) < 50.0  # x10^-3 units; identical dirs stay near zero

    with pytest.raises(SystemExit):
        ev.main(["kid", "--dir", str(d), "--batch_size", "4"])


def test_run_inception_batches_mesh_matches_single(rng):
    """Multi-chip eval path: image chunks sharded over the 8-device CPU mesh
    produce the same features/probs as the single-device run (per-image
    features are placement-invariant; cli.evaluate turns this on whenever
    several devices are visible)."""
    from layout2img_tpu.eval.metrics import run_inception_batches
    from layout2img_tpu.parallel.mesh import make_mesh

    k = jnp.asarray(rng.standard_normal((12, 5)).astype(np.float32))

    def apply(variables, x):
        f = x.reshape(x.shape[0], -1) @ variables
        return f, f * 0.1  # (feats, logits)

    imgs = rng.standard_normal((10, 2, 2, 3)).astype(np.float32)
    f1, p1 = run_inception_batches(apply, k, iter([imgs[:8], imgs[8:]]), 8)
    mesh = make_mesh(jax.devices()[:8])
    f2, p2 = run_inception_batches(apply, k, iter([imgs[:8], imgs[8:]]), 8, mesh=mesh)
    assert f1.shape == (10, 5)
    # sharded matmuls accumulate in a different order -> float-level only
    np.testing.assert_allclose(f1, f2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-6)

    # non-divisible batch: padded up to the next multiple of the mesh size
    # (8 here), still sharded, pad rows sliced back off — numbers unchanged
    f3, _ = run_inception_batches(apply, k, iter([imgs[:5], imgs[5:10]]), 5, mesh=mesh)
    np.testing.assert_allclose(f1, f3, rtol=1e-4, atol=1e-5)
