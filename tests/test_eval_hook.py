"""Periodic in-training eval (--eval_every): the live rel-FID/IS trajectory
the reference only gets offline via IS.py (train/eval_hook.py)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles InceptionV3 on CPU (~minutes)


def test_train_eval_every_logs_rel_fid(tmp_path):
    from layout2img_tpu.cli import train as train_cli

    out = str(tmp_path / "out")
    train_cli.main([
        "--model", "ours_d", "--dataset", "synthetic", "--total_epoch", "1",
        "--steps_per_epoch", "4", "--batch_size", "2", "--img_size", "64",
        "--ch", "4", "--no_vgg", "--log_every", "10", "--out_path", out,
        "--eval_every", "2", "--eval_n", "2", "--seed", "3",
    ])
    metrics = os.path.join(out, "synthetic", "64", "ours_d", "metrics.jsonl")
    rows = [json.loads(l) for l in open(metrics)]
    evals = [r for r in rows if "rel_fid" in r]
    assert [r["step"] for r in evals] == [2, 4]
    assert all(np.isfinite(r["rel_fid"]) and r["rel_fid"] >= 0 for r in evals)
    # random-filter mode must not emit a (meaningless) IS
    assert all("is_mean" not in r for r in evals)


@pytest.mark.parametrize("model,ch", [("layout2im", "8"), ("ours_ed", "4")])
def test_train_eval_every_special_family(tmp_path, model, ch):
    """main_special gets the same --eval_every hook (r5): PeriodicEval in
    batch_mode with family-appropriate samplers (the ours_ed sampler needs
    the fg/bg-split fields, layout2im builds masks from the boxes)."""
    from layout2img_tpu.cli import train as train_cli

    out = str(tmp_path / "out")
    train_cli.main([
        "--model", model, "--dataset", "synthetic", "--total_epoch", "1",
        "--steps_per_epoch", "4", "--batch_size", "2", "--img_size", "64",
        "--ch", ch, "--no_vgg", "--log_every", "10", "--out_path", out,
        "--eval_every", "2", "--eval_n", "2", "--seed", "3",
    ])
    metrics = os.path.join(out, "synthetic", "64", model, "metrics.jsonl")
    rows = [json.loads(l) for l in open(metrics)]
    evals = [r for r in rows if "rel_fid" in r]
    assert [r["step"] for r in evals] == [2, 4]
    assert all(np.isfinite(r["rel_fid"]) and r["rel_fid"] >= 0 for r in evals)
    assert all("is_mean" not in r for r in evals)


def test_eval_hook_deterministic_and_ema_preference(tmp_path):
    """Same state -> identical rel_fid (frozen layouts + frozen z); the hook
    evaluates EMA params when present."""
    import jax
    import jax.numpy as jnp

    from layout2img_tpu.data.synthetic import synthetic_batch
    from layout2img_tpu.models.discriminators import LayoutDiscriminator
    from layout2img_tpu.models.generators import make_generator
    from layout2img_tpu.train.eval_hook import PeriodicEval
    from layout2img_tpu.train.state import TrainConfig, create_train_state
    from layout2img_tpu.train.step import make_sample_fn

    rng = np.random.default_rng(0)
    gen = make_generator("ours_d_context128", 10, ch=4, image_size=64)
    disc = LayoutDiscriminator(num_classes=10, image_size=64, ch=4)
    cfg = TrainConfig(use_vgg_loss=False, ema_decay=0.9)
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_batch(rng, 2, 64, 4, 10))
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, batch, cfg)
    sample_fn = jax.jit(make_sample_fn(gen, cfg))

    pool = [jax.tree_util.tree_map(np.asarray, batch)]
    hook = PeriodicEval(sample_fn, pool, batch_size=2, seed=1)
    host = jax.device_get(state)
    a = hook(host)["rel_fid"]
    b = hook(host)["rel_fid"]
    assert a == b and np.isfinite(a)

    # perturbing only the EMA params changes the result -> EMA is what runs
    assert host.ema_params is not None
    host2 = host.replace(ema_params=jax.tree_util.tree_map(
        lambda p: p + 0.5, host.ema_params))
    c = hook(host2)["rel_fid"]
    assert c != a
