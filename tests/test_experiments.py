"""Every EXPERIMENTS preset runs one tiny train step at its native image
size (VERDICT round-1 gap: `context_part` / 256px had models but no runnable
experiment). Special families (ours_ed, layout2im) have their own trainer
tests in test_trainers_extra.py / test_layout2im.py."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from layout2img_tpu.cli.presets import EXPERIMENTS
from layout2img_tpu.data.synthetic import synthetic_batch
from layout2img_tpu.models.discriminators import make_discriminator
from layout2img_tpu.models.generators import make_generator
from layout2img_tpu.train.state import TrainConfig, create_train_state
from layout2img_tpu.train.step import make_train_step

GENERIC = sorted(name for name, e in EXPERIMENTS.items() if not e.special)


@pytest.mark.parametrize("name", GENERIC)
def test_experiment_preset_train_step(rng, name):
    exp = EXPERIMENTS[name]
    num_classes, b, o = 10, 2, 4
    gen = make_generator(exp.gen_preset, num_classes, ch=4,
                         num_mask_classes=num_classes, image_size=exp.image_size)
    disc = make_discriminator(exp.disc_preset, num_classes, ch=4,
                              image_size=exp.image_size)
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_batch(rng, b, exp.image_size, o, num_classes)
    )
    cfg = TrainConfig(use_vgg_loss=False)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, batch, cfg)
    step = jax.jit(make_train_step(gen, disc, cfg))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (name, k)


def test_256_preset_keeps_hard_mask_canvas():
    """The 256px experiment must carry the reference's occupancy canvas
    (hard_mask_size=128, resnet_generator_app_v2.py:509-625) even though the
    mask-regress splat canvas stays 64."""
    exp = EXPERIMENTS["ours_d_256"]
    gen = make_generator(exp.gen_preset, 10, ch=4, image_size=exp.image_size)
    assert gen.image_size == 256
    assert gen.hard_mask_size == 128
    assert gen.map_size == 64


def test_img_size_upscale_errors():
    """--img_size above the preset's native size must error (round-1 bug:
    --img_size 256 on a 128 preset silently built a wrong model)."""
    from layout2img_tpu.cli.train import main

    with pytest.raises(SystemExit, match="ours_d_256"):
        main([
            "--model", "ours_d", "--dataset", "synthetic", "--img_size", "256",
            "--total_epoch", "1", "--steps_per_epoch", "1", "--batch_size", "2",
            "--ch", "4", "--no_vgg",
        ])
