"""Torch-checkpoint fine-tuning: the reference's resume workflow loads G+D
checkpoints into the *training* loop (train_context_app_v2.py:71-104,
train_graph_context_app.py:70-95). Verified here end to end: random-weight
reference torch models -> .pth -> importers -> load_torch_into_state ->
matching initial D scores -> >=2 finite train steps that move the params.
"""

import importlib
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")), reason="reference repo not available"
)]


def test_finetune_from_torch_checkpoints(reference_disc_module, rng, tmp_path):
    torch, dmod = reference_disc_module
    gmod = importlib.import_module("model.resnet_generator_app_v2")

    from layout2img_tpu.data.synthetic import synthetic_batch
    from layout2img_tpu.models.discriminators import make_discriminator
    from layout2img_tpu.models.generators import make_generator
    from layout2img_tpu.train.state import (
        TrainConfig,
        create_train_state,
        load_torch_into_state,
    )
    from layout2img_tpu.train.step import make_train_step
    from layout2img_tpu.utils.torch_import import (
        import_lostgan_discriminator,
        import_lostgan_generator,
    )

    num_classes, b, o = 10, 2, 6
    g_t = gmod.ResnetGenerator128_context(num_classes=num_classes)
    d_t = dmod.CombineDiscriminator128_app(num_classes=num_classes)

    batch = synthetic_batch(rng, b, 128, o, num_classes)

    # settle D spectral u/v so torch's stored-(u, v) sigma matches our
    # recomputed-v sigma (D is not orthogonally initialized)
    d_t.train()
    with torch.no_grad():
        for _ in range(30):
            d_t(torch.from_numpy(np.asarray(batch["images"]).transpose(0, 3, 1, 2)),
                torch.from_numpy(np.asarray(batch["boxes"]).copy()),
                torch.from_numpy(np.asarray(batch["labels"])))
    d_t.eval()
    with torch.no_grad():
        want_img, _, _ = d_t(
            torch.from_numpy(np.asarray(batch["images"]).transpose(0, 3, 1, 2)),
            torch.from_numpy(np.asarray(batch["boxes"]).copy()),
            torch.from_numpy(np.asarray(batch["labels"])),
        )

    # round-trip through .pth files exactly like the CLI flags do
    gp, dp = tmp_path / "g.pth", tmp_path / "d.pth"
    torch.save(g_t.state_dict(), gp)
    torch.save(d_t.state_dict(), dp)

    gen = make_generator("ours_d_context128", num_classes, legacy_attention=True)
    disc = make_discriminator("d128_app", num_classes)
    jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
    cfg = TrainConfig(use_vgg_loss=False)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, jbatch, cfg)

    g_cols, d_cols = set(state.g_state), set(state.d_state)
    state = load_torch_into_state(
        state, cfg,
        import_lostgan_generator(torch.load(gp, map_location="cpu")),
        import_lostgan_discriminator(torch.load(dp, map_location="cpu")),
    )
    # collection sets must match the model exactly — an extra empty
    # batch_stats on the BN-free D broke lax.scan carries (r3 TPU run)
    assert set(state.g_state) == g_cols and set(state.d_state) == d_cols

    # initial D image scores match the reference net we imported from
    out = disc.apply(
        {"params": state.d_params, **state.d_state},
        jbatch["images"], jbatch["boxes"], jbatch["labels"], update_stats=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["image"])[:, 0], want_img.numpy()[:, 0], rtol=1e-3, atol=2e-2
    )

    # training continues: >=2 steps THROUGH A lax.scan CARRY (the structure-
    # sensitive path the on-device training loop uses), finite losses,
    # params move off the import
    step = make_train_step(gen, disc, cfg)

    def two_steps(s, rngs):
        def body(s, r):
            s, m = step(s, jbatch, r)
            return s, m

        return jax.lax.scan(body, s, rngs)

    s2, ms = jax.jit(two_steps)(state, jax.random.split(jax.random.PRNGKey(1), 2))
    m1 = {k: v[0] for k, v in ms.items()}
    m2 = {k: v[1] for k, v in ms.items()}
    assert int(s2.step) == 2
    for m in (m1, m2):
        for k, v in m.items():
            assert np.isfinite(float(v)), k
    moved = jax.tree_util.tree_map(
        lambda a, c: float(jnp.max(jnp.abs(a - c))), state.g_params, s2.g_params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    moved_d = jax.tree_util.tree_map(
        lambda a, c: float(jnp.max(jnp.abs(a - c))), state.d_params, s2.d_params
    )
    assert max(jax.tree_util.tree_leaves(moved_d)) > 0


def test_load_torch_into_state_rejects_mismatched_config(rng):
    """A checkpoint from a different config must fail with a readable error,
    not a silent shape blow-up deep inside jit."""
    from layout2img_tpu.data.synthetic import synthetic_batch
    from layout2img_tpu.models.discriminators import make_discriminator
    from layout2img_tpu.models.generators import make_generator
    from layout2img_tpu.train.state import (
        TrainConfig,
        create_train_state,
        load_torch_into_state,
    )

    num_classes = 10
    gen = make_generator("ours_d_context128", num_classes, ch=4,
                         num_mask_classes=num_classes)
    disc = make_discriminator("d128_app", num_classes, ch=4)
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_batch(rng, 2, 128, 4, num_classes)
    )
    cfg = TrainConfig(use_vgg_loss=False)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, batch, cfg)

    # "import" from a WIDER model of the same topology
    gen_big = make_generator("ours_d_context128", num_classes, ch=8,
                             num_mask_classes=num_classes)
    big = jax.jit(gen_big.init)(
        jax.random.PRNGKey(1),
        jnp.zeros((2, 4, 128)), batch["boxes"], batch["labels"], jnp.zeros((2, 128)),
    )
    big = {"params": big["params"], "batch_stats": big.get("batch_stats", {}),
           "spectral": big.get("spectral", {})}
    with pytest.raises(ValueError, match="does not fit the constructed generator"):
        load_torch_into_state(state, cfg, g_variables=big)
