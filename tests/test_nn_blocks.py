"""Shape/finiteness tests for blocks and mask regression (tiny configs)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from layout2img_tpu.nn.blocks import (
    DiscOptimizedBlock,
    DiscResBlock,
    GenResBlock,
    PSPModule,
    avg_pool2x,
    upsample2x_nearest,
)
from layout2img_tpu.nn.mask_regress import MaskRegressNet, MaskRegressNetV2
from layout2img_tpu.ops.interp import adaptive_avg_pool2d


def test_upsample_avgpool_match_torch(rng):
    x = rng.standard_normal((2, 4, 6, 3)).astype(np.float32)
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want_up = torch.nn.functional.interpolate(t, scale_factor=2, mode="nearest").numpy()
    got_up = np.asarray(upsample2x_nearest(jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_array_equal(got_up, want_up)
    want_dn = torch.nn.functional.avg_pool2d(t, 2).numpy()
    got_dn = np.asarray(avg_pool2x(jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_dn, want_dn, rtol=1e-6)


def test_adaptive_pool_matches_torch(rng):
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    for s in (1, 2, 3, 6):
        want = torch.nn.functional.adaptive_avg_pool2d(torch.from_numpy(x), (s, s)).numpy()
        got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), (s, s)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gen_resblock_shapes(rng):
    b, o, num_w = 2, 4, 24
    x = jnp.asarray(rng.standard_normal((b, 8, 8, 16)).astype(np.float32))
    vec = jnp.asarray(rng.standard_normal((b, o, num_w)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, o, 8, 8)).astype(np.float32))
    mod = GenResBlock(out_ch=8, upsample=True, predict_mask=True, num_mask_classes=10)
    variables = mod.init(jax.random.PRNGKey(0), x, vec, mask)
    (out, smask), _ = mod.apply(
        variables, x, vec, mask, mutable=["batch_stats", "spectral"]
    )
    assert out.shape == (b, 16, 16, 8)
    assert smask.shape == (b, 16, 16, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_gen_resblock_psp(rng):
    b, o, num_w = 1, 3, 16
    x = jnp.asarray(rng.standard_normal((b, 8, 8, 8)).astype(np.float32))
    vec = jnp.asarray(rng.standard_normal((b, o, num_w)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, o, 8, 8)).astype(np.float32))
    mod = GenResBlock(out_ch=8, upsample=True, psp_module=True, num_mask_classes=10)
    variables = mod.init(jax.random.PRNGKey(0), x, vec, mask)
    (out, smask), _ = mod.apply(variables, x, vec, mask, mutable=["batch_stats", "spectral"])
    assert out.shape == (b, 16, 16, 8)
    assert smask.shape == (b, 16, 16, 10)


def test_disc_blocks_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    mod = DiscOptimizedBlock(out_ch=8)
    variables = mod.init(jax.random.PRNGKey(0), x)
    y, _ = mod.apply(variables, x, mutable=["spectral"])
    assert y.shape == (2, 8, 8, 8)

    mod2 = DiscResBlock(out_ch=16, downsample=True)
    v2 = mod2.init(jax.random.PRNGKey(0), y)
    z, _ = mod2.apply(v2, y, mutable=["spectral"])
    assert z.shape == (2, 4, 4, 16)

    mod3 = DiscResBlock(out_ch=16, downsample=False)
    v3 = mod3.init(jax.random.PRNGKey(0), z)
    z2, _ = mod3.apply(v3, z, mutable=["spectral"])
    assert z2.shape == (2, 4, 4, 16)


def test_mask_regress_output(rng):
    b, o, num_w = 2, 4, 20
    vec = jnp.asarray(rng.standard_normal((b, o, num_w)).astype(np.float32))
    boxes = jnp.asarray(
        np.concatenate(
            [rng.random((b, o, 2)) * 0.5, rng.random((b, o, 2)) * 0.4 + 0.1], -1
        ).astype(np.float32)
    )
    mod = MaskRegressNetV2(channels=32, map_size=64)
    variables = mod.init(jax.random.PRNGKey(0), vec, boxes)
    out, _ = mod.apply(variables, vec, boxes, mutable=["spectral"])
    assert out.shape == (b, o, 64, 64)
    got = np.asarray(out)
    assert got.min() >= 0.0 and got.max() <= 1.0 + 1e-5

    mod1 = MaskRegressNet(channels=16, map_size=64)
    v1 = mod1.init(jax.random.PRNGKey(0), vec, boxes)
    out1, _ = mod1.apply(v1, vec, boxes, mutable=["spectral", "batch_stats"])
    assert out1.shape == (b, o, 64, 64)
