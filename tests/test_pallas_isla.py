"""Fused ISLA modulation: primal parity with the XLA reference and
correctness of the hand-derived custom VJP (checked against autodiff of the
reference formulation). The Pallas path itself is exercised on real TPU by
scripts/check_pallas_tpu.py; on CPU the primal routes to the XLA fallback
while the custom backward is always active."""

import numpy as np

import jax
import jax.numpy as jnp

from layout2img_tpu.ops.pallas.isla import _xla_reference, isla_modulate


def _inputs(rng, b=2, o=4, h=8, w=8, c=5):
    xn = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, o, h, w)).astype(np.float32))
    gamma = jnp.asarray(rng.standard_normal((b, o, c)).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal((b, o, c)).astype(np.float32))
    return xn, mask, gamma, beta


def test_primal_matches_reference(rng):
    args = _inputs(rng)
    got = isla_modulate(*args)
    want = _xla_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_custom_vjp_matches_autodiff(rng):
    args = _inputs(rng)
    cot = jnp.asarray(rng.standard_normal(args[0].shape).astype(np.float32))

    def loss_custom(*a):
        return jnp.sum(isla_modulate(*a) * cot)

    def loss_ref(*a):
        return jnp.sum(_xla_reference(*a) * cot)

    g_custom = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for name, a, b in zip(("xn", "mask", "gamma", "beta"), g_custom, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_norm_module_uses_fused_path(rng):
    """SpatialAdaptiveNorm output unchanged by the kernel integration."""
    from layout2img_tpu.nn.norms import SpatialAdaptiveNorm

    b, o, h, w, c = 2, 3, 8, 8, 6
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    vec = jnp.asarray(rng.standard_normal((b, o, 11)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, o, 4, 4)).astype(np.float32))
    mod = SpatialAdaptiveNorm()
    variables = mod.init(jax.random.PRNGKey(0), x, vec, mask)
    out, _ = mod.apply(variables, x, vec, mask, mutable=["batch_stats", "spectral"])
    assert np.isfinite(np.asarray(out)).all()
