"""Golden tests: spectral norm power-iteration parity with torch."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from layout2img_tpu.nn.spectral import SNDense


def test_sn_dense_matches_torch_one_step(rng):
    d_in, d_out = 12, 7
    w = rng.standard_normal((d_out, d_in)).astype(np.float32)  # torch (out, in)
    u0 = rng.standard_normal(d_out).astype(np.float32)
    u0 /= np.linalg.norm(u0)
    x = rng.standard_normal((3, d_in)).astype(np.float32)

    lin = torch.nn.Linear(d_in, d_out, bias=False)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w))
    sn = torch.nn.utils.spectral_norm(lin, eps=1e-4)
    with torch.no_grad():
        sn.weight_u.copy_(torch.from_numpy(u0))
    sn.train()
    want = sn(torch.from_numpy(x)).detach().numpy()
    u_torch = sn.weight_u.detach().numpy()

    mod = SNDense(d_out, use_bias=False, eps=1e-4)
    params = {
        "params": {"kernel": jnp.asarray(w.T)},
        "spectral": {"u": jnp.asarray(u0)},
    }
    got, mutated = mod.apply(params, jnp.asarray(x), update_stats=True, mutable=["spectral"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mutated["spectral"]["u"]), u_torch, rtol=1e-5, atol=1e-5)


def test_sn_dense_eval_mode_keeps_u(rng):
    d_in, d_out = 6, 5
    mod = SNDense(d_out)
    x = jnp.asarray(rng.standard_normal((2, d_in)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x)
    _, mutated = mod.apply(variables, x, update_stats=False, mutable=["spectral"])
    np.testing.assert_array_equal(
        np.asarray(mutated["spectral"]["u"]), np.asarray(variables["spectral"]["u"])
    )


def test_sn_reduces_spectral_norm_to_one(rng):
    d_in, d_out = 32, 16
    w = (rng.standard_normal((d_in, d_out)) * 5).astype(np.float32)
    mod = SNDense(d_out, use_bias=False)
    variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, d_in)))
    variables = {"params": {"kernel": jnp.asarray(w)}, "spectral": variables["spectral"]}
    # iterate the power method to convergence via repeated application
    for _ in range(50):
        _, mut = mod.apply(variables, jnp.zeros((1, d_in)), mutable=["spectral"])
        variables = {"params": variables["params"], "spectral": mut["spectral"]}
    u = np.asarray(variables["spectral"]["u"])
    wm = w.T  # (out, in)
    v = wm.T @ u
    v /= np.linalg.norm(v)
    sigma = u @ wm @ v
    true_sigma = np.linalg.svd(wm, compute_uv=False)[0]
    np.testing.assert_allclose(sigma, true_sigma, rtol=1e-3)
