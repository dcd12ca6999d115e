"""Spectral normalization as explicit power-iteration state.

The reference relies on ``torch.nn.utils.spectral_norm`` pre-forward hooks
(e.g. ``model/resnet_generator_app_v2.py:681-686`` with eps=1e-4, and the
ISLA projections at ``model/norm_module.py:158-159`` with torch's default
eps=1e-12). Hooks and in-place buffer mutation don't exist under jit; here
the left singular vector ``u`` lives in a dedicated ``spectral`` variable
collection, updated functionally once per training step — semantics match
torch's n_power_iterations=1.

Matrix view: torch reshapes the weight to (out, -1). Flax kernels are
(in, out) / (kh, kw, in, out), so we reshape to (-1, out) and transpose;
sigma is invariant to the permutation of the flattened axis.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn


def _l2_normalize(v: jax.Array, eps: float) -> jax.Array:
    # torch F.normalize: v / max(||v||, eps)
    return v / jnp.maximum(jnp.linalg.norm(v), eps)


def spectral_sigma(
    w_mat: jax.Array, u: jax.Array, eps: float, n_iter: int = 1, update: bool = True
) -> tuple[jax.Array, jax.Array]:
    """One (or n) power iterations on a (rows, cols) matrix.

    Returns (sigma, new_u). With update=False (eval mode), u is not advanced
    but sigma is still computed from the stored u — matching torch.
    """
    w_mat = w_mat.astype(jnp.float32)
    u0 = u
    if update:
        for _ in range(n_iter):
            v = _l2_normalize(w_mat.T @ u, eps)
            u = _l2_normalize(w_mat @ v, eps)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
    else:
        v = _l2_normalize(w_mat.T @ u0, eps)
        u = u0
    sigma = u @ w_mat @ v
    return sigma, u


class _SNMixin:
    """Shared power-iteration state handling for SN layers."""

    def _normalize_kernel(self, kernel: jax.Array, update: bool) -> jax.Array:
        # torch views the weight as (out, -1); flax kernels put `out` last.
        w_mat = kernel.reshape(-1, kernel.shape[-1]).T  # (out, rest)
        u_var = self.variable(
            "spectral",
            "u",
            lambda: jax.random.normal(self.make_rng("params"), (w_mat.shape[0],), jnp.float32),
        )
        sigma, new_u = spectral_sigma(w_mat, u_var.value, self.eps, update=update)
        if update and not self.is_initializing():
            u_var.value = new_u
        # keep the caller's compute dtype: sigma is f32 (power iteration runs
        # in f32 for stability), and a bare `kernel / sigma` would silently
        # promote a bf16 kernel — and everything downstream — to f32,
        # defeating mixed precision for the whole network
        return (kernel / sigma).astype(kernel.dtype)


class SNDense(fnn.Module, _SNMixin):
    """Spectrally-normalized Dense (== torch spectral_norm(nn.Linear))."""

    features: int
    use_bias: bool = True
    eps: float = 1e-12
    kernel_init: Callable = fnn.initializers.orthogonal()
    bias_init: Callable = fnn.initializers.zeros_init()

    @fnn.compact
    def __call__(self, x: jax.Array, *, update_stats: bool = True) -> jax.Array:
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        kernel = self._normalize_kernel(kernel, update_stats)
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias
        return y


class SNConv(fnn.Module, _SNMixin):
    """Spectrally-normalized 2-D convolution on NHWC (== spectral_norm(nn.Conv2d)).

    The reference's generator/discriminator convs use eps=1e-4
    (``rcnn_discriminator_app.py:10-15``).
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    eps: float = 1e-4
    kernel_init: Callable = fnn.initializers.orthogonal()
    bias_init: Callable = fnn.initializers.zeros_init()

    @fnn.compact
    def __call__(self, x: jax.Array, *, update_stats: bool = True) -> jax.Array:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features)
        )
        kernel = self._normalize_kernel(kernel, update_stats)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=tuple(self.strides),
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias
        return y


class SNEmbed(fnn.Module, _SNMixin):
    """Spectrally-normalized embedding (== spectral_norm(nn.Embedding)).

    torch views the embedding weight as (num_embeddings, dim); the power
    iteration therefore runs on that orientation.
    """

    num_embeddings: int
    features: int
    eps: float = 1e-12
    embedding_init: Callable = fnn.initializers.orthogonal()

    @fnn.compact
    def __call__(self, idx: jax.Array, *, update_stats: bool = True) -> jax.Array:
        table = self.param(
            "embedding", self.embedding_init, (self.num_embeddings, self.features)
        )
        w_mat = table  # (num_embeddings, dim) == torch's view
        u_var = self.variable(
            "spectral",
            "u",
            lambda: jax.random.normal(self.make_rng("params"), (w_mat.shape[0],), jnp.float32),
        )
        sigma, new_u = spectral_sigma(w_mat, u_var.value, self.eps, update=update_stats)
        if update_stats and not self.is_initializing():
            u_var.value = new_u
        return (table / sigma).astype(table.dtype)[idx]
