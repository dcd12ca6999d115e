"""Normalization layers, TPU-native.

``SyncBatchNorm`` replaces the reference's 546-line threaded
``model/sync_batchnorm/`` package: under GSPMD, when the batch axis is
sharded over a ``data`` mesh axis, ``jnp.mean`` over the batch *is* the
cross-replica mean — XLA inserts the collectives. No master/slave queues,
no per-layer synchronization points.

Semantics match torch `_SynchronizedBatchNorm`
(``model/sync_batchnorm/batchnorm.py:48-125``):
- normalization uses biased batch variance,
- running stats use *unbiased* variance,
- running update: new = (1 - momentum) * old + momentum * batch (momentum=0.1).

``SpatialAdaptiveNorm`` is the ISLA layout-conditioned normalization
(``model/norm_module.py:152-189``): BN without affine, then a per-pixel
affine whose (gamma, beta) are mask-weighted averages of per-object
projections of the style vectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as fnn

from layout2img_tpu.nn.spectral import SNDense
from layout2img_tpu.ops.interp import resize_bilinear


class SyncBatchNorm(fnn.Module):
    """Batch norm over all leading axes of a channels-last tensor."""

    eps: float = 1e-5
    momentum: float = 0.1  # torch convention: weight of the new batch stat
    affine: bool = True

    @fnn.compact
    def __call__(self, x: jax.Array, use_running_average: bool = False) -> jax.Array:
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c, jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = x.size // c
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", fnn.initializers.ones_init(), (c,))
            bias = self.param("bias", fnn.initializers.zeros_init(), (c,))
            y = y * scale + bias
        return y.astype(x.dtype)


class InstanceNorm2d(fnn.Module):
    """torch nn.InstanceNorm2d defaults: per-(sample, channel) spatial stats,
    no affine, no running stats. Input (..., h, w, c)."""

    eps: float = 1e-5

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(-3, -2), keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)


class SpatialAdaptiveNorm(fnn.Module):
    """ISLA norm: BN(affine=False) + mask-weighted per-object affine.

    gamma(p) = sum_o m_o(p) * g_o / (sum_o m_o(p) + 1e-6) + 1
    beta(p)  = sum_o m_o(p) * b_o / (sum_o m_o(p) + 1e-6)

    where (g_o, b_o) are spectral-normalized linear projections of each
    object's style vector. Padded objects contribute zero automatically:
    the reference pad box (-0.6, -0.6, 0.5, 0.5) splats to an all-zero mask.
    """

    eps: float = 1e-5
    momentum: float = 0.1

    @fnn.compact
    def __call__(
        self,
        x: jax.Array,  # (b, h, w, c)
        vectors: jax.Array,  # (b, o, num_w)
        mask: jax.Array,  # (b, o, mh, mw) or (b, o, P, mh, mw) for part masks
        use_running_average: bool = False,
        update_spectral: bool = True,
    ) -> jax.Array:
        c = x.shape[-1]
        h, w = x.shape[1], x.shape[2]
        y = SyncBatchNorm(eps=self.eps, momentum=self.momentum, affine=False, name="bn")(
            x, use_running_average
        )

        # Part extension (reference norm_module_part.py:190-249): P mask
        # channels each get their own (gamma, beta) projection; the output is
        # the sum of the P modulated copies.
        parts = 1 if mask.ndim == 4 else mask.shape[2]
        if mask.ndim == 4:
            mask = mask[:, :, None]  # (b, o, 1, mh, mw)

        gamma = SNDense(c * parts, name="weight_proj")(vectors, update_stats=update_spectral)
        beta = SNDense(c * parts, name="bias_proj")(vectors, update_stats=update_spectral)
        b, o = vectors.shape[:2]
        gamma = gamma.reshape(b, o, parts, c)
        beta = beta.reshape(b, o, parts, c)

        mask = resize_bilinear(mask, (h, w))  # (b, o, P, h, w)
        # Modulation stays in XLA on purpose: a hand-written fused Pallas
        # kernel for this op was built, measured, and REMOVED in round 3 —
        # at the step's bandwidth/compute-balanced operating point it lost
        # end-to-end to XLA's cross-op fusion, and the one intermediate XLA
        # does materialize (the o-channel resized mask) is ~0.2% of step
        # traffic. Full numbers: docs/pallas_postmortem.md.
        if parts == 1:
            m2, g2, b2 = mask[:, :, 0], gamma[:, :, 0], beta[:, :, 0]
            d = jnp.sum(m2, axis=1)[..., None] + 1e-6  # (b, h, w, 1)
            gmap = jnp.einsum("bohw,boc->bhwc", m2, g2) / d + 1.0
            bmap = jnp.einsum("bohw,boc->bhwc", m2, b2) / d
            return y * gmap + bmap
        denom = jnp.sum(mask, axis=1)[..., None] + 1e-6  # (b, P, h, w, 1)
        gamma_map = jnp.einsum("bophw,bopc->bphwc", mask, gamma) / denom + 1.0
        beta_map = jnp.einsum("bophw,bopc->bphwc", mask, beta) / denom
        # sum over parts: sum_p (g_p * y + b_p) == y * sum_p g_p + sum_p b_p
        return y * jnp.sum(gamma_map, axis=1) + jnp.sum(beta_map, axis=1)
