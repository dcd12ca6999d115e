"""Hinge GAN losses with validity masking.

Reference inlines these in every train script
(``train_ours_d.py:122-148``): relu(1 -/+ d).mean() for D real/fake,
-d.mean() for G. The reference's per-object means run over dynamically
filtered valid objects; here scores stay fixed-shape (b, o) and the mean is
masked — numerically identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(x: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    x = x.astype(jnp.float32)  # loss accumulation always in fp32
    if mask is None:
        return jnp.mean(x)
    x = x.reshape(mask.shape)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def hinge_d_real(scores: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    return masked_mean(jax.nn.relu(1.0 - scores), mask)


def hinge_d_fake(scores: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    return masked_mean(jax.nn.relu(1.0 + scores), mask)


def g_adv(scores: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    return -masked_mean(scores, mask)
