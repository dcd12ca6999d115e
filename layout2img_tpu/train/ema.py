"""Exponential moving average of generator params.

The reference trains without EMA; it is standard GAN practice (BigGAN-style)
and SURVEY.md section 7.1 plans for it — offered as an opt-in that does not
change the default training math.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_init(params: Any) -> Any:
    # a real copy: aliasing g_params' buffers breaks donation (the jitted
    # step would donate the same buffer twice)
    return jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params)


def ema_update(ema_params: Any, params: Any, decay: float = 0.999) -> Any:
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(e.dtype), ema_params, params
    )
