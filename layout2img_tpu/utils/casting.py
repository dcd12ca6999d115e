"""Dtype casting helpers shared by the train step, serving CLIs, and benches."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_floating(tree: Any, dtype) -> Any:
    """Cast every floating-point leaf of a pytree to ``dtype``; integer /
    bool / PRNG-key leaves pass through unchanged."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )
