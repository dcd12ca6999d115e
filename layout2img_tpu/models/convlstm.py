"""ConvLSTM layout fusion — the upstream layout2im fusion the reference keeps
as its baseline variants (``model_layout2img/generator{,1,2}.py``; cell at
``generator_app.py:414-716``). The final model replaces this with the 8x8
transformer (``generator_app.py:844-855``); both fusions are provided here.

TPU-native shape: instead of ragged per-image sequences built with Python
loops over ``obj_to_img``, the object axis is scanned with ``lax.scan`` on
padded (b, o, 8, 8, c) features; padded steps carry the state through
unchanged (masked update), which reproduces the variable-length semantics.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn


class ConvLSTMCell(fnn.Module):
    """Standard ConvLSTM cell (i, f, o, g gates from one conv over [x, h])."""

    hidden_dim: int
    kernel_size: tuple[int, int] = (5, 5)

    @fnn.compact
    def __call__(self, x, state):
        h, c = state
        kh, kw = self.kernel_size
        pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
        combined = jnp.concatenate([x, h], axis=-1)
        gates = fnn.Conv(4 * self.hidden_dim, self.kernel_size, padding=pad, name="conv")(combined)
        i, f, o, g = jnp.split(gates, 4, axis=-1)
        c_next = fnn.sigmoid(f) * c + fnn.sigmoid(i) * jnp.tanh(g)
        h_next = fnn.sigmoid(o) * jnp.tanh(c_next)
        return h_next, c_next


class LayoutConvLSTM(fnn.Module):
    """Stacked ConvLSTM over the object axis; returns the last layer's final
    hidden state per image (the reference's (n, 64, 8, 8) fusion output).

    Reference config: LayoutConvLSTM(8, 512, [128, 64, 64], (5, 5))
    (``generator_app.py:784-789``).
    """

    hidden_dims: Sequence[int] = (128, 64, 64)
    kernel_size: tuple[int, int] = (5, 5)

    @fnn.compact
    def __call__(self, feats: jax.Array, valid: jax.Array) -> jax.Array:
        """feats: (b, o, s, s, c); valid: (b, o). -> (b, s, s, hidden[-1])."""
        b, o, s, _, _ = feats.shape
        x = feats
        h_last = None
        for li, hd in enumerate(self.hidden_dims):
            cell = ConvLSTMCell(hd, self.kernel_size, name=f"cell{li}")
            h = jnp.zeros((b, s, s, hd), feats.dtype)
            c = jnp.zeros((b, s, s, hd), feats.dtype)
            outs = []
            # o <= 31: a static unrolled loop; each call shares the cell's params
            for t in range(o):
                h_next, c_next = cell(x[:, t], (h, c))
                keep = valid[:, t][:, None, None, None] > 0
                h = jnp.where(keep, h_next, h)
                c = jnp.where(keep, c_next, c)
                outs.append(h)
            x = jnp.stack(outs, axis=1)  # (b, o, s, s, hd) for the next layer
            h_last = h
        return h_last
