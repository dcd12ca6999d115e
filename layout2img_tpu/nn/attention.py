"""Context attention over per-object style vectors.

``BoxMultiHeadedAttention`` is the paper's context module
(reference ``model/resnet_generator_app_v2.py:123-214``): scaled-dot
self-attention over <=31 object tokens with a geometric bias,
``softmax(log(clamp(relu(W_G g), 1e-6)) + QK^T/sqrt(d))``, where g is the
pairwise sinusoidal box embedding. The ``use_geometry=False`` flag is the
"nogeo" ablation (reference ``model/resnet_generator_vg.py:115`` sets
``w_mn = w_a``).

TPU notes: the token count is tiny, so the whole block is plain batched
einsums that XLA fuses; there is nothing to shard — attention stays
replicated per device and vmaps over batch. Unlike the reference (which is
correct only for h=1, its mask/geometry broadcasting breaks for h>1), the
head dimension here is handled properly.

Padding: class label 0 is the ``__image__`` pad token; key positions with
label==0 get -1e9 logits, matching ``masked_fill`` in the reference.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as fnn

from layout2img_tpu.ops.relation import box_relational_embedding


class BoxMultiHeadedAttention(fnn.Module):
    heads: int
    d_model: int
    trignometric: bool = True
    use_geometry: bool = True
    dropout_rate: float = 0.0
    # Reference behavior quirk (resnet_generator_app_v2.py:197-198): the
    # heads-concat `x.transpose(1, 2).view(b, -1, h*d_k)` is applied to an
    # (h*b, o, d_k) tensor; for h=1 this reinterprets the transposed (d, o)
    # matrix row-major — a fixed SCRAMBLE permutation of the attention
    # output before the residual, silently destroying the per-object
    # correspondence. Trained reference checkpoints depend on it (pinned by
    # the full-forward parity tests, which set legacy_view=True), but it
    # measurably cripples conditioning learning from scratch (synthetic
    # color-conditioning score 0.83 with the correct concat vs 0.17 with
    # the scramble at 800 steps) — so the DEFAULT here is the corrected
    # concat. Set legacy_view=True only to run imported reference weights.
    legacy_view: bool = False

    @fnn.compact
    def __call__(
        self,
        query: jax.Array,  # (b, o, d_model)
        key: jax.Array,
        value: jax.Array,
        boxes: jax.Array,  # (b, o, 4)
        labels: jax.Array | None = None,  # (b, o) int; 0 == pad
        deterministic: bool = True,
    ) -> jax.Array:
        b, o, _ = query.shape
        h = self.heads
        d_k = self.d_model // h
        residual = query

        q = fnn.Dense(self.d_model, kernel_init=fnn.initializers.orthogonal(), name="q_proj")(query)
        k = fnn.Dense(self.d_model, kernel_init=fnn.initializers.orthogonal(), name="k_proj")(key)
        v = fnn.Dense(self.d_model, kernel_init=fnn.initializers.orthogonal(), name="v_proj")(value)
        q = q.reshape(b, o, h, d_k).transpose(0, 2, 1, 3)
        k = k.reshape(b, o, h, d_k).transpose(0, 2, 1, 3)
        v = v.reshape(b, o, h, d_k).transpose(0, 2, 1, 3)

        # NOTE: float() — a bare np scalar is strongly-typed f64->f32 and
        # would promote bf16 logits (and everything downstream) to f32
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / float(np.sqrt(d_k))
        if labels is not None:
            key_mask = (labels != 0)[:, None, None, :]  # (b, 1, 1, o)
            logits = jnp.where(key_mask, logits, -1e9)

        if self.use_geometry:
            dim_g = 64 if self.trignometric else 4
            # embedding math runs in the boxes' dtype (f32 for precision of
            # the log-scaled deltas); cast the finished embedding so f32
            # boxes don't promote the whole attention under mixed precision
            geo = box_relational_embedding(
                boxes, dim_g=dim_g, trignometric=self.trignometric
            ).astype(query.dtype)
            # per-head scalar geometric weight; one Dense(h) == h x Dense(1)
            w_g = fnn.Dense(h, kernel_init=fnn.initializers.orthogonal(), name="geo_proj")(geo)
            w_g = fnn.relu(w_g).transpose(0, 3, 1, 2)  # (b, h, o, o)
            logits = jnp.log(jnp.maximum(w_g, 1e-6)) + logits

        attn = jax.nn.softmax(logits, axis=-1)
        # diagnosable post-softmax probabilities (capture with
        # mutable=["intermediates"]): used to VERIFY that pad key slots carry
        # ~zero attention mass at VG shape (o=31, ~6 valid) — the "softmax
        # normalizes over pad slots" dilution hypothesis for the VG-shape
        # conditioning plateau is refuted by measurement
        # (tests/test_nn_attention.py::test_pad_softmax_mass_is_zero_at_vg_shape)
        self.sow("intermediates", "attn_probs", attn)
        attn = fnn.Dropout(self.dropout_rate, name="attn_drop")(attn, deterministic=deterministic)

        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        if self.legacy_view and h == 1:
            # reference scramble: (b, o, d) -> transpose -> row-major reshape
            out = out[:, 0].transpose(0, 2, 1).reshape(b, o, self.d_model)
        else:
            out = out.transpose(0, 2, 1, 3).reshape(b, o, self.d_model)

        out = fnn.LayerNorm(epsilon=1e-5, name="ln0")(out + residual)
        inner = out
        out = fnn.Dense(self.d_model, kernel_init=fnn.initializers.orthogonal(), name="out_proj")(out)
        out = fnn.Dropout(self.dropout_rate, name="out_drop")(out, deterministic=deterministic)
        return fnn.LayerNorm(epsilon=1e-5, name="ln1")(out + inner)


class MultiHeadAttention(fnn.Module):
    """Plain multi-head attention with the reference's residual/LayerNorm
    topology (``model_layout2img/transformer.py:42-93`` and the identical
    stack in ``model_layout2img/generator_app.py``). Requires
    heads * d_v == d_model for the first residual."""

    heads: int
    d_model: int
    d_k: int
    d_v: int
    dropout_rate: float = 0.1

    @fnn.compact
    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        labels: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        b, o, _ = query.shape
        h = self.heads

        def proj_init(d_in, d_out):
            return fnn.initializers.normal(stddev=np.sqrt(2.0 / (d_in + d_out)))

        q = fnn.Dense(h * self.d_k, use_bias=False, kernel_init=proj_init(self.d_model, self.d_k), name="w_qs")(query)
        k = fnn.Dense(h * self.d_k, use_bias=False, kernel_init=proj_init(self.d_model, self.d_k), name="w_ks")(key)
        v = fnn.Dense(h * self.d_v, use_bias=False, kernel_init=proj_init(self.d_model, self.d_v), name="w_vs")(value)
        q = q.reshape(b, -1, h, self.d_k).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, h, self.d_k).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, h, self.d_v).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        if labels is not None:
            key_mask = (labels != 0)[:, None, None, :]
            logits = jnp.where(key_mask, logits, -1e9)
        logits = logits / float(np.power(self.d_k, 0.5))  # float(): keep dtype

        attn = jax.nn.softmax(logits, axis=-1)
        attn = fnn.Dropout(self.dropout_rate, name="attn_drop")(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, o, h * self.d_v)

        residual = query
        out = fnn.LayerNorm(epsilon=1e-5, name="ln0")(out + residual)
        inner = out
        out = fnn.Dense(self.d_model, kernel_init=fnn.initializers.xavier_normal(), name="fc")(out)
        out = fnn.Dropout(self.dropout_rate, name="out_drop")(out, deterministic=deterministic)
        return fnn.LayerNorm(epsilon=1e-5, name="ln1")(out + inner)
