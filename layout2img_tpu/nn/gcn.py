"""Graph-convolution context over per-object style vectors.

Reference ``model/resnet_generator_graph.py:14-122`` builds, *per sample on
the CPU*, a scipy sparse adjacency connecting same-class objects, then runs
a 2-layer GCN. Here the adjacency is a dense vectorized computation —
``A[i,j] = 1[y_i == y_j, i != j]`` plus self-loops, row-normalized — which
for o <= 31 objects is a tiny batched matmul entirely on device. Semantics
are identical (the reference's permutation edge set is exactly the same-label
relation, and its symmetrization is a no-op on an already-symmetric matrix).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as fnn


def same_label_adjacency(labels: jax.Array) -> jax.Array:
    """(b, o) int labels -> (b, o, o) row-normalized adjacency with self-loops."""
    same = (labels[:, :, None] == labels[:, None, :]).astype(jnp.float32)
    o = labels.shape[-1]
    eye = jnp.eye(o, dtype=jnp.float32)
    adj = same * (1.0 - eye) + eye  # same-label edges + self-loops
    return adj / jnp.sum(adj, axis=-1, keepdims=True)


class GraphFunc(fnn.Module):
    """2-layer GCN with residual: x + gc2(dropout(relu(gc1(x, A))), A)."""

    z_dim: int
    dropout_rate: float = 0.5

    @fnn.compact
    def __call__(
        self, x: jax.Array, labels: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        # adjacency math in f32, cast to the compute dtype: a bare f32
        # adjacency would promote the whole graph-context path (and every
        # downstream block) to f32 under mixed precision
        adj = same_label_adjacency(labels).astype(x.dtype)

        def gc(name, h, d_out):
            # init matches reference GraphConvolution.reset_parameters:
            # U(-1/sqrt(out), 1/sqrt(out))
            kernel = self.param(
                name + "_w",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -1, 1) / jnp.sqrt(d_out),
                (h.shape[-1], d_out),
            )
            bias = self.param(
                name + "_b",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -1, 1) / jnp.sqrt(d_out),
                (d_out,),
            )
            return jnp.einsum("bij,bjd->bid", adj, h @ kernel) + bias

        residual = x
        h = fnn.relu(gc("gc1", x, self.z_dim * 4))
        h = fnn.Dropout(self.dropout_rate, name="drop")(h, deterministic=deterministic)
        h = gc("gc2", h, self.z_dim)
        return residual + h
