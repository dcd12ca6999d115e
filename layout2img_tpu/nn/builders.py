"""String-spec CNN / MLP builders (sg2im lineage).

TPU-native equivalent of the reference ``model_layout2img/layers.py:127-230``
(``build_cnn`` / ``build_mlp``): a tiny layer-spec language used by the
layout2im family for ad-hoc encoder/critic towers.

Spec language (comma-separated string or list), matching the reference:

- ``IX``       declare X input channels (first token only; default 3)
- ``CK-X``     KxK conv with X output channels (stride 1)
- ``CK-X-S``   KxK conv with X output channels and stride S
- ``R``        residual block keeping the channel count
- ``UX``       nearest-neighbor upsample by factor X
- ``PX``       spatial pooling by factor X (max or avg)
- ``FC-D-E``   flatten (once) then a D->E dense layer

Every conv except the first is preceded by normalization + activation
(reference ``layers.py:164-167``); an ``FC`` is followed by the activation
unless it is the last spec token (``layers.py:203-204``).

Deltas vs the reference (documented, deliberate):
- layouts are NHWC (framework convention) — ``FC`` flattening therefore
  orders features as (h, w, c), not torch's (c, h, w);
- ``normalization='instance'`` is true per-sample instance norm in both
  train and eval mode. The reference builds
  ``nn.InstanceNorm2d(track_running_stats=True)`` (``layers.py:24``), whose
  *eval* mode silently switches to running-average stats — a quirk, not a
  design choice, and unused by any runnable reference path;
- the reference ResidualBlock's 'valid'-padding shortcut is broken
  (``layers.py:112-113`` slices ``x[:, :, 0:-0]`` -> empty); only 'same'
  padding is supported here;
- ``activation='relu'`` actually yields ReLU. The reference's
  ``get_activation`` overwrites the requested name with ``'leakyrelu'``
  unconditionally (``layers.py:39``), so every reference-built net is
  LeakyReLU(0.01) regardless of the argument.

"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn


def _activation(name: str):
    low = name.lower()
    if low.startswith("leakyrelu"):
        slope = float(name.split("-")[1]) if "-" in name else 0.01
        return lambda x: fnn.leaky_relu(x, negative_slope=slope)
    if low == "relu":
        return fnn.relu
    raise ValueError(f'invalid activation "{name}"')


class _Norm2D(fnn.Module):
    """Normalization dispatcher: 'batch' | 'instance' | 'none'."""

    kind: str

    @fnn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.kind == "none":
            return x
        if self.kind == "batch":
            return fnn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5)(x)
        if self.kind == "instance":
            # per-sample, per-channel over (h, w); affine like the reference
            return fnn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5)(x)
        raise ValueError(f'unrecognized normalization "{self.kind}"')


class BuiltResidualBlock(fnn.Module):
    """norm -> act -> conv3 -> norm -> act -> conv3 + shortcut.

    Reference ``model_layout2img/layers.py:87-115`` ('same' padding only;
    the reference's 'valid' shortcut path is broken — see module docstring).
    """

    channels: int
    normalization: str = "batch"
    activation: str = "relu"
    kernel_size: int = 3

    @fnn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        act = _activation(self.activation)
        k = (self.kernel_size, self.kernel_size)
        y = _Norm2D(self.normalization, name="norm1")(x, train)
        y = act(y)
        y = fnn.Conv(self.channels, k, padding="SAME", name="conv1")(y)
        y = _Norm2D(self.normalization, name="norm2")(y, train)
        y = act(y)
        y = fnn.Conv(self.channels, k, padding="SAME", name="conv2")(y)
        return x + y


def _parse_arch(arch) -> list[str]:
    if isinstance(arch, str):
        arch = arch.split(",")
    return [s.strip() for s in arch if s.strip()]


class BuiltCNN(fnn.Module):
    """CNN assembled from the spec language above. Input/output NHWC
    (or (b, features) after an ``FC`` token)."""

    arch: str | Sequence[str]
    normalization: str = "batch"
    activation: str = "relu"
    pooling: str = "max"

    @fnn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        act = _activation(self.activation)
        tokens = _parse_arch(self.arch)
        if tokens and tokens[0][0] == "I":
            tokens = tokens[1:]  # input channels come from x itself

        first_conv = True
        flat = False
        for i, s in enumerate(tokens):
            if s[:2] == "FC":
                _, d_in, d_out = s.split("-")
                if not flat:
                    x = x.reshape(x.shape[0], -1)
                    flat = True
                assert x.shape[-1] == int(d_in), (
                    f"FC expects {d_in} features, got {x.shape[-1]}")
                x = fnn.Dense(int(d_out), name=f"fc_{i}")(x)
                if i + 1 < len(tokens):
                    x = act(x)
            elif s[0] == "C":
                if not first_conv:
                    x = _Norm2D(self.normalization, name=f"norm_{i}")(x, train)
                    x = act(x)
                first_conv = False
                vals = [int(v) for v in s[1:].split("-")]
                k, out_ch = vals[0], vals[1]
                stride = vals[2] if len(vals) == 3 else 1
                x = fnn.Conv(out_ch, (k, k), strides=(stride, stride),
                             padding=(k - 1) // 2, name=f"conv_{i}")(x)
            elif s[0] == "R":
                norm = "none" if first_conv else self.normalization
                first_conv = False
                x = BuiltResidualBlock(
                    x.shape[-1], normalization=norm,
                    activation=self.activation, name=f"res_{i}")(x, train)
            elif s[0] == "U":
                f = int(s[1:])
                b, h, w, c = x.shape
                x = jnp.broadcast_to(
                    x[:, :, None, :, None, :], (b, h, f, w, f, c)
                ).reshape(b, h * f, w * f, c)
            elif s[0] == "P":
                f = int(s[1:])
                pool = fnn.max_pool if self.pooling == "max" else fnn.avg_pool
                x = pool(x, (f, f), strides=(f, f))
            else:
                raise ValueError(f'invalid layer "{s}"')
        return x


def cnn_out_channels(arch, in_channels: int = 3) -> int:
    """Static output channel count of a spec (reference returns it as the
    second element of the ``build_cnn`` tuple, ``layers.py:211``)."""
    cur = in_channels
    tokens = _parse_arch(arch)
    if tokens and tokens[0][0] == "I":
        cur = int(tokens[0][1:])
        tokens = tokens[1:]
    for s in tokens:
        if s[:2] == "FC":
            cur = int(s.split("-")[2])
        elif s[0] == "C":
            cur = int(s[1:].split("-")[1])
    return cur


class BuiltMLP(fnn.Module):
    """MLP from a dim list (reference ``layers.py:214-230``)."""

    dims: Sequence[int]
    activation: str = "relu"
    batch_norm: str = "none"
    dropout: float = 0.0
    final_nonlinearity: bool = True

    @fnn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        act = _activation(self.activation)
        n = len(self.dims) - 1
        for i in range(n):
            x = fnn.Dense(self.dims[i + 1], name=f"dense_{i}")(x)
            if i < n - 1 or self.final_nonlinearity:
                if self.batch_norm == "batch":
                    x = fnn.BatchNorm(use_running_average=not train,
                                      momentum=0.9, epsilon=1e-5)(x)
                x = act(x)
            if self.dropout > 0:
                x = fnn.Dropout(self.dropout, deterministic=not train)(x)
        return x


def build_cnn(arch, normalization: str = "batch", activation: str = "relu",
              pooling: str = "max") -> tuple[BuiltCNN, int]:
    """Reference-shaped constructor: returns (module, out_channels)."""
    return (
        BuiltCNN(arch=arch, normalization=normalization,
                 activation=activation, pooling=pooling),
        cnn_out_channels(arch),
    )


def build_mlp(dim_list: Sequence[int], activation: str = "relu",
              batch_norm: str = "none", dropout: float = 0.0,
              final_nonlinearity: bool = True) -> BuiltMLP:
    return BuiltMLP(dims=tuple(dim_list), activation=activation,
                    batch_norm=batch_norm, dropout=dropout,
                    final_nonlinearity=final_nonlinearity)
