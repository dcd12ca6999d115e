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


def load_torch_lpips(path: str, backbone_path: str | None = None) -> Any:
    """Convert lpips AlexNet weights to the Flax layout.

    Accepted formats (all real-world layouts):
    - full ``lpips.LPIPS(net='alex').state_dict()``: ``net.sliceK.N.weight``
      backbone keys (N is the GLOBAL torchvision features index — lpips's
      ``add_module(str(x), features[x])`` preserves it) + ``linN.model.1.weight``;
    - the official per-net .pth shipped in the lpips package: ONLY
      ``linN.model.1.weight`` — the AlexNet backbone must then come from a
      torchvision ``alexnet`` state_dict via ``backbone_path``;
    - a plain torchvision alexnet state_dict (``features.N.weight``), with or
      without merged lin keys.
    """
    import torch

    sd = torch.load(path, map_location="cpu")
    if backbone_path:
        sd = {**torch.load(backbone_path, map_location="cpu"), **sd}
    params: dict = {}
    lins: list = [None] * 5
    # conv positions within torchvision alexnet.features
    conv_map = {0: "conv0", 3: "conv1", 6: "conv2", 8: "conv3", 10: "conv4"}
    for k, v in sd.items():
        parts = k.split(".")
        if ".model." in k and parts[-1] == "weight" and parts[0].startswith("lin"):
            # linN.model.1.weight: (1, c, 1, 1)
            lins[int(parts[0].replace("lin", ""))] = jnp.asarray(v.numpy()[0, :, 0, 0])
            continue
        if parts[-1] not in ("weight", "bias"):
            continue
        idx = None
        if parts[0] == "features" and parts[1].isdigit():
            idx = int(parts[1])
        elif len(parts) >= 3 and parts[-3].startswith("slice") and parts[-2].isdigit():
            idx = int(parts[-2])  # net.sliceK.<global features idx>.weight
        if idx is None or idx not in conv_map:
            continue
        name = conv_map[idx]
        if parts[-1] == "weight":
            params.setdefault(name, {})["kernel"] = jnp.asarray(
                v.numpy().transpose(2, 3, 1, 0)
            )
        else:
            params.setdefault(name, {})["bias"] = jnp.asarray(v.numpy())
    missing = [n for n in conv_map.values() if "kernel" not in params.get(n, {})]
    if missing:
        raise ValueError(
            f"{path} carries no AlexNet backbone weights for {missing} (the "
            "official lpips .pth ships only the lin heads). Pass a torchvision "
            "alexnet state_dict via backbone_path / --lpips_backbone.")
    if any(l is None for l in lins):
        lins = [jnp.full((c,), 1.0 / c) for c in _ALEX_CHANNELS]
    return {"params": params, "lins": lins}
