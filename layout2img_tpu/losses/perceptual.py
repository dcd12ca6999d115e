"""VGG19 perceptual loss, Flax-native.

Reference ``utils/util.py:49-94``: torchvision VGG19 features tapped at
relu1_1 / relu2_1 / relu3_1 / relu4_1 / relu5_1, L1 distance per tap with
weights [1/32, 1/16, 1/8, 1/4, 1]. Reference quirk preserved: images in
[-1, 1] are fed directly, with no ImageNet normalization.

Pretrained weights: the sandbox has no network egress, so
``load_torch_vgg19_features`` converts a torchvision
``vgg19.features`` state_dict file if one is provided; otherwise
``VGGLoss`` runs with fixed-seed random filters (a random-projection
perceptual loss — still a valid multi-scale feature distance; documented
delta vs the reference, swap in real weights for metric parity).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

# torchvision vgg19 'features' config (conv channels; 'M' = 2x2 maxpool)
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
# taps after relu1_1, relu2_1, relu3_1, relu4_1, relu5_1 == conv indices
_TAP_AFTER_CONV = {0: 0, 2: 1, 4: 2, 8: 3, 12: 4}


class VGG19Features(fnn.Module):
    """Runs VGG19 up to relu5_1 and returns the 5 tapped activations."""

    @fnn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        taps: list[jax.Array] = []
        conv_idx = 0
        for item in _VGG19_CFG:
            if item == "M":
                x = fnn.max_pool(x, (2, 2), (2, 2))
                continue
            x = fnn.Conv(item, (3, 3), name=f"conv{conv_idx}")(x)
            x = fnn.relu(x)
            if conv_idx in _TAP_AFTER_CONV:
                taps.append(x)
                if conv_idx == max(_TAP_AFTER_CONV):
                    break
            conv_idx += 1
        return taps


class VGGLoss:
    """Stateless callable holding frozen VGG19 params."""

    WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)

    def __init__(self, params: Any | None = None, seed: int = 0):
        self.module = VGG19Features()
        if params is None:
            params = self.module.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3))
            )["params"]
        self.params = jax.tree_util.tree_map(jax.lax.stop_gradient, params)

    def __call__(self, fake: jax.Array, real: jax.Array,
                 dtype: Any | None = None) -> jax.Array:
        """fake/real: (b, h, w, 3) in [-1, 1]. Returns scalar f32 loss.

        dtype=jnp.bfloat16 runs the conv stack in bf16 (the train step passes
        its compute dtype under --mixed_precision); the per-tap L1 means
        accumulate in f32 either way."""
        params = self.params
        if dtype is not None:
            from layout2img_tpu.utils.casting import cast_floating

            params = cast_floating(params, dtype)
            fake = fake.astype(dtype)
            real = real.astype(dtype)
        f_taps = self.module.apply({"params": params}, fake)
        r_taps = self.module.apply({"params": params}, real)
        loss = 0.0
        for w, f, r in zip(self.WEIGHTS, f_taps, r_taps):
            diff = (f - jax.lax.stop_gradient(r)).astype(jnp.float32)
            loss = loss + w * jnp.mean(jnp.abs(diff))
        return loss


def load_torch_vgg19_features(path: str) -> Any:
    """Convert a torchvision vgg19 ``features`` state_dict (.pth) to flax params.

    torch conv weights are (out, in, kh, kw); flax wants (kh, kw, in, out).
    """
    import torch

    sd = torch.load(path, map_location="cpu")
    # accept either a full model state_dict ('features.0.weight') or a bare
    # features state_dict ('0.weight')
    convs = {}
    for k, v in sd.items():
        k = k.replace("features.", "")
        layer, kind = k.split(".")
        convs.setdefault(int(layer), {})[kind] = v.numpy()

    # map sequential torch layer indices to conv ordinals
    params = {}
    conv_idx = 0
    torch_idx = 0
    for item in _VGG19_CFG:
        if item == "M":
            torch_idx += 1  # pool layer
            continue
        w = convs[torch_idx]["weight"].transpose(2, 3, 1, 0)
        b = convs[torch_idx]["bias"]
        params[f"conv{conv_idx}"] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
        conv_idx += 1
        torch_idx += 2  # conv + relu
    return params
