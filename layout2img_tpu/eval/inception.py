"""InceptionV3 in Flax for on-TPU IS / FID.

The reference computes IS with a TF1 session over a downloaded 2015 graph,
one image at a time (``IS.py:111-191``), and leaves FID external. Here the
standard InceptionV3 (torchvision topology; pool3 = 2048-d features + 1000
logits) runs batched under jit on TPU. ``load_torch_inception_v3`` converts a
torchvision/pytorch-fid state_dict when weights are available; without them
the fallback is fixed-seed random filters (pipeline-valid, metric numbers
not comparable — documented delta in the zero-egress sandbox).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as fnn

from layout2img_tpu.ops.interp import resize_bilinear_nhwc


class BasicConv(fnn.Module):
    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: Any = "VALID"

    @fnn.compact
    def __call__(self, x):
        x = fnn.Conv(
            self.features, self.kernel, self.strides, padding=self.padding,
            use_bias=False, name="conv",
        )(x)
        x = fnn.BatchNorm(
            use_running_average=True, epsilon=1e-3, momentum=0.9, name="bn"
        )(x)
        return fnn.relu(x)


def _pool3x3(x, stride, kind):
    # torch F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=True)
    assert kind == "avg"
    return fnn.avg_pool(
        x, (3, 3), (stride, stride), padding=((1, 1), (1, 1)), count_include_pad=True
    )


class InceptionA(fnn.Module):
    pool_features: int

    @fnn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=[(2, 2), (2, 2)], name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_3")(b3)
        bp = _pool3x3(x, 1, "avg")
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(fnn.Module):
    @fnn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), (2, 2), name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), (2, 2), name="branch3x3dbl_3")(bd)
        bp = fnn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(fnn.Module):
    c7: int

    @fnn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7dbl_5")(bd)
        bp = _pool3x3(x, 1, "avg")
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(fnn.Module):
    @fnn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), (2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), (2, 2), name="branch7x7x3_4")(b7)
        bp = fnn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(fnn.Module):
    @fnn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=[(0, 0), (1, 1)], name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=[(1, 1), (0, 0)], name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=[(0, 0), (1, 1)], name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=[(1, 1), (0, 0)], name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _pool3x3(x, 1, "avg")
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(fnn.Module):
    """Returns (pool3 features (b, 2048), logits (b, 1000)).

    Input: (b, h, w, 3) in [-1, 1]; resized to 299x299 internally.
    """

    num_classes: int = 1000

    @fnn.compact
    def __call__(self, x):
        x = resize_bilinear_nhwc(x, (299, 299))
        x = BasicConv(32, (3, 3), (2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=[(1, 1), (1, 1)], name="Conv2d_2b_3x3")(x)
        x = fnn.max_pool(x, (3, 3), (2, 2))
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = fnn.max_pool(x, (3, 3), (2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))  # pool3, 2048-d
        logits = fnn.Dense(self.num_classes, name="fc")(feats)
        return feats, logits


def random_inception_variables(seed: int = 0) -> Any:
    """Fixed-seed random-filter variables for the zero-egress fallback.

    Flax's default lecun_normal loses a factor sqrt(2) of activation scale
    per ReLU conv; across InceptionV3's ~90 convs the pool3 features
    collapse to ~1e-6 variance, making even *relative* FID/IS trends
    degenerate. Rescaling every conv kernel to He magnitude keeps the
    features non-degenerate (numbers remain non-comparable to the real
    weights — documented fallback only)."""
    import jax

    net = InceptionV3()
    variables = jax.jit(net.init)(jax.random.PRNGKey(seed),
                                  jnp.zeros((1, 75, 75, 3)))
    import math

    def scale(path, x):
        if path[-1].key == "kernel" and x.ndim == 4:
            return x * math.sqrt(2.0)
        return x

    from jax import tree_util

    params = tree_util.tree_map_with_path(scale, variables["params"])
    return {"params": params, "batch_stats": variables["batch_stats"]}


def load_torch_inception_v3(path: str) -> Any:
    """Convert a torchvision inception_v3 state_dict to this module's params."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    params: dict = {}
    stats: dict = {}

    def set_nested(tree, keys, value):
        for k in keys[:-1]:
            tree = tree.setdefault(k, {})
        tree[keys[-1]] = value

    for key, val in sd.items():
        if key.startswith("AuxLogits"):
            continue
        arr = val.numpy()
        parts = key.split(".")
        if parts[0] == "fc":
            if parts[1] == "weight":
                set_nested(params, ["fc", "kernel"], jnp.asarray(arr.T))
            else:
                set_nested(params, ["fc", "bias"], jnp.asarray(arr))
            continue
        # e.g. Mixed_5b.branch1x1.conv.weight / .bn.weight ...
        *mod, layer, kind = parts
        target = mod + [layer]
        if layer == "conv":
            set_nested(params, target + ["kernel"], jnp.asarray(arr.transpose(2, 3, 1, 0)))
        elif layer == "bn":
            name = {
                "weight": ("params", "scale"),
                "bias": ("params", "bias"),
                "running_mean": ("stats", "mean"),
                "running_var": ("stats", "var"),
            }.get(kind)
            if name is None:
                continue
            dest, leaf = name
            tree = params if dest == "params" else stats
            set_nested(tree, target + [leaf], jnp.asarray(arr))
    return {"params": params, "batch_stats": stats}
