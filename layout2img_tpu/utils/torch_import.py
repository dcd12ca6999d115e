"""Torch checkpoint interop for the LostGAN-family generators.

Imports reference ``.pth`` generator state_dicts (the artifacts the
reference's test scripts load, e.g. ``test_app.py:49-64``) into this
framework's param/batch_stats/spectral trees — and exports back.

Covers the unified ``LostGANGenerator`` layouts: v1, v2 stage-mask,
context, nogeo, graph, 64/128/256.

IMPORTANT: construct generators with ``legacy_attention=True`` when running
imported reference weights — the reference's attention output is scrambled
by a layout bug its checkpoints were trained with (see nn/attention.py).

Tensor conventions:
- Linear weight (out, in)      -> kernel (in, out)
- Conv weight (out, in, kh, kw)-> kernel (kh, kw, in, out)
- Embedding weight             -> embedding
- LayerNorm weight/bias        -> scale/bias
- BatchNorm running stats      -> batch_stats {mean, var}
- spectral_norm weight_orig/u  -> params kernel + spectral u
- alpha_i (1, 184, 1)          -> (184,)

The reference wraps training models in DataParallel, so keys may carry a
``module.`` prefix (stripped, matching ``test_app.py:53-64``).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _set(tree: dict, path: tuple[str, ...], value) -> None:
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def _linear(sd, consumed, torch_name, params, spectral, path, sn: bool):
    w_key = f"{torch_name}.weight_orig" if sn else f"{torch_name}.weight"
    w = sd[w_key]
    consumed.add(w_key)
    _set(params, path + ("kernel",), np.ascontiguousarray(np.asarray(w).T))
    if f"{torch_name}.bias" in sd:
        _set(params, path + ("bias",), np.asarray(sd[f"{torch_name}.bias"]))
        consumed.add(f"{torch_name}.bias")
    if sn:
        _set(spectral, path + ("u",), np.asarray(sd[f"{torch_name}.weight_u"]))
        consumed.add(f"{torch_name}.weight_u")
        consumed.discard(f"{torch_name}.weight_v")  # recomputed; optional
        if f"{torch_name}.weight_v" in sd:
            consumed.add(f"{torch_name}.weight_v")


def _conv(sd, consumed, torch_name, params, spectral, path, sn: bool):
    w_key = f"{torch_name}.weight_orig" if sn else f"{torch_name}.weight"
    w = np.asarray(sd[w_key])
    consumed.add(w_key)
    _set(params, path + ("kernel",), np.ascontiguousarray(w.transpose(2, 3, 1, 0)))
    if f"{torch_name}.bias" in sd:
        _set(params, path + ("bias",), np.asarray(sd[f"{torch_name}.bias"]))
        consumed.add(f"{torch_name}.bias")
    if sn:
        _set(spectral, path + ("u",), np.asarray(sd[f"{torch_name}.weight_u"]))
        consumed.add(f"{torch_name}.weight_u")
        if f"{torch_name}.weight_v" in sd:
            consumed.add(f"{torch_name}.weight_v")


def _bn(sd, consumed, torch_name, params, stats, path):
    if f"{torch_name}.weight" in sd:
        _set(params, path + ("scale",), np.asarray(sd[f"{torch_name}.weight"]))
        _set(params, path + ("bias",), np.asarray(sd[f"{torch_name}.bias"]))
        consumed.update({f"{torch_name}.weight", f"{torch_name}.bias"})
    _set(stats, path + ("mean",), np.asarray(sd[f"{torch_name}.running_mean"]))
    _set(stats, path + ("var",), np.asarray(sd[f"{torch_name}.running_var"]))
    consumed.update({f"{torch_name}.running_mean", f"{torch_name}.running_var"})
    consumed.discard(f"{torch_name}.num_batches_tracked")
    if f"{torch_name}.num_batches_tracked" in sd:
        consumed.add(f"{torch_name}.num_batches_tracked")


def import_lostgan_generator(state_dict: dict[str, Any]) -> dict:
    """Returns {'params': ..., 'batch_stats': ..., 'spectral': ...}.

    Raises on unconsumed torch keys (guards against silent mis-mapping).
    """
    sd = {
        k.removeprefix("module."): np.asarray(
            v.numpy() if hasattr(v, "numpy") else v
        )
        for k, v in state_dict.items()
    }
    consumed: set[str] = set()
    params: dict = {}
    stats: dict = {}
    spectral: dict = {}

    _set(params, ("label_embedding", "embedding"), sd["label_embedding.weight"])
    consumed.add("label_embedding.weight")

    # context attention (BoxMultiHeadedAttention, h=1)
    if "context.linears.0.weight" in sd:
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            _linear(sd, consumed, f"context.linears.{i}", params, spectral, ("context", name), sn=False)
        _linear(sd, consumed, "context.linears.3", params, spectral, ("context", "out_proj"), sn=False)
        # WGs: h x Linear(64 -> 1) == one Dense(64 -> h)
        wg_ws, wg_bs = [], []
        h = 0
        while f"context.WGs.{h}.weight" in sd:
            wg_ws.append(np.asarray(sd[f"context.WGs.{h}.weight"]))  # (1, 64)
            wg_bs.append(np.asarray(sd[f"context.WGs.{h}.bias"]))
            consumed.update({f"context.WGs.{h}.weight", f"context.WGs.{h}.bias"})
            h += 1
        _set(params, ("context", "geo_proj", "kernel"), np.concatenate(wg_ws, 0).T)
        _set(params, ("context", "geo_proj", "bias"), np.concatenate(wg_bs, 0))
        for t_name, name in (("layer_norm0", "ln0"), ("layer_norm", "ln1")):
            _set(params, ("context", name, "scale"), sd[f"context.{t_name}.weight"])
            _set(params, ("context", name, "bias"), sd[f"context.{t_name}.bias"])
            consumed.update({f"context.{t_name}.weight", f"context.{t_name}.bias"})

    # GCN context (GraphFunc)
    if "context.gc1.weight" in sd:
        for gc in ("gc1", "gc2"):
            _set(params, ("context", f"{gc}_w"), sd[f"context.{gc}.weight"])
            _set(params, ("context", f"{gc}_b"), sd[f"context.{gc}.bias"])
            consumed.update({f"context.{gc}.weight", f"context.{gc}.bias"})

    _linear(sd, consumed, "fc", params, spectral, ("fc",), sn=True)

    # reference blocks may be named res1..res6 (128/256) or res2..res5 (64px
    # v1); ours are always res1..N in order.
    torch_blocks = sorted(
        {k.split(".")[0] for k in sd if k.startswith("res")},
        key=lambda s: int(s[3:]),
    )
    for ours_idx, tb in enumerate(torch_blocks, start=1):
        mine = f"res{ours_idx}"
        for sub in ("conv1", "conv2"):
            _conv(sd, consumed, f"{tb}.{sub}", params, spectral, (mine, sub), sn=True)
        if f"{tb}.c_sc.weight_orig" in sd:
            _conv(sd, consumed, f"{tb}.c_sc", params, spectral, (mine, "c_sc"), sn=True)
        for b in ("b1", "b2"):
            _linear(sd, consumed, f"{tb}.{b}.weight_proj", params, spectral, (mine, b, "weight_proj"), sn=True)
            _linear(sd, consumed, f"{tb}.{b}.bias_proj", params, spectral, (mine, b, "bias_proj"), sn=True)
            _bn(sd, consumed, f"{tb}.{b}.batch_norm2d", params, stats, (mine, b, "bn"))
        # stage-mask heads
        if f"{tb}.conv_mask.0.weight" in sd:  # plain conv head
            _conv(sd, consumed, f"{tb}.conv_mask.0", params, spectral, (mine, "mask_conv1"), sn=False)
            _bn(sd, consumed, f"{tb}.conv_mask.1", params, stats, (mine, "mask_bn"))
            _conv(sd, consumed, f"{tb}.conv_mask.3", params, spectral, (mine, "mask_conv2"), sn=False)
        elif f"{tb}.conv_mask.0.bottleneck.0.weight" in sd:  # PSP head
            s_idx = 0
            while f"{tb}.conv_mask.0.stages.{s_idx}.1.weight" in sd:
                _conv(sd, consumed, f"{tb}.conv_mask.0.stages.{s_idx}.1", params, spectral,
                      (mine, "psp", f"stage{s_idx}_conv"), sn=False)
                _bn(sd, consumed, f"{tb}.conv_mask.0.stages.{s_idx}.2", params, stats,
                    (mine, "psp", f"stage{s_idx}_bn"))
                s_idx += 1
            _conv(sd, consumed, f"{tb}.conv_mask.0.bottleneck.0", params, spectral,
                  (mine, "psp", "bottleneck_conv"), sn=False)
            _bn(sd, consumed, f"{tb}.conv_mask.0.bottleneck.1", params, stats,
                (mine, "psp", "bottleneck_bn"))
            _conv(sd, consumed, f"{tb}.conv_mask.1", params, spectral, (mine, "conv_mask"), sn=False)

    # alpha gates
    i = 1
    while f"alpha{i}" in sd:
        _set(params, (f"alpha{i}",), np.asarray(sd[f"alpha{i}"]).reshape(-1))
        consumed.add(f"alpha{i}")
        i += 1

    # final head
    if "final.0.weight" in sd:
        _bn(sd, consumed, "final.0", params, stats, ("final_bn",))
        _conv(sd, consumed, "final.2", params, spectral, ("final_conv",), sn=True)

    # mask regression: v2 (conv3.0 + conv3.3) or v1 (same layout, BN inside)
    _linear(sd, consumed, "mask_regress.fc", params, spectral, ("mask_regress", "fc"), sn=True)
    for t_name, name in (("conv1.0", "conv1"), ("conv2.0", "conv2"), ("conv3.0", "conv3a"), ("conv3.3", "conv3b")):
        _conv(sd, consumed, f"mask_regress.{t_name}", params, spectral, ("mask_regress", name), sn=True)
    # v1 trunk BNs (SynchronizedBatchNorm2d inside each conv block)
    for t_name, name in (("conv1.1", "bn1"), ("conv2.1", "bn2"), ("conv3.1", "bn3")):
        if f"mask_regress.{t_name}.running_mean" in sd:
            _bn(sd, consumed, f"mask_regress.{t_name}", params, stats, ("mask_regress", name))

    leftovers = set(sd) - consumed
    if leftovers:
        raise ValueError(f"unmapped torch keys: {sorted(leftovers)[:10]} (+{max(0, len(leftovers) - 10)} more)")
    import jax.numpy as jnp

    to_jnp = lambda t: __import__("jax").tree_util.tree_map(jnp.asarray, t)
    return {"params": to_jnp(params), "batch_stats": to_jnp(stats), "spectral": to_jnp(spectral)}


def import_bgfg_generator(state_dict: dict[str, Any]) -> dict:
    """Import a reference ``background_foreground_generator`` checkpoint
    (Ours-ED, ``resnet_generator_v1.py:358-380``) into BgFgGenerator trees.

    Structure: two feature-only v1 generators (``background_g.*`` /
    ``foreground_g.*``), the ResBlock_1 fusion (``combination.*`` — note
    torch dedupes the Sequential aliases of conv1/conv2, so the BNs live at
    ``combination.model.0`` / ``combination.model.3``), and the RGB head.
    """
    sd = {
        k.removeprefix("module."): np.asarray(v.numpy() if hasattr(v, "numpy") else v)
        for k, v in state_dict.items()
    }
    consumed: set[str] = set()
    params: dict = {}
    stats: dict = {}
    spectral: dict = {}

    for stream in ("background_g", "foreground_g"):
        sub = {k[len(stream) + 1:]: v for k, v in sd.items() if k.startswith(stream + ".")}
        consumed.update(stream + "." + k for k in sub)
        trees = import_lostgan_generator(sub)
        params[stream] = trees["params"]
        stats[stream] = trees["batch_stats"]
        spectral[stream] = trees["spectral"]

    # combination (ResBlock_1): bn1<-model.0, conv1, bn2<-model.3, conv2,
    # bn_sc<-bn, conv3
    for t_name, mine in (
        ("combination.model.0", ("combination", "bn1")),
        ("combination.model.3", ("combination", "bn2")),
        ("combination.bn", ("combination", "bn_sc")),
    ):
        _bn(sd, consumed, t_name, params, stats, mine)
    for t_name, mine in (
        ("combination.conv1", ("combination", "conv1")),
        ("combination.conv2", ("combination", "conv2")),
        ("combination.conv3", ("combination", "conv3")),
    ):
        _conv(sd, consumed, t_name, params, spectral, mine, sn=False)

    # Sequential aliases of conv1/conv2 inside ResBlock_1 (same tensors)
    for alias in ("combination.model.2", "combination.model.5"):
        for kind in ("weight", "bias"):
            if f"{alias}.{kind}" in sd:
                consumed.add(f"{alias}.{kind}")

    _bn(sd, consumed, "final.0", params, stats, ("final_bn",))
    _conv(sd, consumed, "final.2", params, spectral, ("final_conv",), sn=True)

    leftovers = set(sd) - consumed
    if leftovers:
        raise ValueError(f"unmapped torch keys: {sorted(leftovers)[:10]}")
    import jax.numpy as jnp

    to_jnp = lambda t: __import__("jax").tree_util.tree_map(jnp.asarray, t)
    return {"params": to_jnp(params), "batch_stats": to_jnp(stats), "spectral": to_jnp(spectral)}


def import_lostgan_discriminator(state_dict: dict[str, Any]) -> dict:
    """Import a reference ``CombineDiscriminator{64,128,128_app,256}``
    state_dict (``rcnn_discriminator_app.py:347-444``; inner module under
    ``obD.``) into LayoutDiscriminator trees."""
    sd = {
        k.removeprefix("module.").removeprefix("obD."): np.asarray(
            v.numpy() if hasattr(v, "numpy") else v
        )
        for k, v in state_dict.items()
    }
    consumed: set[str] = set()
    params: dict = {}
    stats: dict = {}
    spectral: dict = {}

    def conv_block(torch_name, mine):
        for sub in ("conv1", "conv2"):
            _conv(sd, consumed, f"{torch_name}.{sub}", params, spectral, (mine, sub), sn=True)
        if f"{torch_name}.c_sc.weight_orig" in sd:
            _conv(sd, consumed, f"{torch_name}.c_sc", params, spectral, (mine, "c_sc"), sn=True)

    def sn_embed(torch_name, mine):
        _set(params, (mine, "embedding"), sd[f"{torch_name}.weight_orig"])
        _set(spectral, (mine, "u"), sd[f"{torch_name}.weight_u"])
        consumed.update({f"{torch_name}.weight_orig", f"{torch_name}.weight_u"})
        if f"{torch_name}.weight_v" in sd:
            consumed.add(f"{torch_name}.weight_v")

    for key in sorted({k.split(".")[0] for k in sd}):
        if key.startswith("block"):  # block1..7, block_obj3..6
            conv_block(key, key)
        elif key in ("l7", "l8", "l_im", "l_obj", "app"):
            mine = key
            _linear(sd, consumed, key, params, spectral, (mine,), sn=True)
        elif key in ("l_y", "l_y_app"):
            sn_embed(key, key)
        elif key == "app_conv":
            conv_block(key, key)
        else:
            raise ValueError(f"unknown discriminator component: {key}")

    leftovers = set(sd) - consumed
    if leftovers:
        raise ValueError(f"unmapped torch keys: {sorted(leftovers)[:10]}")
    import jax.numpy as jnp

    to_jnp = lambda t: __import__("jax").tree_util.tree_map(jnp.asarray, t)
    return {"params": to_jnp(params), "batch_stats": to_jnp(stats), "spectral": to_jnp(spectral)}
