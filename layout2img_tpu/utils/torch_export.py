"""Export trained flax trees back to reference-format torch ``.pth`` dicts.

The exact inverse of ``utils/torch_import.py``: a generator/discriminator
trained here can be saved as a state_dict that the REFERENCE code loads with
``strict=True`` (its test scripts' workflow, ``test_app.py:49-64``) — so a
migration can run in both directions.

Spectral norm: torch's eval-mode forward computes ``sigma = u . (W v)``
from the STORED ``(u, v)`` pair, while this framework stores only ``u`` and
recomputes ``v = normalize(W^T u)`` each call (nn/spectral.py:46-49). The
exporter therefore materializes ``weight_v = normalize(W_mat^T u)`` in
torch's (out, -1) flattening, which makes torch's stored-(u, v) sigma equal
ours exactly — eval outputs then match to float tolerance.

Layout inversions (see torch_import.py for the forward direction):
- kernel (in, out)          -> Linear weight (out, in)
- kernel (kh, kw, in, out)  -> Conv weight (out, in, kh, kw)
- batch_stats {mean, var}   -> running_mean / running_var
  (+ ``num_batches_tracked = 0``: every reference BN, including its
  SynchronizedBatchNorm2d, subclasses ``_BatchNorm`` and carries it)
- alpha (n,)                -> (1, n, 1)
- geo_proj Dense(64 -> h)   -> h x ``WGs.{i}`` Linear(64 -> 1)

NOTE: run exported checkpoints through reference models constructed the
normal way; generators must have been BUILT (not just sampled) with
``legacy_attention=True`` if you intend bit-parity with the reference's
scrambled attention concat (see nn/attention.py). Weights themselves are
layout-identical either way; only the forward wiring differs.
"""

from __future__ import annotations

import numpy as np


def _np(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x))


def _l2n(v: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    return v / max(float(np.linalg.norm(v)), eps)


class _Exporter:
    """Walks this framework's variable trees, emitting torch-named arrays."""

    def __init__(self, variables: dict, prefix: str = ""):
        self.params = variables["params"]
        self.stats = variables.get("batch_stats", {})
        self.spectral = variables.get("spectral", {})
        self.out: dict[str, np.ndarray] = {}
        self.prefix = prefix

    @staticmethod
    def _get(tree, path):
        for k in path:
            tree = tree[k]
        return tree

    def emit(self, name: str, arr) -> None:
        self.out[self.prefix + name] = _np(arr)

    def _emit_sn(self, torch_name: str, w: np.ndarray, path) -> None:
        u = _np(self._get(self.spectral, path)["u"]).astype(np.float32)
        self.emit(f"{torch_name}.weight_orig", w)
        self.emit(f"{torch_name}.weight_u", u)
        w_mat = w.reshape(w.shape[0], -1).astype(np.float32)
        self.emit(f"{torch_name}.weight_v", _l2n(w_mat.T @ u))

    def linear(self, torch_name: str, path, sn: bool) -> None:
        node = self._get(self.params, path)
        w = _np(node["kernel"]).T  # (in, out) -> (out, in)
        if sn:
            self._emit_sn(torch_name, w, path)
        else:
            self.emit(f"{torch_name}.weight", w)
        if "bias" in node:
            self.emit(f"{torch_name}.bias", node["bias"])

    def conv(self, torch_name: str, path, sn: bool) -> None:
        node = self._get(self.params, path)
        w = _np(node["kernel"]).transpose(3, 2, 0, 1)  # (kh,kw,in,out) -> (out,in,kh,kw)
        if sn:
            self._emit_sn(torch_name, w, path)
        else:
            self.emit(f"{torch_name}.weight", w)
        if "bias" in node:
            self.emit(f"{torch_name}.bias", node["bias"])

    def embed_sn(self, torch_name: str, path) -> None:
        w = _np(self._get(self.params, path)["embedding"])  # torch layout already
        self._emit_sn(torch_name, w, path)

    def bn(self, torch_name: str, path) -> None:
        try:
            node = self._get(self.params, path)
        except KeyError:  # affine=False BN (e.g. the ISLA backbone BNs)
            node = {}
        if "scale" in node:
            self.emit(f"{torch_name}.weight", node["scale"])
            self.emit(f"{torch_name}.bias", node["bias"])
        stats = self._get(self.stats, path)
        self.emit(f"{torch_name}.running_mean", stats["mean"])
        self.emit(f"{torch_name}.running_var", stats["var"])
        self.emit(f"{torch_name}.num_batches_tracked", np.asarray(0, np.int64))


def export_lostgan_generator(
    variables: dict, *, res_start: int = 1, prefix: str = ""
) -> dict[str, np.ndarray]:
    """LostGANGenerator trees -> reference generator state_dict (numpy).

    ``res_start``: the reference's first ResBlock index — 1 for the 128/256px
    families (``res1..res6``), 2 for the 64px v1 generator (``res2..res5``,
    ``resnet_generator_v1.py``). ``prefix`` prepends e.g. ``"module."`` to
    mimic a DataParallel-wrapped save.
    """
    e = _Exporter(variables, prefix)
    p = e.params
    e.emit("label_embedding.weight", p["label_embedding"]["embedding"])

    if "context" in p:
        c = p["context"]
        if "q_proj" in c:  # BoxMultiHeadedAttention
            for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                e.linear(f"context.linears.{i}", ("context", name), sn=False)
            e.linear("context.linears.3", ("context", "out_proj"), sn=False)
            gk = _np(c["geo_proj"]["kernel"])  # (64, h)
            gb = _np(c["geo_proj"]["bias"])  # (h,)
            for h in range(gk.shape[1]):
                e.emit(f"context.WGs.{h}.weight", gk[:, h][None, :])
                e.emit(f"context.WGs.{h}.bias", gb[h : h + 1])
            for mine, t_name in (("ln0", "layer_norm0"), ("ln1", "layer_norm")):
                e.emit(f"context.{t_name}.weight", c[mine]["scale"])
                e.emit(f"context.{t_name}.bias", c[mine]["bias"])
        elif "gc1_w" in c:  # GraphFunc GCN
            for gc in ("gc1", "gc2"):
                e.emit(f"context.{gc}.weight", c[f"{gc}_w"])
                e.emit(f"context.{gc}.bias", c[f"{gc}_b"])

    e.linear("fc", ("fc",), sn=True)

    blocks = sorted((k for k in p if k.startswith("res")), key=lambda s: int(s[3:]))
    for i, mine in enumerate(blocks):
        tb = f"res{res_start + i}"
        for sub in ("conv1", "conv2"):
            e.conv(f"{tb}.{sub}", (mine, sub), sn=True)
        if "c_sc" in p[mine]:
            e.conv(f"{tb}.c_sc", (mine, "c_sc"), sn=True)
        for b in ("b1", "b2"):
            e.linear(f"{tb}.{b}.weight_proj", (mine, b, "weight_proj"), sn=True)
            e.linear(f"{tb}.{b}.bias_proj", (mine, b, "bias_proj"), sn=True)
            e.bn(f"{tb}.{b}.batch_norm2d", (mine, b, "bn"))
        if "mask_conv1" in p[mine]:  # plain conv stage-mask head
            e.conv(f"{tb}.conv_mask.0", (mine, "mask_conv1"), sn=False)
            e.bn(f"{tb}.conv_mask.1", (mine, "mask_bn"))
            e.conv(f"{tb}.conv_mask.3", (mine, "mask_conv2"), sn=False)
        elif "psp" in p[mine]:  # PSP stage-mask head
            psp = p[mine]["psp"]
            s_idx = 0
            while f"stage{s_idx}_conv" in psp:
                e.conv(
                    f"{tb}.conv_mask.0.stages.{s_idx}.1",
                    (mine, "psp", f"stage{s_idx}_conv"),
                    sn=False,
                )
                e.bn(f"{tb}.conv_mask.0.stages.{s_idx}.2", (mine, "psp", f"stage{s_idx}_bn"))
                s_idx += 1
            e.conv(f"{tb}.conv_mask.0.bottleneck.0", (mine, "psp", "bottleneck_conv"), sn=False)
            e.bn(f"{tb}.conv_mask.0.bottleneck.1", (mine, "psp", "bottleneck_bn"))
            e.conv(f"{tb}.conv_mask.1", (mine, "conv_mask"), sn=False)

    i = 1
    while f"alpha{i}" in p:
        e.emit(f"alpha{i}", _np(p[f"alpha{i}"]).reshape(1, -1, 1))
        i += 1

    if "final_conv" in p:
        e.bn("final.0", ("final_bn",))
        e.conv("final.2", ("final_conv",), sn=True)

    e.linear("mask_regress.fc", ("mask_regress", "fc"), sn=True)
    for mine, t_name in (
        ("conv1", "conv1.0"),
        ("conv2", "conv2.0"),
        ("conv3a", "conv3.0"),
        ("conv3b", "conv3.3"),
    ):
        e.conv(f"mask_regress.{t_name}", ("mask_regress", mine), sn=True)
    mr_stats = e.stats.get("mask_regress", {})
    for mine, t_name in (("bn1", "conv1.1"), ("bn2", "conv2.1"), ("bn3", "conv3.1")):
        if mine in mr_stats:
            e.bn(f"mask_regress.{t_name}", ("mask_regress", mine))

    return e.out


def export_bgfg_generator(variables: dict, *, prefix: str = "") -> dict[str, np.ndarray]:
    """BgFgGenerator trees -> reference ``background_foreground_generator``
    state_dict (``resnet_generator_v1.py:358-380``). Inverse of
    ``import_bgfg_generator`` — including torch's Sequential aliasing of the
    ResBlock_1 convs (``combination.model.2/5`` duplicate conv1/conv2)."""
    out: dict[str, np.ndarray] = {}
    for stream in ("background_g", "foreground_g"):
        sub_vars = {
            "params": variables["params"][stream],
            "batch_stats": variables.get("batch_stats", {}).get(stream, {}),
            "spectral": variables.get("spectral", {}).get(stream, {}),
        }
        # the inner feature generators are 64px v1 trunks: res2..res5
        out.update(export_lostgan_generator(sub_vars, res_start=2, prefix=f"{stream}."))

    e = _Exporter(variables, prefix="")
    for t_name, mine in (
        ("combination.model.0", ("combination", "bn1")),
        ("combination.model.3", ("combination", "bn2")),
        ("combination.bn", ("combination", "bn_sc")),
    ):
        e.bn(t_name, mine)
    for t_name, mine in (
        ("combination.conv1", ("combination", "conv1")),
        ("combination.conv2", ("combination", "conv2")),
        ("combination.conv3", ("combination", "conv3")),
    ):
        e.conv(t_name, mine, sn=False)
    for alias, real in (("combination.model.2", "combination.conv1"),
                        ("combination.model.5", "combination.conv2")):
        for kind in ("weight", "bias"):
            if f"{real}.{kind}" in e.out:
                e.out[f"{alias}.{kind}"] = e.out[f"{real}.{kind}"]
    e.bn("final.0", ("final_bn",))
    e.conv("final.2", ("final_conv",), sn=True)
    out.update(e.out)
    if prefix:
        out = {prefix + k: v for k, v in out.items()}
    return out


def export_lostgan_discriminator(
    variables: dict, *, prefix: str = ""
) -> dict[str, np.ndarray]:
    """LayoutDiscriminator trees -> reference ``CombineDiscriminator*`` inner
    state_dict (``rcnn_discriminator_app.py:347-444``). For loading into a
    CombineDiscriminator wrapper, pass ``prefix="obD."``."""
    e = _Exporter(variables, prefix)
    for key in sorted(e.params):
        if key.startswith("block") or key == "app_conv":
            for sub in ("conv1", "conv2"):
                e.conv(f"{key}.{sub}", (key, sub), sn=True)
            if "c_sc" in e.params[key]:
                e.conv(f"{key}.c_sc", (key, "c_sc"), sn=True)
        elif key in ("l7", "l8", "l_im", "l_obj", "app"):
            e.linear(key, (key,), sn=True)
        elif key in ("l_y", "l_y_app"):
            e.embed_sn(key, (key,))
        else:
            raise ValueError(f"unknown discriminator component: {key}")
    return e.out
