"""Golden test: BoxMultiHeadedAttention vs a torch re-derivation of the
reference context module (model/resnet_generator_app_v2.py:123-214), with
identical weights injected (h=1, dropout=0 — the configuration used by all
context generators: resnet_generator_app_v2.py:408)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from layout2img_tpu.nn.attention import BoxMultiHeadedAttention
from layout2img_tpu.ops.relation import box_relational_embedding


def _torch_box_attention(params, w_in, boxes, labels):
    """Reference semantics in torch, weights from the flax param tree."""

    def lin(name, x):
        k = torch.from_numpy(np.asarray(params[name]["kernel"]))  # (in, out)
        b = torch.from_numpy(np.asarray(params[name]["bias"]))
        return x @ k + b

    def layer_norm(name, x):
        g = torch.from_numpy(np.asarray(params[name]["scale"]))
        b = torch.from_numpy(np.asarray(params[name]["bias"]))
        return F.layer_norm(x, (x.shape[-1],), g, b, eps=1e-5)

    x = torch.from_numpy(w_in)
    residual = x
    q, k, v = lin("q_proj", x), lin("k_proj", x), lin("v_proj", x)

    geo = torch.from_numpy(np.asarray(box_relational_embedding(jnp.asarray(boxes))))
    w_g = F.relu(lin("geo_proj", geo))[..., 0]  # (b, o, o), h=1

    d_k = q.shape[-1]
    scaled = q @ k.transpose(-2, -1) / np.sqrt(d_k)
    mask = torch.from_numpy(labels != 0)[:, None, :]  # key mask
    scaled = scaled.masked_fill(~mask, -1e9)
    w_mn = torch.softmax(torch.log(torch.clamp(w_g, min=1e-6)) + scaled, dim=-1)
    out = w_mn @ v
    # reference h=1 heads-concat quirk: transpose + row-major reinterpret
    # (resnet_generator_app_v2.py:197-198) — a fixed scramble permutation
    b, o, d = out.shape
    out = out.transpose(1, 2).contiguous().view(b, o, d)

    out = layer_norm("ln0", out + residual)
    inner = out
    out = lin("out_proj", out)
    out = layer_norm("ln1", out + inner)
    return out.numpy()


def test_box_attention_matches_reference(rng):
    b, o, d = 2, 8, 308
    w_in = rng.standard_normal((b, o, d)).astype(np.float32)
    xy = rng.random((b, o, 2)).astype(np.float32) * 0.6
    wh = rng.random((b, o, 2)).astype(np.float32) * 0.4 + 0.05
    boxes = np.concatenate([xy, wh], -1)
    labels = rng.integers(0, 10, (b, o)).astype(np.int32)
    labels[:, -2:] = 0  # padded slots

    mod = BoxMultiHeadedAttention(heads=1, d_model=d, dropout_rate=0.0, legacy_view=True)
    variables = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(w_in), jnp.asarray(w_in), jnp.asarray(w_in),
        jnp.asarray(boxes), jnp.asarray(labels),
    )
    got = mod.apply(
        variables, jnp.asarray(w_in), jnp.asarray(w_in), jnp.asarray(w_in),
        jnp.asarray(boxes), jnp.asarray(labels),
    )
    want = _torch_box_attention(variables["params"], w_in, boxes, labels)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


def test_box_attention_pad_keys_ignored(rng):
    """Changing a padded object's content must not affect valid outputs."""
    b, o, d = 1, 6, 32
    w_in = rng.standard_normal((b, o, d)).astype(np.float32)
    boxes = rng.random((b, o, 4)).astype(np.float32) * 0.5 + 0.1
    labels = np.array([[1, 2, 3, 4, 0, 0]], dtype=np.int32)

    mod = BoxMultiHeadedAttention(heads=2, d_model=d, dropout_rate=0.0)
    variables = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(w_in), jnp.asarray(w_in), jnp.asarray(w_in),
        jnp.asarray(boxes), jnp.asarray(labels),
    )

    def run(w):
        return np.asarray(
            mod.apply(variables, jnp.asarray(w), jnp.asarray(w), jnp.asarray(w),
                      jnp.asarray(boxes), jnp.asarray(labels))
        )

    out1 = run(w_in)
    w2 = w_in.copy()
    w2[0, 4:] += 100.0  # perturb pad slots (keys/values only differ there)
    out2 = run(w2)
    np.testing.assert_allclose(out1[0, :4], out2[0, :4], rtol=1e-4, atol=1e-5)


def test_pad_softmax_mass_is_zero_at_vg_shape(rng):
    """VG-shape plateau diagnosis (VERDICT r3 weak #1): the hypothesis
    'attention softmax normalizes over ~25 pad slots' predicts nonzero
    post-softmax mass on pad keys. Measure it at the exact VG shape
    (o=31, 6 valid) in both f32 and the bf16 mixed-precision training dtype:
    the mass is ~0, so pad dilution in the attention softmax is NOT the
    cause — the remaining explanation is per-class embedding margin at
    179 classes / debug width (the ch=24 vs ch=48 controlled runs,
    docs/vg_plateau.md)."""
    b, o, d = 2, 31, 308
    for dtype in (np.float32, jnp.bfloat16):
        w_in = rng.standard_normal((b, o, d)).astype(np.float32)
        boxes = (rng.random((b, o, 4)).astype(np.float32) * 0.5 + 0.1)
        boxes[:, 6:] = (-0.6, -0.6, 0.5, 0.5)  # pad box
        labels = np.zeros((b, o), np.int32)
        labels[:, :6] = rng.integers(1, 179, (b, 6))

        mod = BoxMultiHeadedAttention(heads=1, d_model=d, dropout_rate=0.0)
        variables = mod.init(
            jax.random.PRNGKey(0), jnp.asarray(w_in), jnp.asarray(w_in),
            jnp.asarray(w_in), jnp.asarray(boxes), jnp.asarray(labels),
        )
        x = jnp.asarray(w_in, dtype)
        _, inter = mod.apply(
            variables, x, x, x, jnp.asarray(boxes, dtype), jnp.asarray(labels),
            mutable=["intermediates"],
        )
        (attn,) = inter["intermediates"]["attn_probs"]  # (b, h, q, k)
        pad_mass = np.asarray(attn, np.float32)[..., 6:].sum(-1)
        valid_rows = pad_mass[:, :, :6]  # mass pad keys receive from valid queries
        assert valid_rows.max() < 1e-6, valid_rows.max()


def test_nogeo_ablation_drops_geometry(rng):
    b, o, d = 1, 4, 16
    w_in = rng.standard_normal((b, o, d)).astype(np.float32)
    boxes1 = rng.random((b, o, 4)).astype(np.float32) * 0.5 + 0.1
    boxes2 = rng.random((b, o, 4)).astype(np.float32) * 0.5 + 0.1
    labels = np.ones((b, o), np.int32)
    mod = BoxMultiHeadedAttention(heads=1, d_model=d, use_geometry=False, dropout_rate=0.0)
    variables = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(w_in), jnp.asarray(w_in), jnp.asarray(w_in),
        jnp.asarray(boxes1), jnp.asarray(labels),
    )
    a = mod.apply(variables, jnp.asarray(w_in), jnp.asarray(w_in), jnp.asarray(w_in),
                  jnp.asarray(boxes1), jnp.asarray(labels))
    b_ = mod.apply(variables, jnp.asarray(w_in), jnp.asarray(w_in), jnp.asarray(w_in),
                   jnp.asarray(boxes2), jnp.asarray(labels))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
