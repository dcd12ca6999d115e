"""HLO dtype audit — regression guard against silent f32 promotions.

History (CLAUDE.md Perf state): three separate bugs each silently promoted a
chunk of the network to f32 under mixed precision and each cost 5-10% of
end-to-end throughput when fixed — SNDense/SNEmbed/attention-scale/sampling
matrices (round 2, +10%), the VGG perceptual stack (+1.7%), and the RoIAlign
tap matrices (+7%). None changed numerics enough for a loss test to notice.

This test catches the whole class structurally: lower (trace only, no
compile) the mixed-precision train step and the bf16 serving sampler to
StableHLO and assert that every convolution and every matrix-matrix
``dot_general`` runs on bf16 operands. f32 mat-VEC dots are allowed — the
spectral-norm power iterations (nn/spectral.py) deliberately stay f32, and
every one of them has the rank-1 ``u``/``v`` vector as an operand.
"""

import re
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layout2img_tpu.data.synthetic import synthetic_batch
from layout2img_tpu.losses.perceptual import VGGLoss
from layout2img_tpu.models.discriminators import LayoutDiscriminator
from layout2img_tpu.models.generators import make_generator
from layout2img_tpu.train.state import TrainConfig, create_train_state
from layout2img_tpu.train.step import make_sample_fn, make_train_step

_OP_RE = re.compile(
    r"stablehlo\.(convolution|dot_general)[^\n]*?:"
    r"\s*\(tensor<([^>]+)>,\s*tensor<([^>]+)>\)\s*->\s*tensor<([^>]+)>"
)


def _audit(hlo_text: str) -> tuple[list[str], int]:
    """Returns (violations, total matched ops)."""

    def parse(t: str) -> tuple[int, str]:
        parts = t.split("x")
        return len(parts) - 1, parts[-1]

    violations, total = [], 0
    for m in _OP_RE.finditer(hlo_text):
        kind, a, b, _ = m.groups()
        total += 1
        rank_a, dt_a = parse(a)
        rank_b, dt_b = parse(b)
        if "f32" not in (dt_a, dt_b):
            continue
        if kind == "convolution":
            violations.append(m.group(0)[:160])
        elif rank_a >= 2 and rank_b >= 2:  # mat-vec (power iteration) allowed
            violations.append(m.group(0)[:160])
    return violations, total


@pytest.fixture(scope="module")
def tiny_flagship():
    gen = make_generator("ours_d_context128", 10, ch=4, num_mask_classes=10)
    disc = LayoutDiscriminator(num_classes=10, image_size=128, ch=4, app_head=True)
    batch = synthetic_batch(np.random.default_rng(0), 2, 128, 4, 10)
    batch_sds = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), batch
    )
    return gen, disc, batch_sds


def test_train_step_has_no_f32_matmuls_under_mixed_precision(tiny_flagship):
    gen, disc, batch_sds = tiny_flagship
    cfg = TrainConfig(mixed_precision=True)
    # eager (unjitted) VGG init: small once-off; jitting it would compile
    vgg = VGGLoss()
    # shapes only — eval_shape traces create_train_state without running it
    state_sds = jax.eval_shape(
        partial(create_train_state, generator=gen, discriminator=disc,
                example_batch=batch_sds, config=cfg),
        jax.random.PRNGKey(0),
    )
    step = make_train_step(gen, disc, cfg, vgg_loss=vgg)
    rng_sds = jax.ShapeDtypeStruct((2,), jnp.uint32)
    txt = jax.jit(step).lower(state_sds, batch_sds, rng_sds).as_text()
    violations, total = _audit(txt)
    # regex rot guard: the full G+D+VGG step has hundreds of convs/dots
    assert total > 300, f"audit regex matched only {total} ops"
    assert not violations, "f32 heavy ops under mixed precision:\n" + "\n".join(violations)


def test_bf16_sampler_has_no_f32_matmuls(tiny_flagship):
    gen, disc, batch_sds = tiny_flagship
    cfg = TrainConfig(use_vgg_loss=False)
    state_sds = jax.eval_shape(
        partial(create_train_state, generator=gen, discriminator=disc,
                example_batch=batch_sds, config=cfg),
        jax.random.PRNGKey(0),
    )
    bf16_params = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, jnp.bfloat16 if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype
        ),
        state_sds.g_params,
    )
    sample = make_sample_fn(gen, cfg, dtype=jnp.bfloat16)
    rng_sds = jax.ShapeDtypeStruct((2,), jnp.uint32)
    txt = jax.jit(sample).lower(
        bf16_params, state_sds.g_state,
        batch_sds["boxes"], batch_sds["labels"], rng_sds,
    ).as_text()
    violations, total = _audit(txt)
    assert total > 50, f"audit regex matched only {total} ops"
    assert not violations, "f32 heavy ops in the bf16 sampler:\n" + "\n".join(violations)
