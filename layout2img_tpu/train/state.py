"""GAN training state: one pytree carrying both networks.

Replaces the reference's scattered mutable state (module buffers, spectral
hooks, two torch optimizers — ``train_ours_d.py:76-90``) with a single
functional state consumed by one jitted step. Adam(0, 0.999) matches the
reference; ``mapping_lr_mult`` mirrors the 0.1x learning rate applied to
'mapping' params (``train_ours_d.py:79-84`` — the mapping stack is empty in
the shipped v2 models, so this is usually inactive).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import optax
from flax import struct
from flax.core import FrozenDict


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    z_dim: int = 128
    g_lr: float = 1e-4
    d_lr: float = 1e-4
    beta1: float = 0.0
    beta2: float = 0.999
    lamb_obj: float = 1.0
    lamb_app: float = 1.0
    lamb_img: float = 0.1
    use_pixel_loss: bool = True
    use_vgg_loss: bool = True
    mapping_lr_mult: float = 0.1
    # Fuse the D update's real and fake passes into ONE apply on a 2b batch
    # (score-identical — no cross-sample coupling in the D, see
    # tests/test_misc_extensions.py::test_batched_d_pass_scores_identical).
    # Delta vs the reference loop: 2 spectral power iterations per step on D
    # instead of torch's 3 (train_ours_d.py:119-150 runs D on real, detached
    # fake, and fake-for-G separately); u converges either way.
    fused_d: bool = False
    # BigGAN-style generator EMA (opt-in; 0 = off). Does not change the
    # training math — sampling uses the averaged weights when enabled.
    ema_decay: float = 0.0
    # bf16 compute with fp32 master params/optimizer state — the TPU-native
    # precision scheme (the reference trains fp32 on GPUs). Norm statistics
    # and the loss itself stay fp32 inside the modules.
    mixed_precision: bool = False
    # Rematerialization: "none", "g", "d", or "gd". jax.checkpoint around the
    # G forward and/or each D apply — trades ~one extra forward of FLOPs for
    # dropping those activations from HBM, unlocking larger per-chip batches
    # (batch 256 at 128px needs 22.4G un-rematted vs 15.75G available).
    remat: str = "none"
    # D object-path budget (0 = off): before every D apply, stable-sort the
    # VALID object slots to the front and keep only the first K, so the RoI
    # crops / object head / app head run on K slots instead of all o. On
    # padded layouts (VG pads to o=31 with ~6-10 real objects) most of D's
    # per-object work is on pad slots the masked hinge zero-weights anyway —
    # the reference never sees pads at all (ragged obj_to_img lists,
    # rcnn_discriminator_app.py) so this recovers its efficiency with static
    # shapes. EXACT numerics whenever K >= the batch's max valid count (pad
    # slots carry zero loss weight and D has no cross-object coupling);
    # objects beyond K are dropped from the D losses only (G still draws
    # them). See tests/test_train_step.py::test_d_obj_budget_matches_plain.
    d_obj_budget: int = 0
    # Generator object-path budget (0 = off): same compaction applied BEFORE
    # the G forward, so attention / mask-regress / the per-object ISLA
    # modulation (the (b, o, h, w) resized mask is the step's biggest
    # intermediate) run on K slots instead of o. Pad slots contribute
    # EXACTLY zero to the image (pad boxes splat off-canvas, pad attention
    # keys are masked, ISLA mask-weighted sums ignore zero masks), so this
    # is exact when K >= the batch's max valid count — but ONLY for
    # v2-mask-trunk generators with the corrected attention concat: the v1
    # trunk's BatchNorm couples slots through its (b*o) statistics, and
    # legacy_attention's scramble mixes slot/channel layout. D sees the
    # same compacted slots (d_obj_budget may truncate further). Unlike
    # d_obj_budget, overflow objects beyond K are dropped from the IMAGE,
    # not just from D's view — pick K at the dataset's object-count tail.
    # See tests/test_train_step.py::test_g_obj_budget_matches_plain.
    g_obj_budget: int = 0


class GANTrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    g_state: Any  # batch_stats + spectral collections
    d_params: Any
    d_state: Any  # spectral collection
    g_opt_state: Any
    d_opt_state: Any
    g_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    d_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_params: Any = None  # EMA of g_params when config.ema_decay > 0


def _make_optimizer(lr: float, cfg: TrainConfig, params: Any) -> optax.GradientTransformation:
    base = optax.adam(lr, b1=cfg.beta1, b2=cfg.beta2)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    has_mapping = any("mapping" in jax.tree_util.keystr(kp) for kp, _ in flat)
    if not has_mapping or cfg.mapping_lr_mult == 1.0:
        return base

    def label_fn(p):
        return jax.tree_util.tree_map_with_path(
            lambda kp, _: "mapping" if "mapping" in jax.tree_util.keystr(kp) else "main", p
        )

    return optax.multi_transform(
        {
            "main": base,
            "mapping": optax.adam(lr * cfg.mapping_lr_mult, b1=cfg.beta1, b2=cfg.beta2),
        },
        label_fn,
    )


def _split_collections(variables: FrozenDict | dict) -> tuple[Any, Any]:
    variables = dict(variables)
    params = variables.pop("params")
    return params, variables


def create_train_state(
    rng: jax.Array,
    generator,
    discriminator,
    example_batch: dict,
    config: TrainConfig,
) -> GANTrainState:
    """Initialize both networks and optimizers from an example batch."""
    import jax.numpy as jnp

    b, o = example_batch["labels"].shape
    rng_g, rng_d, rng_z = jax.random.split(rng, 3)
    z = jax.random.normal(rng_z, (b, o, config.z_dim))
    z_im = jax.random.normal(rng_z, (b, config.z_dim))

    # jit the inits: flax init is eager per-op otherwise, which is pathologically
    # slow over a remote-device transport
    g_vars = jax.jit(generator.init)(
        rng_g, z, example_batch["boxes"], example_batch["labels"], z_im
    )
    d_vars = jax.jit(discriminator.init)(
        rng_d, example_batch["images"], example_batch["boxes"], example_batch["labels"]
    )
    g_params, g_state = _split_collections(g_vars)
    d_params, d_state = _split_collections(d_vars)

    g_tx = _make_optimizer(config.g_lr, config, g_params)
    d_tx = _make_optimizer(config.d_lr, config, d_params)

    ema_params = None
    if config.ema_decay > 0:
        from layout2img_tpu.train.ema import ema_init

        ema_params = ema_init(g_params)

    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        ema_params=ema_params,
        g_params=g_params,
        g_state=g_state,
        d_params=d_params,
        d_state=d_state,
        # jit: optax init is otherwise one eager op per param leaf, which is
        # prohibitively slow over a remote-device transport
        g_opt_state=jax.jit(g_tx.init)(g_params),
        d_opt_state=jax.jit(d_tx.init)(d_params),
        g_tx=g_tx,
        d_tx=d_tx,
    )


def _assert_tree_compatible(name: str, imported: Any, initialized: Any) -> None:
    """Fail with a readable message when an imported torch tree does not
    match the constructed model (wrong preset / num_classes / image size)."""
    got = {jax.tree_util.keystr(kp): v.shape
           for kp, v in jax.tree_util.tree_flatten_with_path(imported)[0]}
    want = {jax.tree_util.keystr(kp): v.shape
            for kp, v in jax.tree_util.tree_flatten_with_path(initialized)[0]}
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    bad = [f"{k}: ckpt {got[k]} vs model {want[k]}"
           for k in sorted(set(got) & set(want)) if got[k] != want[k]]
    if missing or extra or bad:
        raise ValueError(
            f"torch checkpoint does not fit the constructed {name} "
            f"(check --model / dataset num_classes / --img_size):\n"
            f"  missing in ckpt: {missing[:5]}\n  extra in ckpt: {extra[:5]}\n"
            f"  shape mismatches: {bad[:5]}"
        )


def load_torch_into_state(
    state: GANTrainState,
    config: TrainConfig,
    g_variables: dict | None = None,
    d_variables: dict | None = None,
) -> GANTrainState:
    """Replace G and/or D weights with imported reference trees and reset the
    matching optimizer state — the fine-tuning entry the reference's training
    scripts expose by loading saved G+D checkpoints into the loop
    (``train_context_app_v2.py:71-104``, ``train_graph_context_app.py:70-95``).

    ``*_variables`` are importer outputs
    ({'params', 'batch_stats', 'spectral'}, ``utils/torch_import.py``).
    Optimizer moments restart at zero (the reference reloads its Adam state
    too when present; a fresh Adam at beta1=0 warms up within a few steps).
    """
    def conform_collections(name: str, new: dict, old: Any) -> dict:
        """Match the model's collection set exactly: an imported EMPTY
        collection the model doesn't carry (e.g. batch_stats for a BN-free
        D) is dropped — a structure mismatch would break lax.scan carries —
        while a non-empty unexpected collection is a config error."""
        old_keys = set(old) if isinstance(old, dict) else set()
        out = {}
        for k, v in new.items():
            if k in old_keys:
                out[k] = v
            elif jax.tree_util.tree_leaves(v):
                raise ValueError(
                    f"torch checkpoint carries a '{k}' collection the "
                    f"constructed {name} does not have")
        for k in old_keys - set(out):
            if jax.tree_util.tree_leaves(old[k]):
                raise ValueError(
                    f"torch checkpoint is missing the {name}'s '{k}' collection")
            out[k] = old[k]
        return out

    if g_variables is not None:
        g_params = g_variables["params"]
        _assert_tree_compatible("generator", g_params, state.g_params)
        g_state = conform_collections(
            "generator",
            {k: v for k, v in g_variables.items() if k != "params"},
            state.g_state,
        )
        ema_params = state.ema_params
        if ema_params is not None:
            from layout2img_tpu.train.ema import ema_init

            ema_params = ema_init(g_params)
        state = state.replace(
            g_params=g_params,
            g_state=g_state,
            g_opt_state=jax.jit(state.g_tx.init)(g_params),
            ema_params=ema_params,
        )
    if d_variables is not None:
        d_params = d_variables["params"]
        _assert_tree_compatible("discriminator", d_params, state.d_params)
        d_state = conform_collections(
            "discriminator",
            {k: v for k, v in d_variables.items() if k != "params"},
            state.d_state,
        )
        state = state.replace(
            d_params=d_params,
            d_state=d_state,
            d_opt_state=jax.jit(state.d_tx.init)(d_params),
        )
    return state
