"""layout2img_tpu — a TPU-native layout-to-image GAN framework.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
wtliao/layout2img ("Context-Aware Layout to Image Generation with Enhanced
Object Appearance", CVPR 2021). Not a port: every CUDA/torch pattern in the
reference is replaced by an idiomatic XLA/TPU formulation:

- grid_sample / RoIAlign / mask splatting (CUDA gather kernels in the
  reference) become *separable interpolation matmuls* that run on the MXU,
  because every sampling grid in this model family is an axis-aligned box
  transform (see `layout2img_tpu.ops.interp`).
- The 546-line threaded SyncBatchNorm package
  (reference `model/sync_batchnorm/`) collapses into ordinary batch-stat
  computation under GSPMD: with the batch sharded over a `data` mesh axis,
  `jnp.mean` over the batch *is* the cross-replica mean (XLA inserts the
  collectives). See `layout2img_tpu.nn.norms.SyncBatchNorm`.
- `nn.DataParallel` becomes one jitted train step with
  `jax.sharding.NamedSharding` annotations (`layout2img_tpu.parallel`).
- Dynamic-shape object filtering (`label != 0` boolean indexing in the
  reference discriminators) becomes static-shape masking.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing jax at package import time)."""
    _exports = {
        "make_generator": ("layout2img_tpu.models.generators", "make_generator"),
        "LostGANGenerator": ("layout2img_tpu.models.generators", "LostGANGenerator"),
        "BgFgGenerator": ("layout2img_tpu.models.generators", "BgFgGenerator"),
        "make_discriminator": ("layout2img_tpu.models.discriminators", "make_discriminator"),
        "LayoutDiscriminator": ("layout2img_tpu.models.discriminators", "LayoutDiscriminator"),
        "Layout2ImGenerator": ("layout2img_tpu.models.layout2im", "Layout2ImGenerator"),
        "TrainConfig": ("layout2img_tpu.train.state", "TrainConfig"),
        "create_train_state": ("layout2img_tpu.train.state", "create_train_state"),
        "make_train_step": ("layout2img_tpu.train.step", "make_train_step"),
        "make_sample_fn": ("layout2img_tpu.train.step", "make_sample_fn"),
        "CheckpointManager": ("layout2img_tpu.train.checkpoint", "CheckpointManager"),
    }
    if name in _exports:
        import importlib

        mod, attr = _exports[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
