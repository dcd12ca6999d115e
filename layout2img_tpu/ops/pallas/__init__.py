"""Pallas TPU kernels for the hot ops, with pure-XLA fallbacks.

Enable/disable with env ``L2I_USE_PALLAS`` ("1"/"0"; default: auto — on
when the default backend is TPU)."""

import os

import jax


def pallas_enabled() -> bool:
    flag = os.environ.get("L2I_USE_PALLAS", "auto")
    if flag == "auto":
        return jax.default_backend() == "tpu"
    return flag == "1"


from layout2img_tpu.ops.pallas.isla import isla_modulate  # noqa: E402

__all__ = ["pallas_enabled", "isla_modulate"]
