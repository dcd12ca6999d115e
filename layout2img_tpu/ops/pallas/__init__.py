"""Pallas TPU kernels for the hot ops, with pure-XLA fallbacks.

Enable with env ``L2I_USE_PALLAS=1``. Default OFF: the fused ISLA kernel
beats the XLA einsum path measured in isolation (1.05-1.7x across shapes),
but in the full train step XLA's producer/consumer fusion of the einsums
into the surrounding normalize/relu chain — which the custom_vjp boundary
blocks — wins overall (213 vs 193 img/s end-to-end on v5e). Kept as a
measured, tested optimization knob; revisit when the op mix changes
(e.g. inference-only graphs, larger o)."""

import os

import jax


def pallas_enabled() -> bool:
    flag = os.environ.get("L2I_USE_PALLAS", "0")
    if flag == "auto":
        return jax.default_backend() == "tpu"
    return flag == "1"


from layout2img_tpu.ops.pallas.isla import isla_modulate  # noqa: E402

__all__ = ["pallas_enabled", "isla_modulate"]
