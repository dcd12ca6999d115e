"""Fused ISLA modulation kernel.

The ISLA norm (reference ``model/norm_module.py:163-186``) modulates a
normalized feature map with mask-weighted per-object affine parameters:

    out = xn * (sum_o m_o g_o / (sum_o m_o + 1e-6) + 1)
             + sum_o m_o b_o / (sum_o m_o + 1e-6)

The XLA formulation materializes the per-pixel gamma/beta maps — two full
(b, h, w, c) tensors per norm layer (10 layers per generator forward) — in
HBM. This kernel fuses the two o-contraction matmuls (MXU), the denominator,
and the affine application into one VMEM pass per row tile, so only the
output touches HBM.

Forward is Pallas; the backward is expressed with einsums under
``jax.custom_vjp`` (matmul-shaped, XLA-fused).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6


def _choose_row_tile(h: int, w: int, c: int, o: int, budget_bytes: int = 2**20) -> int:
    """Rows per tile so x/out blocks + fp32 intermediates + double buffering
    stay well inside the ~16MB VMEM budget (see the pipeline: each block is
    double-buffered and the kernel holds ~4 fp32 (th*w, c) temporaries)."""
    per_row = w * c * 4 * 2 + o * w * 4  # xn + out (fp32) + mask
    th = max(1, budget_bytes // max(per_row, 1))
    while h % th:
        th -= 1
    return th


def _isla_kernel_batched(xn_ref, mask_ref, gamma_ref, beta_ref, out_ref):
    # blocks: xn (1, th, w, c); mask (1, th, w, o) [o last: Mosaic supports
    # collapsing leading dims while preserving the lane dim]; gamma/beta (1, o, c)
    _, th, w, c = xn_ref.shape
    o = mask_ref.shape[-1]
    m = mask_ref[0].astype(jnp.float32).reshape(th * w, o)  # (p, o)
    gamma = gamma_ref[0].astype(jnp.float32)  # (o, c)
    beta = beta_ref[0].astype(jnp.float32)
    denom = jnp.sum(m, axis=1)[:, None] + _EPS  # (p, 1)
    gmap = jax.lax.dot_general(
        m, gamma, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (p, c)
    bmap = jax.lax.dot_general(
        m, beta, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    xn = xn_ref[0].astype(jnp.float32).reshape(th * w, c)
    out = xn * (gmap / denom + 1.0) + bmap / denom
    out_ref[0] = out.reshape(th, w, c).astype(out_ref.dtype)


def _xla_reference(xn, mask, gamma, beta):
    denom = jnp.sum(mask, axis=1)[..., None] + _EPS  # (b, h, w, 1)
    gmap = jnp.einsum("bohw,boc->bhwc", mask, gamma) / denom + 1.0
    bmap = jnp.einsum("bohw,boc->bhwc", mask, beta) / denom
    return xn * gmap + bmap


@jax.custom_vjp
def isla_modulate(xn: jax.Array, mask: jax.Array, gamma: jax.Array, beta: jax.Array) -> jax.Array:
    """Fused mask-weighted affine modulation.

    Args:
      xn: (b, h, w, c) normalized features.
      mask: (b, o, h, w) soft layout masks at feature resolution.
      gamma, beta: (b, o, c) per-object affine parameters.
    """
    from layout2img_tpu.ops.pallas import pallas_enabled

    if not pallas_enabled():
        return _xla_reference(xn, mask, gamma, beta)
    b, h, w, c = xn.shape
    o = mask.shape[1]
    th = _choose_row_tile(h, w, c, o)
    grid = (b, h // th)
    mask_t = jnp.transpose(mask, (0, 2, 3, 1))  # (b, h, w, o): o in lanes
    return pl.pallas_call(
        _isla_kernel_batched,
        out_shape=jax.ShapeDtypeStruct(xn.shape, xn.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, o), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
    )(xn, mask_t, gamma, beta)


def _fwd(xn, mask, gamma, beta):
    return isla_modulate(xn, mask, gamma, beta), (xn, mask, gamma, beta)


def _bwd(res, g):
    xn, mask, gamma, beta = res
    gf = g.astype(jnp.float32)
    xf = xn.astype(jnp.float32)
    mf = mask.astype(jnp.float32)
    denom = jnp.sum(mf, axis=1)[..., None] + _EPS  # (b, h, w, 1)
    gmap = jnp.einsum("bohw,boc->bhwc", mf, gamma.astype(jnp.float32))  # un-divided
    bmap = jnp.einsum("bohw,boc->bhwc", mf, beta.astype(jnp.float32))

    dxn = gf * (gmap / denom + 1.0)
    gx = gf * xf  # (b, h, w, c)
    w_pix = mf / jnp.squeeze(denom, -1)[:, None]  # (b, o, h, w)
    dgamma = jnp.einsum("bohw,bhwc->boc", w_pix, gx)
    dbeta = jnp.einsum("bohw,bhwc->boc", w_pix, gf)
    # dmask_o(p) = [ gx·(gamma_o - Gmap/d) + g·(beta_o - Bmap/d) ] / d
    t1 = jnp.einsum("bhwc,boc->bohw", gx, gamma.astype(jnp.float32))
    t2 = jnp.einsum("bhwc,boc->bohw", gf, beta.astype(jnp.float32))
    s1 = jnp.sum(gx * gmap / denom, axis=-1)  # (b, h, w)
    s2 = jnp.sum(gf * bmap / denom, axis=-1)
    dmask = (t1 + t2 - (s1 + s2)[:, None]) / jnp.squeeze(denom, -1)[:, None]
    return (
        dxn.astype(xn.dtype),
        dmask.astype(mask.dtype),
        dgamma.astype(gamma.dtype),
        dbeta.astype(beta.dtype),
    )


isla_modulate.defvjp(_fwd, _bwd)
