"""Golden test for the box relational embedding vs a torch re-derivation of
the reference formula (model/resnet_generator_app_v2.py:17-76)."""

import numpy as np
import torch

import jax.numpy as jnp

from layout2img_tpu.ops.relation import box_relational_embedding


def _torch_box_relational_embedding(f_g, dim_g=64, wave_len=1000, trig=True):
    batch_size = f_g.size(0)
    x_min, y_min, x_max, y_max = torch.chunk(f_g, 4, dim=-1)
    cx = (x_min + x_max) * 0.5
    cy = (y_min + y_max) * 0.5
    w = (x_max - x_min) + 1.0
    h = (y_max - y_min) + 1.0
    delta_x = cx - cx.view(batch_size, 1, -1)
    delta_x = torch.log(torch.clamp(torch.abs(delta_x / w), min=1e-3))
    delta_y = cy - cy.view(batch_size, 1, -1)
    delta_y = torch.log(torch.clamp(torch.abs(delta_y / h), min=1e-3))
    delta_w = torch.log(w / w.view(batch_size, 1, -1))
    delta_h = torch.log(h / h.view(batch_size, 1, -1))
    sz = delta_h.size()
    pos = torch.cat(
        [d.view(batch_size, sz[1], sz[2], 1) for d in (delta_x, delta_y, delta_w, delta_h)], -1
    )
    if not trig:
        return pos
    feat_range = torch.arange(dim_g / 8)
    dim_mat = 1.0 / torch.pow(wave_len, feat_range / (dim_g / 8))
    mul = (100.0 * pos).view(batch_size, sz[1], sz[2], 4, -1) * dim_mat.view(1, 1, 1, -1)
    mul = mul.view(batch_size, sz[1], sz[2], -1)
    return torch.cat((torch.sin(mul), torch.cos(mul)), -1)


def test_box_relational_embedding_matches_reference(rng):
    boxes = rng.random((2, 8, 4)).astype(np.float32)
    want = _torch_box_relational_embedding(torch.from_numpy(boxes)).numpy()
    got = np.asarray(box_relational_embedding(jnp.asarray(boxes)))
    assert got.shape == (2, 8, 8, 64)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_box_relational_embedding_no_trig(rng):
    boxes = rng.random((1, 4, 4)).astype(np.float32)
    want = _torch_box_relational_embedding(torch.from_numpy(boxes), trig=False).numpy()
    got = np.asarray(box_relational_embedding(jnp.asarray(boxes), trignometric=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
