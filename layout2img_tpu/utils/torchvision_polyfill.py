"""A pure-torch ``torchvision`` stand-in for loading the REFERENCE models.

The sandbox has torch but not torchvision; the reference discriminators
construct ``torchvision.ops.RoIAlign((8, 8), scale, int(0))``
(``model/rcnn_discriminator_app.py:32-33,98-99``). ``install()`` registers
fake ``torchvision`` modules whose RoIAlign matches torchvision's
aligned=False algorithm exactly, INCLUDING the adaptive ``sampling_ratio=0``
grid (``ceil(bin_size)`` taps per bin — torchvision ``roi_align.cpp``).

Used by the parity/fine-tune tests (tests/conftest.py) and by
``scripts/train_conditioning_check.py --torch_init``. Slow (pure-python
loops) — intended for small parity batches, never for training itself.
"""

from __future__ import annotations

import sys
import types

import numpy as np


def make_roi_align_polyfill():
    import torch.nn as nn

    class RoIAlignPolyfill(nn.Module):
        def __init__(self, output_size, spatial_scale, sampling_ratio):
            super().__init__()
            self.out = output_size[0] if isinstance(output_size, tuple) else output_size
            self.scale = spatial_scale
            self.sr = int(sampling_ratio)

        def forward(self, feats, rois):
            n = rois.shape[0]
            _, c, h, w = feats.shape
            out = feats.new_zeros((n, c, self.out, self.out))

            def tap(fm, y, x):
                if y < -1.0 or y > h or x < -1.0 or x > w:
                    return fm.new_zeros(c)
                y = min(max(float(y), 0.0), h - 1)
                x = min(max(float(x), 0.0), w - 1)
                y0, x0 = int(np.floor(y)), int(np.floor(x))
                y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                ly, lx = y - y0, x - x0
                return (fm[:, y0, x0] * (1 - ly) * (1 - lx) + fm[:, y0, x1] * (1 - ly) * lx
                        + fm[:, y1, x0] * ly * (1 - lx) + fm[:, y1, x1] * ly * lx)

            for i in range(n):
                idx = int(rois[i, 0])
                x0, y0, x1, y1 = (rois[i, 1:] * self.scale).tolist()
                rw, rh = max(x1 - x0, 1.0), max(y1 - y0, 1.0)
                bw, bh = rw / self.out, rh / self.out
                # sampling_ratio <= 0: adaptive grid (torchvision roi_align.cpp)
                gx = self.sr if self.sr > 0 else max(int(np.ceil(bw)), 1)
                gy = self.sr if self.sr > 0 else max(int(np.ceil(bh)), 1)
                for by in range(self.out):
                    for bx in range(self.out):
                        acc = feats.new_zeros(c)
                        for py in range(gy):
                            for px in range(gx):
                                acc = acc + tap(
                                    feats[idx],
                                    y0 + (by + (py + 0.5) / gy) * bh,
                                    x0 + (bx + (px + 0.5) / gx) * bw,
                                )
                        out[i, :, by, bx] = acc / (gy * gx)
            return out

    return RoIAlignPolyfill


def install() -> None:
    """Register fake torchvision modules (idempotent) and neutralize .cuda()."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    if "torchvision" in sys.modules:
        return
    RoIAlignPolyfill = make_roi_align_polyfill()
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    models = types.ModuleType("torchvision.models")
    ops.RoIAlign = RoIAlignPolyfill
    ops.RoIPool = RoIAlignPolyfill
    models.vgg19 = None  # reference utils.util imports `models`; Vgg19 unused here
    tv.ops = ops
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.models"] = models
