"""Observability: process-0 logger + JSONL metric stream.

The reference logs via a file/stdout logger (``utils/logger.py:9-27``) and
tensorboardX scalars/images (``train_ours_d.py:171-183``). Here metrics go
to an append-only ``metrics.jsonl`` (machine-readable, plotting-agnostic);
image grids are saved as PNGs. ``tensorboard=True`` additionally mirrors
both into tensorboardX event files (the reference's exact surface) when the
package is importable.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time


def setup_logger(name: str, save_dir: str | None = None, rank: int = 0) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if rank > 0 or logger.handlers:
        return logger
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    sh = logging.StreamHandler(stream=sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(save_dir, "log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class MetricWriter:
    """Append-only JSONL metric stream + image-grid dumps."""

    def __init__(self, out_dir: str, rank: int = 0, tensorboard: bool = False):
        self.rank = rank
        self.out_dir = out_dir
        self._tb = None
        if rank == 0:
            os.makedirs(out_dir, exist_ok=True)
            self._f = open(os.path.join(out_dir, "metrics.jsonl"), "a")
            if tensorboard:
                try:
                    from tensorboardX import SummaryWriter

                    self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
                except ImportError:
                    logging.getLogger(__name__).warning(
                        "tensorboardX not installed; TB mirroring disabled"
                    )
        else:
            self._f = None

    def write(self, step: int, metrics: dict) -> None:
        if self._f is None:
            return
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), int(step))

    def write_images(self, step: int, name: str, images, nrow: int = 4) -> None:
        """images: (n, h, w, 3) in [-1, 1] -> grid PNG."""
        if self.rank != 0:
            return
        import numpy as np
        import PIL.Image

        arr = np.asarray(images)
        arr = np.clip(arr * 0.5 + 0.5, 0, 1)
        n, h, w, c = arr.shape
        rows = -(-n // nrow)
        grid = np.zeros((rows * h, nrow * w, c), arr.dtype)
        for i in range(n):
            r, col = divmod(i, nrow)
            grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = arr[i]
        img_dir = os.path.join(self.out_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        PIL.Image.fromarray((grid * 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"{name}_{step:08d}.png")
        )
        if self._tb is not None:
            self._tb.add_image(name, grid.transpose(2, 0, 1), int(step))

    def close(self):
        if self._f:
            self._f.close()
        if self._tb is not None:
            self._tb.close()
