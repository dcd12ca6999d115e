"""Evaluation CLI — covers the reference's ``IS.py`` (Inception Score over a
sample directory; 3-split protocol) and adds FID (external to the reference)
plus LPIPS diversity (``test_lpips.py``), all on-device.

Examples:
  python -m layout2img_tpu.cli.evaluate is --dir samples/
  python -m layout2img_tpu.cli.evaluate fid --dir samples/ --ref_dir real128/
  python -m layout2img_tpu.cli.evaluate lpips --dir samples/ --ref_dir real128/
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def load_image_dir(path: str, limit: int | None = None) -> np.ndarray:
    import PIL.Image

    files = sorted(
        glob.glob(os.path.join(path, "*.jpg")) + glob.glob(os.path.join(path, "*.png"))
    )
    if limit:
        files = files[:limit]
    if not files:
        raise FileNotFoundError(f"no images in {path}")
    imgs = []
    for f in files:
        with PIL.Image.open(f) as im:
            imgs.append(np.asarray(im.convert("RGB"), np.float32))
    arr = np.stack(imgs) / 255.0
    return arr * 2.0 - 1.0  # [-1, 1]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["is", "fid", "lpips"])
    p.add_argument("--dir", required=True)
    p.add_argument("--ref_dir", default="")
    p.add_argument("--splits", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--inception_weights", default="", help="torchvision inception_v3 .pth")
    p.add_argument("--lpips_weights", default="")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    limit = args.limit or None
    images = load_image_dir(args.dir, limit)

    if args.mode in ("is", "fid"):
        from layout2img_tpu.eval.inception import InceptionV3, load_torch_inception_v3
        from layout2img_tpu.eval.metrics import fid_from_features, inception_score, run_inception

        net = InceptionV3()
        if args.inception_weights:
            variables = load_torch_inception_v3(args.inception_weights)
        else:
            print("WARNING: no --inception_weights; random filters (numbers not comparable)")
            variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))

        def apply(v, x):
            return net.apply(v, x)

        feats, probs = run_inception(apply, variables, images, args.batch_size)
        if args.mode == "is":
            mean, std = inception_score(probs, args.splits)
            print(f"IS: {mean:.4f} +/- {std:.4f}  (n={len(probs)}, splits={args.splits})")
        else:
            ref = load_image_dir(args.ref_dir, limit)
            ref_feats, _ = run_inception(apply, variables, ref, args.batch_size)
            print(f"FID: {fid_from_features(feats, ref_feats):.4f}")
    else:
        from layout2img_tpu.eval.lpips import LPIPS, load_torch_lpips

        lp = LPIPS(load_torch_lpips(args.lpips_weights) if args.lpips_weights else None)
        ref = load_image_dir(args.ref_dir, limit)
        n = min(len(images), len(ref))
        import jax.numpy as jnp

        d = np.asarray(lp(jnp.asarray(ref[:n]), jnp.asarray(images[:n])))
        print(f"LPIPS: {d.mean():.4f} +/- {d.std():.4f}  (n={n})")


if __name__ == "__main__":
    main()
