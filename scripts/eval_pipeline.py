"""Absolute-metric dress rehearsal: train -> sample -> IS -> FID through the
real CLIs on a tiny synthetic corpus with random-filter Inception.

Asserts the full plumbing the paper-number reproduction needs — checkpoint
round-trip into the sampler, the reference's ``sample{i}_numb{j}.jpg`` file
naming (``test_app.py:96-101``), the evaluate CLI's float-range autodetect,
and the 3-split IS protocol — so the day real weights/data are available,
reproducing README.md's table is exactly:

  1. put torchvision ``inception_v3`` / ``vgg19`` .pth files anywhere and
     pass ``--inception_weights`` / ``--vgg_weights``;
  2. point ``cli.train``/``cli.sample`` at real COCO/VG via the
     ``--coco_*`` / ``--vg_*`` flags (scripts/download_*.sh fetch them);
  3. run the same three commands this script runs.

Run directly (``python scripts/eval_pipeline.py``) or via
tests/test_eval_pipeline.py. Total budget: < 2 min on CPU.
"""

from __future__ import annotations

import contextlib
import glob
import io
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(root: str) -> dict:
    import PIL.Image

    from layout2img_tpu.cli import evaluate as evaluate_cli
    from layout2img_tpu.cli import sample as sample_cli
    from layout2img_tpu.cli import train as train_cli

    t0 = time.time()
    out_path = os.path.join(root, "train_out")
    sample_path = os.path.join(root, "samples")
    real_path = os.path.join(root, "real")

    # 1) tiny training run -> orbax checkpoint (the artifact cli.sample loads)
    train_cli.main([
        "--model", "lostgan", "--dataset", "synthetic", "--batch_size", "4",
        "--img_size", "64",  # debug size (native 128) to keep this < 2 min
        "--ch", "4", "--total_epoch", "1", "--steps_per_epoch", "2",
        "--no_vgg", "--save_every_epochs", "1", "--log_every", "1",
        "--out_path", out_path,
    ])
    ckpt_dir = os.path.join(out_path, "synthetic", "64", "lostgan", "ckpt")
    assert os.path.isdir(ckpt_dir), ckpt_dir
    print(f"[eval_pipeline] trained + checkpointed in {time.time() - t0:.1f}s")

    # 2) sample through the CLI (reference test_* protocol + file naming)
    sample_cli.main([
        "--model", "lostgan", "--dataset", "synthetic", "--ckpt_dir", ckpt_dir,
        "--img_size", "64", "--ch", "4", "--num_img", "2", "--batch_size", "4",
        "--max_layouts", "4", "--sample_path", sample_path,
    ])
    files = sorted(os.path.basename(f) for f in glob.glob(os.path.join(sample_path, "*.jpg")))
    want = sorted(f"sample{i}_numb{j}.jpg" for i in range(4) for j in range(2))
    assert files == want, (files, want)
    print(f"[eval_pipeline] sampled {len(files)} imgs with reference naming")

    # a tiny "real" corpus for FID (plumbing only — random-filter features)
    os.makedirs(real_path, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(8):
        PIL.Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB"
        ).save(os.path.join(real_path, f"real{i}.jpg"))

    def run_eval(argv) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            evaluate_cli.main(argv)
        out = buf.getvalue()
        print(out, end="")
        return out

    # 3) IS on the sample dir (3-split protocol)
    out_is = run_eval(["is", "--dir", sample_path, "--batch_size", "4", "--splits", "3"])
    assert "IS:" in out_is and "splits=3" in out_is, out_is

    # 3b) IS on an .npy input — exercises the float-range autodetect
    arr = np.stack([
        np.asarray(PIL.Image.open(os.path.join(sample_path, f)), np.float32) / 255.0
        for f in files
    ])  # [0, 1] floats, the common save format
    npy_path = os.path.join(root, "samples.npy")
    np.save(npy_path, arr)
    out_npy = run_eval(["is", "--npy", npy_path, "--batch_size", "4"])
    assert "treating as 'unit'" in out_npy and "IS:" in out_npy, out_npy

    # 4) FID sample dir vs real dir
    out_fid = run_eval(["fid", "--dir", sample_path, "--ref_dir", real_path,
                        "--batch_size", "4"])
    assert "FID:" in out_fid, out_fid

    dt = time.time() - t0
    is_line = [l for l in out_is.splitlines() if "IS:" in l][0]
    fid_line = [l for l in out_fid.splitlines() if "FID:" in l][0]
    print(f"[eval_pipeline] PASS in {dt:.1f}s — {is_line.strip()} | {fid_line.strip()} "
          f"(random-filter Inception: plumbing check, not comparable numbers)")
    return {"seconds": dt, "is": is_line, "fid": fid_line}


def main():
    with tempfile.TemporaryDirectory() as root:
        run(root)


if __name__ == "__main__":
    main()
