"""Host data-plane ingest benchmark (COCO JPEG path + VG h5+JPEG path).

Proves the loaders can feed the measured TPU step rates — flagship COCO
296 img/s/chip at b128, VG budget operating point 248 img/s/chip
(docs/perf_r4.md) — by synthesizing on-disk datasets and measuring

1. raw native JPEG decode+resize+normalize throughput (native/dataplane.cc)
   across thread counts;
2. the full CocoLayoutDataset + HostDataLoader path (JSON parse, box/label
   assembly, batch stacking) — the exact iterator cli/train.py consumes;
3. the full VgLayoutDataset + HostDataLoader path (h5 metadata, per-item
   relationship-preferring object sampling, JPEG decode) at VG shape
   (o=31 slots) — VERDICT r4 #4: the VG plane measured, not assumed.

Reference capability being matched: torch DataLoader with num_workers=8
(train_ours_d.py:61-63) / the 12-CPU SLURM provisioning (slurmtask.sh:13).
Run: python scripts/bench_ingest.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# measured TPU consumption rates to feed (docs/perf_r4.md, r4 HEAD)
STEP_RATE_COCO = 296.0  # flagship b128 128px img/s/chip
STEP_RATE_VG = 248.0    # flagship VG shape b128 g12+d12 budgets img/s/chip


def loader_thread_curve(loader_factory, label: str) -> dict[str, float]:
    """Full-loader throughput across worker-thread counts. On a 1-core
    sandbox the curve is flat and documents thread-pool overhead instead of
    scaling; either way it is measured, not extrapolated."""
    curve: dict[str, float] = {}
    for threads in (1, 2, 4, 8):
        loader = loader_factory(threads)
        next(iter(loader))  # warm (thread pool spin-up, native lib load)
        t0 = time.time()
        n = 0
        for b in loader:
            n += b["images"].shape[0]
        dt = time.time() - t0
        curve[str(threads)] = round(n / dt, 1)
        print(f"[ingest] {label} loader ({threads} threads): "
              f"{n / dt:8.1f} img/s ({n} imgs)")
    return curve


def main():
    from layout2img_tpu.data import native
    from layout2img_tpu.data.coco import CocoLayoutDataset, HostDataLoader
    from layout2img_tpu.data.synthetic import write_synthetic_coco, write_synthetic_vg
    from layout2img_tpu.data.vg import VgLayoutDataset

    n_imgs, img_size, batch = 512, 128, 64
    cores = os.cpu_count() or 1
    print(f"[ingest] host cores: {cores} (decode scales ~linearly per core; "
          f"TPU-VM hosts have dozens)")
    result: dict = {"metric": "host_ingest_images_per_sec_128px",
                    "unit": "img/s", "cores": cores}

    with tempfile.TemporaryDirectory() as root:
        t0 = time.time()
        _, inst = write_synthetic_coco(root, n_imgs)
        paths = sorted(
            os.path.join(root, f) for f in os.listdir(root) if f.endswith(".jpg")
        )
        print(f"[ingest] synthesized {n_imgs} 640x480 COCO JPEGs in {time.time()-t0:.1f}s")

        native_curve: dict[str, float] = {}
        if not native.native_available():
            print("[ingest] native data plane unavailable; PIL path only")
        else:
            flips = [False] * batch
            for threads in (1, 2, 4, 8, 16):
                native.load_batch(paths[:batch], img_size, flips, threads)  # warm
                t0 = time.time()
                reps = max(1, n_imgs // batch)
                for r in range(reps):
                    native.load_batch(paths[r * batch:(r + 1) * batch], img_size, flips, threads)
                dt = time.time() - t0
                native_curve[str(threads)] = round(reps * batch / dt, 1)
                print(f"[ingest] native decode {threads:2d} threads: "
                      f"{reps * batch / dt:8.1f} img/s")

        ds = CocoLayoutDataset(root, inst, stuff_json=None, stuff_only=False,
                               image_size=img_size, left_right_flip=True)
        coco_curve = loader_thread_curve(
            lambda t: HostDataLoader(ds, batch, seed=0, num_threads=t),
            f"COCO (native={ds.use_native})")

    with tempfile.TemporaryDirectory() as root:
        t0 = time.time()
        vocab, h5, img_root = write_synthetic_vg(root, n_imgs)
        print(f"[ingest] synthesized {n_imgs} 640x480 VG JPEGs + h5 in {time.time()-t0:.1f}s")
        # VG training shape: max_objects=30 -> 31 slots (train_ours_d.py:44-45)
        vds = VgLayoutDataset(vocab, h5, img_root, image_size=img_size,
                              max_objects=30, left_right_flip=True)
        vg_curve = loader_thread_curve(
            lambda t: HostDataLoader(vds, batch, seed=0, num_threads=t),
            f"VG (native={vds.use_native})")

    best_coco = max(coco_curve.values())
    best_vg = max(vg_curve.values())
    result.update({
        "value": best_coco,
        "per_core": round(best_coco / cores, 1),
        "native_decode_by_threads": native_curve,
        "loader_by_threads": coco_curve,
        "vs_train_step_rate": round(best_coco / STEP_RATE_COCO, 2),
        "cores_needed_for_step_rate": round(STEP_RATE_COCO / (best_coco / cores), 1),
        "vg": {
            "value": best_vg,
            "per_core": round(best_vg / cores, 1),
            "loader_by_threads": vg_curve,
            "step_rate_target": STEP_RATE_VG,
            "vs_train_step_rate": round(best_vg / STEP_RATE_VG, 2),
            "cores_needed_for_step_rate": round(STEP_RATE_VG / (best_vg / cores), 1),
        },
    })
    print(json.dumps(result))


if __name__ == "__main__":
    main()
