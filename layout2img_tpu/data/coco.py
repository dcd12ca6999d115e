"""COCO-Stuff layout dataset -> fixed-shape numpy batches.

From-scratch reimplementation of the reference pipeline
(``data/cocostuff_loader.py:15-391``) with the same semantics:

- vocab: COCO category ids used directly as class indices; 0 == __image__
  pad (:163-164). num_classes = 184 for COCO-Stuff (:train_ours_d.py:44).
- object filter: bbox area fraction > min_object_size (0.02), iscrowd
  dropped, 'other' stuff dropped (:119-147).
- image filter: 3 <= num_objects <= 8 (:175-183).
- item: image resized (PIL bilinear) -> [-1, 1] (mean/std 0.5, :456-464),
  labels (O,) int64 padded with 0, boxes (O, 4) xywh in [0, 1] padded with
  (-0.6, -0.6, 0.5, 0.5) (:301-303).
- virtual flip doubling: index >= N mirrors the image and maps
  x0 -> 1 - (x0 + w) (:215-219, :240-252, :266-267).

TPU-native difference: the per-image Python/PIL work happens in a
thread-prefetched host loader that emits fixed-shape NHWC numpy batches
ready for ``jax.device_put`` — there is no torch DataLoader.

Also includes the fg/bg split variant feeding the Ours-ED two-stream model
(reference ``data/cocostuff_loader_ours.py:259-295,330-344``): thing
categories (< 91) are foreground; stuff (>= 92) background with ids
shifted by -91.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Iterator

import numpy as np

PAD_BOX = (-0.6, -0.6, 0.5, 0.5)


class CocoLayoutDataset:
    def __init__(
        self,
        image_dir: str,
        instances_json: str,
        stuff_json: str | None = None,
        stuff_only: bool = True,
        image_size: int = 128,
        min_object_size: float = 0.02,
        min_objects_per_image: int = 3,
        max_objects_per_image: int = 8,
        left_right_flip: bool = False,
        include_other: bool = False,
        max_samples: int | None = None,
        fg_bg_split: bool = False,
        use_native: bool | None = None,
    ):
        self.image_dir = image_dir
        self.image_size = image_size
        self.max_objects = max_objects_per_image
        self.left_right_flip = left_right_flip
        self.max_samples = max_samples
        self.fg_bg_split = fg_bg_split
        if use_native is None:
            from layout2img_tpu.data import native

            use_native = native.native_available()
        self.use_native = use_native

        with open(instances_json) as f:
            instances = json.load(f)
        stuff = None
        if stuff_json:
            with open(stuff_json) as f:
                stuff = json.load(f)

        self.image_id_to_filename = {}
        image_id_to_size = {}
        image_ids = []
        for im in instances["images"]:
            image_ids.append(im["id"])
            self.image_id_to_filename[im["id"]] = im["file_name"]
            image_id_to_size[im["id"]] = (im["width"], im["height"])

        idx_to_name = {}
        for cat in instances["categories"]:
            idx_to_name[cat["id"]] = cat["name"]
        if stuff:
            for cat in stuff["categories"]:
                idx_to_name[cat["id"]] = cat["name"]

        def keep(ann):
            w, h = ann["bbox"][2], ann["bbox"][3]
            iw, ih = image_id_to_size[ann["image_id"]]
            if (w * h) / (iw * ih) <= min_object_size:
                return False
            name = idx_to_name[ann["category_id"]]
            if name == "other" and not include_other:
                return False
            return ann["iscrowd"] != 1

        objects = defaultdict(list)
        for ann in instances["annotations"]:
            if keep(ann):
                objects[ann["image_id"]].append(
                    (ann["category_id"], tuple(ann["bbox"]))
                )
        ids_with_stuff = set()
        if stuff:
            for ann in stuff["annotations"]:
                ids_with_stuff.add(ann["image_id"])
                if keep(ann):
                    objects[ann["image_id"]].append(
                        (ann["category_id"], tuple(ann["bbox"]))
                    )
            if stuff_only:
                image_ids = [i for i in image_ids if i in ids_with_stuff]

        self.image_ids = [
            i
            for i in image_ids
            if min_objects_per_image <= len(objects[i]) <= max_objects_per_image
        ]
        self.objects = objects
        self.image_sizes = image_id_to_size
        self.vocab_size = 1 + max(idx_to_name) if idx_to_name else 1  # 0 == __image__

    def __len__(self) -> int:
        # reference semantics (cocostuff_loader.py:215-220): max_samples caps
        # at the UNflipped count — setting it disables the flip doubling
        n = len(self.image_ids)
        if self.max_samples is not None:
            return min(n, self.max_samples)
        return n * 2 if self.left_right_flip else n

    def valid_object_counts(self) -> np.ndarray:
        """Per-image count of valid (label != 0) object slots, straight from
        the filtered annotation index (no image IO). This is the distribution
        the --g_obj_budget/--d_obj_budget guards check: the reference's
        ragged ``label != 0`` path never drops an object
        (rcnn_discriminator_app.py:415-417), so a budget below this
        distribution's max silently changes semantics."""
        return np.asarray([len(self.objects[i]) for i in self.image_ids],
                          np.int32)

    def _load_image(self, image_id: int, flip: bool) -> np.ndarray:
        path = os.path.join(self.image_dir, self.image_id_to_filename[image_id])
        if self.use_native and path.lower().endswith((".jpg", ".jpeg")):
            from layout2img_tpu.data import native

            try:
                return native.load_image(path, self.image_size, flip)
            except OSError:
                pass  # fall back to PIL (e.g. non-JPEG bytes)

        import PIL.Image
        import PIL.ImageOps

        with open(path, "rb") as f:
            with PIL.Image.open(f) as img:
                if flip:
                    img = PIL.ImageOps.mirror(img)
                img = img.convert("RGB").resize(
                    (self.image_size, self.image_size), PIL.Image.BILINEAR
                )
                arr = np.asarray(img, np.float32) / 255.0
        return (arr - 0.5) / 0.5  # HWC in [-1, 1]

    def __getitem__(self, index: int) -> dict:
        flip = False
        if index >= len(self.image_ids):
            index -= len(self.image_ids)
            flip = True
        image_id = self.image_ids[index]
        iw, ih = self.image_sizes[image_id]

        labels = np.zeros(self.max_objects, np.int32)
        boxes = np.tile(np.asarray(PAD_BOX, np.float32), (self.max_objects, 1))
        for i, (cat, (x, y, w, h)) in enumerate(self.objects[image_id]):
            x0, y0 = x / iw, y / ih
            bw, bh = w / iw, h / ih
            if flip:
                x0 = 1 - (x0 + bw)
            labels[i] = cat
            boxes[i] = (x0, y0, bw, bh)

        item = {
            "images": self._load_image(image_id, flip),
            "labels": labels,
            "boxes": boxes,
        }
        if self.fg_bg_split:
            item.update(split_fg_bg(labels, boxes))
        return item


def split_fg_bg(labels: np.ndarray, boxes: np.ndarray) -> dict:
    """Ours-ED split: thing ids (<91) foreground; stuff (>=92) background
    shifted by -91 (reference cocostuff_loader_ours.py:259-295)."""
    o = labels.shape[0]
    out = {}
    for key, sel, shift in (
        ("fg", (labels >= 1) & (labels < 91), 0),
        ("bg", labels >= 92, 91),
    ):
        l = np.zeros(o, np.int32)
        b = np.tile(np.asarray(PAD_BOX, np.float32), (o, 1))
        idx = np.nonzero(sel)[0]
        l[: len(idx)] = labels[idx] - shift
        b[: len(idx)] = boxes[idx]
        out[f"labels_{key}"] = l
        out[f"boxes_{key}"] = b
    return out


def split_fg_bg_batch(batch: dict) -> dict:
    """Apply ``split_fg_bg`` across a stacked batch (adds labels_/boxes_
    fg/bg keys if absent)."""
    if "labels_fg" in batch:
        return batch
    extra = {k: [] for k in ("labels_fg", "boxes_fg", "labels_bg", "boxes_bg")}
    for i in range(batch["labels"].shape[0]):
        spl = split_fg_bg(batch["labels"][i], batch["boxes"][i])
        for k in extra:
            extra[k].append(spl[k])
    return {**batch, **{k: np.stack(v) for k, v in extra.items()}}


class HostDataLoader:
    """Thread-prefetched, shuffled, fixed-shape batch iterator."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_threads: int = 8,
        prefetch: int = 4,
        process_id: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        # multi-host data sharding: every process draws the same permutation
        # (same seed) and keeps a disjoint strided slice of it
        self.process_id = process_id
        self.process_count = process_count
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.process_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        import concurrent.futures as cf
        import queue

        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        if self.process_count > 1:
            # clamp to floor(n / process_count) so every process yields the
            # SAME batch count and shapes — a ragged final batch on one host
            # would desync the collective batch assembly (different global
            # shapes -> error on one process, collective hang on the others)
            order = order[self.process_id :: self.process_count]
            order = order[: len(self.dataset) // self.process_count]
        self._epoch += 1
        n_batches = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]

        def assemble(idxs):
            items = [self.dataset[int(i)] for i in idxs]
            return {k: np.stack([it[k] for it in items]) for k in items[0]}

        with cf.ThreadPoolExecutor(self.num_threads) as pool:
            q: queue.Queue = queue.Queue()
            it = iter(batches)
            inflight = 0
            for _ in range(min(self.prefetch, n_batches)):
                q.put(pool.submit(assemble, next(it)))
                inflight += 1
            while inflight:
                fut = q.get()
                inflight -= 1
                try:
                    nxt = next(it)
                except StopIteration:
                    nxt = None
                if nxt is not None:
                    q.put(pool.submit(assemble, nxt))
                    inflight += 1
                yield fut.result()
