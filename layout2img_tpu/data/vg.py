"""Visual Genome layout dataset (HDF5) -> fixed-shape numpy items.

Reimplements reference ``data/vg.py:32-161`` semantics:
- vocab JSON + preprocessed HDF5 (``object_names``, ``object_boxes`` xywh in
  pixels, ``objects_per_image``, ``relationship_*``, ``image_paths``);
- per item: sample up to max_objects objects, preferring ones that appear in
  relationships, topping up with orphaned objects (:97-115);
- one __image__ token with box (0, 0, 1, 1) at position O-1 (:134-135),
  remaining slots padded with __image__ / (-0.6, -0.6, 0.5, 0.5) (:137-141);
- boxes normalized xywh, flip doubling maps x0 -> 1 - (x0 + w) (:124-131);
- images resized bilinear, normalized with mean/std 0.5.

The train scripts use max_objects=30 -> num_obj 31 slots, num_classes 179
(``train_ours_d.py:44-45``).
"""

from __future__ import annotations

import json
import os

import numpy as np

PAD_BOX = (-0.6, -0.6, 0.5, 0.5)


class VgLayoutDataset:
    def __init__(
        self,
        vocab_json: str,
        h5_path: str,
        image_dir: str,
        image_size: int = 128,
        max_objects: int = 30,
        left_right_flip: bool = False,
        use_orphaned_objects: bool = True,
        max_samples: int | None = None,
        seed: int = 0,
        use_native: bool | None = None,
    ):
        import h5py

        if use_native is None:
            from layout2img_tpu.data import native

            use_native = native.native_available()
        self.use_native = use_native

        self.image_dir = image_dir
        self.image_size = image_size
        self.max_objects = max_objects
        self.left_right_flip = left_right_flip
        self.use_orphaned = use_orphaned_objects
        self.max_samples = max_samples
        # NOTE: __getitem__ runs concurrently in HostDataLoader's thread pool
        # and numpy Generators are not thread-safe — each item derives its own
        # generator from (seed, index), which is also reproducible per item
        self.seed = seed

        with open(vocab_json) as f:
            self.vocab = json.load(f)
        self.num_classes = len(self.vocab["object_idx_to_name"])

        self.data = {}
        with h5py.File(h5_path, "r") as f:
            for k, v in f.items():
                if k == "image_paths":
                    self.image_paths = [
                        p.decode() if isinstance(p, bytes) else str(p) for p in v
                    ]
                else:
                    self.data[k] = np.asarray(v)

    def __len__(self) -> int:
        # reference semantics (data/vg.py:63-69): max_samples caps at the
        # UNflipped count — setting it disables the flip doubling
        n = self.data["object_names"].shape[0]
        if self.max_samples is not None:
            return min(self.max_samples, n)
        return n * 2 if self.left_right_flip else n

    def valid_object_counts(self) -> np.ndarray:
        """Per-image count of valid (label != 0) object slots, in one pass
        over the h5 metadata (no image IO). Deterministic even though object
        SELECTION is random: the sampler's rng only picks WHICH objects when
        crowding forces a choice, never how many — crowded-relationship
        images take max_objects, the rest min(objects, max_objects - 1)
        (the trailing __image__ token has label 0 and never counts). Feeds
        the --g_obj_budget/--d_obj_budget guards: the reference never drops
        an object (rcnn_discriminator_app.py:415-417)."""
        n = self.data["object_names"].shape[0]
        counts = np.zeros(n, np.int32)
        rel_n = self.data["relationships_per_image"]
        subs = self.data["relationship_subjects"]
        objs = self.data["relationship_objects"]
        per_img = self.data["objects_per_image"]
        for i in range(n):
            r = int(rel_n[i])
            n_rel = len(set(subs[i, :r].tolist()) | set(objs[i, :r].tolist()))
            if n_rel > self.max_objects - 1:
                counts[i] = self.max_objects
            elif self.use_orphaned:
                counts[i] = min(int(per_img[i]), self.max_objects - 1)
            else:
                counts[i] = n_rel
        return counts

    def __getitem__(self, index: int) -> dict:
        import PIL.Image
        import PIL.ImageOps

        n = self.data["object_names"].shape[0]
        flip = index >= n
        if flip:
            index -= n

        path = os.path.join(self.image_dir, self.image_paths[index])
        image = None
        if self.use_native and path.lower().endswith((".jpg", ".jpeg")):
            from layout2img_tpu.data import native

            try:
                image = native.load_image(path, self.image_size, flip)
                with PIL.Image.open(path) as img:
                    iw, ih = img.size  # header only, no decode
            except OSError:
                image = None  # fall back to PIL (e.g. non-JPEG bytes)
        if image is None:
            with open(path, "rb") as f:
                with PIL.Image.open(f) as img:
                    if flip:
                        img = PIL.ImageOps.mirror(img)
                    iw, ih = img.size
                    img = img.convert("RGB").resize(
                        (self.image_size, self.image_size), PIL.Image.BILINEAR
                    )
                    image = (np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5

        num_objs = int(self.data["objects_per_image"][index])
        with_rels: set[int] = set()
        without_rels = set(range(num_objs))
        for r in range(int(self.data["relationships_per_image"][index])):
            s = int(self.data["relationship_subjects"][index, r])
            o = int(self.data["relationship_objects"][index, r])
            with_rels.update((s, o))
            without_rels.discard(s)
            without_rels.discard(o)

        # flip folded into the stream so the mirrored copy of a crowded image
        # draws an independent object subset (the reference's stateful
        # sampler draws fresh each epoch; per-(seed,index,flip) keeps
        # reproducibility while decorrelating the pair)
        rng = np.random.default_rng((self.seed, index, int(flip)))
        obj_idxs = list(with_rels)
        orphans = list(without_rels)
        if len(obj_idxs) > self.max_objects - 1:
            obj_idxs = list(rng.choice(obj_idxs, self.max_objects, replace=False))
        if len(obj_idxs) < self.max_objects - 1 and self.use_orphaned:
            add = min(self.max_objects - 1 - len(obj_idxs), len(orphans))
            if add:
                obj_idxs += list(rng.choice(orphans, add, replace=False))

        o_slots = self.max_objects + 1
        labels = np.zeros(o_slots, np.int32)
        boxes = np.tile(np.asarray(PAD_BOX, np.float32), (o_slots, 1))
        for i, oi in enumerate(obj_idxs):
            labels[i] = int(self.data["object_names"][index, oi])
            x, y, w, h = self.data["object_boxes"][index, oi].tolist()
            x0, y0 = x / iw, y / ih
            bw, bh = w / iw, h / ih
            if flip:
                x0 = 1 - (x0 + bw)
            boxes[i] = (x0, y0, bw, bh)
        # trailing __image__ token with a full-canvas box
        k = len(obj_idxs)
        labels[k] = self.vocab["object_name_to_idx"]["__image__"]
        boxes[k] = (0.0, 0.0, 1.0, 1.0)

        return {"images": image, "labels": labels, "boxes": boxes}
