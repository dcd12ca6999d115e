"""Synthetic layout batches with the exact padding conventions of the real
pipelines (COCO-Stuff: class 0 == __image__ pad, pad box (-0.6, -0.6, 0.5,
0.5) — reference ``data/cocostuff_loader.py:164,301-303``). Used by tests,
benchmarks, and dry runs."""

from __future__ import annotations

import numpy as np

PAD_BOX = (-0.6, -0.6, 0.5, 0.5)


def synthetic_batch(
    rng: np.random.Generator,
    batch_size: int,
    image_size: int = 128,
    num_objects: int = 8,
    num_classes: int = 184,
    min_objects: int = 3,
) -> dict:
    images = rng.uniform(-1, 1, (batch_size, image_size, image_size, 3)).astype(np.float32)
    labels = np.zeros((batch_size, num_objects), np.int32)
    boxes = np.tile(np.asarray(PAD_BOX, np.float32), (batch_size, num_objects, 1))
    for i in range(batch_size):
        n = int(rng.integers(min_objects, num_objects + 1))
        labels[i, :n] = rng.integers(1, num_classes, n)
        xy = rng.uniform(0, 0.6, (n, 2))
        wh = rng.uniform(0.1, 0.4, (n, 2))
        boxes[i, :n] = np.concatenate([xy, wh], -1).astype(np.float32)
    return {"images": images, "labels": labels, "boxes": boxes}


def write_synthetic_coco(
    root: str,
    n_images: int,
    width: int = 640,
    height: int = 480,
    objects_per_image: int = 5,
    quality: int = 90,
    seed: int = 0,
) -> tuple[str, str]:
    """Write a tiny on-disk COCO-format dataset (real JPEGs + instances
    JSON) for ingest benchmarks and end-to-end data-path tests.

    Returns (image_dir, instances_json_path)."""
    import json
    import os

    import PIL.Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (height, width, 3), np.uint8)
    images, anns = [], []
    for i in range(n_images):
        arr = np.roll(base, i * 7, axis=1)
        name = f"{i:06d}.jpg"
        PIL.Image.fromarray(arr).save(os.path.join(root, name), quality=quality)
        images.append({"id": i, "file_name": name, "width": width, "height": height})
        for j in range(objects_per_image):
            bw, bh = int(width * 0.25), int(height * 0.25)
            anns.append({
                "id": i * 100 + j, "image_id": i,
                "category_id": int(rng.integers(1, 90)),
                "bbox": [float(rng.integers(0, width - bw)),
                         float(rng.integers(0, height - bh)), float(bw), float(bh)],
                "iscrowd": 0,
            })
    categories = [{"id": c, "name": f"cat{c}"} for c in range(1, 91)]
    inst = os.path.join(root, "instances.json")
    with open(inst, "w") as f:
        json.dump({"images": images, "annotations": anns, "categories": categories}, f)
    return root, inst


def write_synthetic_vg(
    root: str,
    n_images: int,
    width: int = 640,
    height: int = 480,
    objects_per_image: int = 5,
    relationships_per_image: int = 2,
    quality: int = 90,
    seed: int = 0,
) -> tuple[str, str, str]:
    """Write a tiny on-disk VG-format dataset — real JPEGs + vocab.json +
    train.h5 in the exact preprocessed schema ``data/vg.py`` consumes
    (cli/preprocess_vg.py output: int32 arrays, pixel xywh boxes, vlen-str
    image_paths) — for ingest benchmarks and end-to-end data-path tests.

    Returns (vocab_json_path, h5_path, image_dir_root): pass the ROOT as the
    dataset's image_dir — image_paths carry the 'images/...' prefix like the
    real preprocessor's 'VG_100K/...'."""
    import json
    import os

    import h5py
    import PIL.Image

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (height, width, 3), np.uint8)

    names = ["__image__"] + [f"obj{i}" for i in range(1, 16)]
    vocab = {
        "object_idx_to_name": names,
        "object_name_to_idx": {n: i for i, n in enumerate(names)},
        "pred_idx_to_name": ["__in_image__", "next to"],
        "pred_name_to_idx": {"__in_image__": 0, "next to": 1},
    }
    o, r = objects_per_image, relationships_per_image
    rows = {
        "object_names": np.zeros((n_images, o), np.int32),
        "object_boxes": np.zeros((n_images, o, 4), np.int32),
        "objects_per_image": np.full(n_images, o, np.int32),
        "relationships_per_image": np.full(n_images, r, np.int32),
        "relationship_subjects": np.zeros((n_images, r), np.int32),
        "relationship_predicates": np.ones((n_images, r), np.int32),
        "relationship_objects": np.zeros((n_images, r), np.int32),
    }
    paths = []
    for i in range(n_images):
        arr = np.roll(base, i * 7, axis=1)
        name = f"{i:06d}.jpg"
        PIL.Image.fromarray(arr).save(os.path.join(img_dir, name), quality=quality)
        paths.append(os.path.join("images", name))
        rows["object_names"][i] = rng.integers(1, len(names), o)
        bw, bh = int(width * 0.3), int(height * 0.3)
        for j in range(o):
            rows["object_boxes"][i, j] = (
                int(rng.integers(0, width - bw)), int(rng.integers(0, height - bh)),
                bw, bh,
            )
        rows["relationship_subjects"][i] = rng.integers(0, o, r)
        rows["relationship_objects"][i] = rng.integers(0, o, r)

    vocab_path = os.path.join(root, "vocab.json")
    with open(vocab_path, "w") as f:
        json.dump(vocab, f)
    h5_path = os.path.join(root, "train.h5")
    with h5py.File(h5_path, "w") as f:
        f.create_dataset(
            "image_paths",
            data=np.asarray(paths, dtype=h5py.special_dtype(vlen=str)))
        for key, v in rows.items():
            f.create_dataset(key, data=v)
    return vocab_path, h5_path, root


class SyntheticLayoutDataset:
    """Iterable of synthetic batches (deterministic per seed)."""

    def __init__(self, batch_size: int, image_size: int = 128, num_objects: int = 8,
                 num_classes: int = 184, seed: int = 0, steps: int | None = None):
        self.batch_size = batch_size
        self.image_size = image_size
        self.num_objects = num_objects
        self.num_classes = num_classes
        self.seed = seed
        self.steps = steps

    def valid_object_counts(self) -> np.ndarray:
        """Synthetic batches draw n ~ U[3, num_objects] valid objects per
        image, unbounded over steps — report the attainable range so the
        object-budget guard (cli.train) sees the true max."""
        return np.arange(3, self.num_objects + 1, dtype=np.int32)

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        i = 0
        while self.steps is None or i < self.steps:
            yield synthetic_batch(
                rng, self.batch_size, self.image_size, self.num_objects, self.num_classes
            )
            i += 1
