"""VG preprocessing -> dataset round-trip on a synthetic raw-VG fixture."""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def raw_vg(tmp_path, rng):
    import PIL.Image

    n_img = 8
    img_dir = tmp_path / "VG_100K"
    img_dir.mkdir()
    images, objects, rels = [], [], []
    oid = 0
    for i in range(n_img):
        images.append(
            {"image_id": i, "width": 300, "height": 250, "url": f"http://x/VG_100K/{i}.jpg"}
        )
        arr = (rng.random((250, 300, 3)) * 255).astype(np.uint8)
        PIL.Image.fromarray(arr).save(img_dir / f"{i}.jpg")
        objs = []
        for j in range(4):
            objs.append(
                {
                    "object_id": oid,
                    "names": ["dog" if j % 2 == 0 else "tree"],
                    "x": 10 + j * 5, "y": 10, "w": 60, "h": 70,
                }
            )
            oid += 1
        objects.append({"image_id": i, "objects": objs})
        rels.append(
            {
                "image_id": i,
                "relationships": [
                    {
                        "predicate": "next to",
                        "subject": {"object_id": objs[0]["object_id"]},
                        "object": {"object_id": objs[1]["object_id"]},
                    }
                ],
            }
        )
    (tmp_path / "image_data.json").write_text(json.dumps(images))
    (tmp_path / "objects.json").write_text(json.dumps(objects))
    (tmp_path / "relationships.json").write_text(json.dumps(rels))
    return tmp_path


def test_preprocess_and_load(raw_vg):
    from layout2img_tpu.cli.preprocess_vg import main as preprocess
    from layout2img_tpu.data.vg import VgLayoutDataset

    preprocess(
        [
            "--vg_dir", str(raw_vg),
            "--min_object_instances", "1",
            "--min_relationship_instances", "1",
            "--min_objects_per_image", "2",
            "--max_objects_per_image", "5",
            "--val_fraction", "0.2",
            "--test_fraction", "0.2",
        ]
    )
    vocab = json.loads((raw_vg / "vocab.json").read_text())
    assert vocab["object_idx_to_name"][0] == "__image__"
    assert "dog" in vocab["object_name_to_idx"]
    assert os.path.exists(raw_vg / "train.h5")

    ds = VgLayoutDataset(
        str(raw_vg / "vocab.json"), str(raw_vg / "train.h5"), str(raw_vg),
        image_size=32, max_objects=5,
    )
    assert len(ds) >= 1
    item = ds[0]
    assert item["images"].shape == (32, 32, 3)
    assert (item["labels"] != 0).sum() >= 2
    assert item["boxes"].min() >= -0.6

    # valid_object_counts (the object-budget guard's index) must predict the
    # actual per-item nonzero-label counts exactly — the sampler's rng picks
    # WHICH objects, never how many
    counts = ds.valid_object_counts()
    assert counts.shape[0] == len(ds)
    for i in range(len(ds)):
        assert counts[i] == int((ds[i]["labels"] != 0).sum()), i


def test_visualize_helpers(rng, tmp_path):
    from layout2img_tpu.cli.visualize import colorize_classes, draw_boxes, save_mask_argmax

    cm = colorize_classes(rng.integers(0, 10, (8, 8)), 10)
    assert cm.shape == (8, 8, 3) and cm.dtype == np.uint8

    img = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    boxes = np.array([[0.1, 0.1, 0.5, 0.5], [-0.6, -0.6, 0.5, 0.5]], np.float32)
    labels = np.array([3, 0], np.int32)
    out = draw_boxes(img, boxes, labels)
    assert out.shape == img.shape and out.min() >= 0 and out.max() <= 1

    sm = rng.standard_normal((16, 16, 10)).astype(np.float32)
    save_mask_argmax(sm, str(tmp_path / "m.png"), 10)
    assert (tmp_path / "m.png").exists()
