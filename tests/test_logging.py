"""MetricWriter: JSONL stream, PNG grids, optional tensorboardX mirror."""

import glob
import json
import os

import numpy as np

from layout2img_tpu.utils.logging import MetricWriter


def test_metric_writer_jsonl_and_images(tmp_path):
    w = MetricWriter(str(tmp_path))
    w.write(1, {"d_loss": 2.0, "g_loss": np.float32(1.5)})
    w.write(2, {"d_loss": 1.0})
    w.write_images(2, "samples", np.zeros((3, 8, 8, 3), np.float32))
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert [l["step"] for l in lines] == [1, 2]
    assert lines[0]["g_loss"] == 1.5
    assert glob.glob(str(tmp_path / "images" / "samples_*.png"))


def test_metric_writer_tensorboard_mirror(tmp_path):
    w = MetricWriter(str(tmp_path), tensorboard=True)
    w.write(1, {"d_loss": 2.0})
    w.write_images(1, "samples", np.zeros((2, 8, 8, 3), np.float32))
    w.close()
    events = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert events and os.path.getsize(events[0]) > 0


def test_metric_writer_nonzero_rank_is_silent(tmp_path):
    w = MetricWriter(str(tmp_path / "r1"), rank=1, tensorboard=True)
    w.write(1, {"d_loss": 2.0})
    w.write_images(1, "samples", np.zeros((2, 8, 8, 3), np.float32))
    w.close()
    assert not os.path.exists(tmp_path / "r1" / "metrics.jsonl")
