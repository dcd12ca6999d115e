"""Smoke test for the human-study chart CLI (reference
manual_result_visulization.py analog)."""

import json
import os

from layout2img_tpu.cli import human_study


def test_default_charts(tmp_path):
    out = tmp_path / "charts"
    human_study.main(["--out_dir", str(out)])
    files = sorted(os.listdir(out))
    assert files == ["pies_0.png", "pies_1.png", "preference_bars.png"]
    for f in files:
        assert (out / f).stat().st_size > 1000


def test_custom_json(tmp_path):
    study = [{
        "name": "A vs B",
        "labels": ["A", "B"],
        "results": {"coco": {"P1": 70, "P2": 30, "all": 50.0}},
    }]
    jpath = tmp_path / "study.json"
    jpath.write_text(json.dumps(study))
    out = tmp_path / "charts"
    human_study.main(["--json", str(jpath), "--out_dir", str(out)])
    assert (out / "pies_0.png").exists()
    assert (out / "preference_bars.png").exists()
