"""The absolute-metric dress rehearsal must stay green and fast: train ->
checkpoint -> sample (reference file naming) -> IS (3-split + npy
float-range autodetect) -> FID, all through the CLIs (scripts/eval_pipeline.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


@pytest.mark.slow
def test_eval_pipeline_end_to_end(tmp_path):
    import eval_pipeline

    result = eval_pipeline.run(str(tmp_path))
    assert "IS:" in result["is"]
    assert "FID:" in result["fid"]
