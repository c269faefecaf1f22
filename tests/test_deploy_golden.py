"""End-to-end deploy-path golden regression (VERDICT r4 #7).

The one test that crosses the FULL serving path from bytes-on-disk to
[B,100,6]: committed JPEGs -> native C++ libjpeg decode + letterbox
(csrc/data_core.cpp) -> fused on-device normalize -> EfficientDet-D0
forward (bf16) -> soft-NMS -> energy OOD -> original-coordinate boxes.

The golden (tests/data/deploy_fixture/golden.json) was produced by this
same pipeline on the real TPU chip (python tests/deploy_fixture.py
regen-golden); the CPU run here must reproduce it within cross-platform
bf16 tolerance. Reference path: DetBenchPredict + loader
(effdet/bench.py:79-103, effdet/data/loader.py).
"""
import json
import os

import numpy as np
import pytest

import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from deploy_fixture import (  # noqa: E402
    GOLDEN_PATH,
    N_IMAGES,
    build_checkpoint,
    run_deploy,
    summarize,
)


@pytest.mark.slow
def test_deploy_path_matches_golden(tmp_path):
    from ood_object_detection_tpu.data import native_decode_available

    if not native_decode_available():
        pytest.skip("native data core not built (make -C csrc)")
    assert os.path.exists(GOLDEN_PATH), (
        "golden missing — python tests/deploy_fixture.py regen-golden")
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)

    ckpt = build_checkpoint(str(tmp_path))
    results = run_deploy(ckpt, str(tmp_path / "dets.json"))
    got = summarize(results)

    assert [g["image"] for g in got] == [g["image"] for g in golden]
    assert len(got) == N_IMAGES
    full = {os.path.basename(r["path"]): r["detections"] for r in results}
    for g_img, e_img in zip(got, golden):
        # detection count: the 0.1 score threshold cuts a smooth sigmoid
        # slope (untrained-weight fixture), so CPU-vs-TPU bf16 drift moves
        # a handful of borderline rows (observed: 65 TPU vs 71 CPU); the
        # row matching below is the sharp check
        assert abs(g_img["num_detections"] - e_img["num_detections"]) <= 12, \
            (g_img["image"], g_img["num_detections"],
             e_img["num_detections"])
        assert g_img["num_detections"] > 0, "deploy path emitted nothing"
        # every pinned golden row must be reproduced SOMEWHERE in this
        # run's detections (order is not pinned: the bias-boost fixture
        # yields near-tie scores whose sort order is platform-sensitive)
        cand = full[g_img["image"]]
        for er in e_img["rows"]:
            matched = any(
                gr["class"] == er["class"]
                and np.allclose(gr["box_xyxy"], er["box_xyxy"], atol=3.0)
                and abs(gr["score"] - er["score"]) <= 0.02
                and abs(gr["ood_score"] - er["ood_score"]) <= 0.2
                for gr in cand)
            assert matched, (g_img["image"], "golden row unmatched", er)
