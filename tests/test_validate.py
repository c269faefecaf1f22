"""Offline evaluation driver tests (`python -m ood_object_detection_tpu.validate`).

The standalone checkpoint+dataset -> metrics capability (upstream-effdet
validate.py analog; the reference only evaluates inside its train loops,
pretrain.py:241-257). Covers: synthetic pipeline smoke with OOD scoring,
--out JSON artifact, and a real VOC-format fixture where the parser's
difficult flags flow into driver evaluation.
"""
import json

import numpy as np

from ood_object_detection_tpu import validate

from test_flag_plumbing import _write_voc_difficult


def test_validate_synthetic_smoke(tmp_path):
    out = tmp_path / "metrics.json"
    metrics = validate.main([
        "--model", "efficientdet_d0", "--num-classes", "4",
        "--image-size", "128", "--batch-size", "2", "--max-batches", "2",
        "--data", "synthetic", "--ood-method", "energy", "--mesh", "2",
        "--workers", "0", "--out", str(out),
    ])
    assert metrics["images"] == 4
    assert "mAP@0.5IOU" in metrics and np.isfinite(metrics["mAP@0.5IOU"])
    assert "meanCorLoc@0.5IOU" in metrics
    on_disk = json.loads(out.read_text())
    assert on_disk == metrics


def test_validate_voc_fixture(tmp_path):
    root = tmp_path / "voc"
    root.mkdir()
    _write_voc_difficult(str(root))
    metrics = validate.main([
        "--model", "efficientdet_d0", "--num-classes", "20",
        "--image-size", "128", "--batch-size", "1", "--workers", "0",
        "--mesh", "1", "--dataset", "voc2007", "--data", str(root),
    ])
    # one val image; the pascal evaluator (auto-selected) ran with the
    # difficult flag present in the batch (parser emits it end-to-end)
    assert metrics["images"] == 1
    assert "mAP@0.5IOU" in metrics
