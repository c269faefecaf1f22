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


def test_validate_partial_final_batch_not_dropped(tmp_path):
    """drop_last=False end-to-end: a split that doesn't divide the batch
    still evaluates every image, including under a data-parallel mesh
    (the final non-mesh-divisible batch falls back to single-device)."""
    # SyntheticDetectionDataset sizes itself batch*max(max_batches,4)=12;
    # with --max-batches 0 the loop runs the whole split. 5 images with
    # bs=2 -> batches of 2,2,1: use a VOC fixture dir with 5 val images.
    root = tmp_path / "voc"
    root.mkdir()
    _write_voc_difficult(str(root))
    # clone the single fixture image/annotation into 5 val entries
    import shutil
    jpeg = root / "VOC2007/JPEGImages"
    ann = root / "VOC2007/Annotations"
    split = root / "VOC2007/ImageSets/Main/val.txt"
    names = split.read_text().split()
    base = names[0]
    more = []
    for i in range(4):
        n = f"{base}_c{i}"
        shutil.copy(jpeg / f"{base}.jpg", jpeg / f"{n}.jpg")
        shutil.copy(ann / f"{base}.xml", ann / f"{n}.xml")
        more.append(n)
    split.write_text("\n".join(names + more) + "\n")

    metrics = validate.main([
        "--model", "efficientdet_d0", "--num-classes", "20",
        "--image-size", "128", "--batch-size", "2", "--workers", "0",
        "--mesh", "2", "--dataset", "voc2007", "--data", str(root),
    ])
    assert metrics["images"] == 5, "final partial batch was dropped"
