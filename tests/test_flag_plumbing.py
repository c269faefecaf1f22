"""End-to-end evaluator-flag plumbing: parser -> dataset -> collate ->
PrefetchLoader -> evaluator.

The reference feeds dataset-provided image ids and per-GT flags into its
evaluators (effdet/evaluator.py:45-49); VOC 'difficult' GT must not count
against AP (per_image_evaluation gt_is_difficult) and OpenImages
'IsGroupOf' GT must ignore contained detections (gt_is_group_of). These
tests prove the semantics are reachable from REAL parsed data through the
actual loader path, not just from hand-built evaluator inputs.
"""
import os

import numpy as np
import pytest

from ood_object_detection_tpu.data import create_dataset
from ood_object_detection_tpu.data.dataset import PrefetchLoader
from ood_object_detection_tpu.data.transforms import transforms_coco_eval
from ood_object_detection_tpu.evaluation import (
    OpenImagesEvaluator,
    PascalEvaluator,
)

SIZE = (128, 128)


def _write_jpeg(path, w, h):
    from PIL import Image
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(path)


def _write_voc_difficult(root):
    """One image, two 'dog' boxes: [2,1,40,30] normal, [8,40,46,60]
    difficult (xml uses xmin/ymin/xmax/ymax)."""
    base = os.path.join(root, "VOC2007")
    os.makedirs(os.path.join(base, "ImageSets/Main"), exist_ok=True)
    os.makedirs(os.path.join(base, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(base, "JPEGImages"), exist_ok=True)
    with open(os.path.join(base, "ImageSets/Main/val.txt"), "w") as f:
        f.write("im1\n")
    xml = """<annotation><filename>im1.jpg</filename>
<size><width>64</width><height>48</height></size>
<object><name>dog</name><difficult>0</difficult>
<bndbox><xmin>1</xmin><ymin>2</ymin><xmax>30</xmax><ymax>40</ymax></bndbox>
</object>
<object><name>dog</name><difficult>1</difficult>
<bndbox><xmin>40</xmin><ymin>8</ymin><xmax>60</xmax><ymax>46</ymax></bndbox>
</object></annotation>"""
    with open(os.path.join(base, "Annotations/im1.xml"), "w") as f:
        f.write(xml)
    _write_jpeg(os.path.join(base, "JPEGImages/im1.jpg"), 64, 48)


def _loader_batch(ds):
    ds.transform = transforms_coco_eval(SIZE)
    loader = PrefetchLoader(ds, batch_size=1, workers=0, device_put=False)
    return next(iter(loader))


def _det_from_gt(gt_yxyx, score, cls):
    """[1, max_det, 6] xyxy+score+cls detections: one box == one GT."""
    det = np.zeros((1, 10, 6), np.float32)
    y0, x0, y1, x1 = gt_yxyx
    det[0, 0] = [x0, y0, x1, y1, score, cls]
    return det


def test_voc_difficult_not_counted_against_ap(tmp_path):
    root = str(tmp_path)
    _write_voc_difficult(root)
    ds = create_dataset("voc2007", root, splits="val", keep_difficult=True)
    batch = _loader_batch(ds)

    # flags survived transform + pad + collate, aligned with boxes
    assert "difficult" in batch and batch["difficult"].shape == (1, 100)
    valid = batch["cls"][0] > 0
    assert valid.sum() == 2
    np.testing.assert_array_equal(batch["difficult"][0][valid], [0, 1])
    assert batch["img_id"].dtype == np.int64

    # detect ONLY the non-difficult box
    easy_gt = batch["bbox"][0][valid][0]
    dog = ds.parser.cat_id_to_label["dog"]
    det = _det_from_gt(easy_gt, 0.9, dog)
    target = {k: batch[k] for k in ("bbox", "cls", "img_id", "difficult")}

    ev = PascalEvaluator(len(ds.parser.cat_names))
    ev.add_predictions(det, target)
    assert ev.evaluate()["mAP@0.5IOU"] == pytest.approx(1.0), \
        "difficult GT must not count as a missed detection"

    # contrast: dropping the flag makes the difficult box a real miss
    ev2 = PascalEvaluator(len(ds.parser.cat_names))
    ev2.add_predictions(det, {k: target[k] for k in ("bbox", "cls", "img_id")})
    assert ev2.evaluate()["mAP@0.5IOU"] < 0.75


def _write_openimages_group(root):
    """One image: a normal Cat box and a large IsGroupOf Cat box."""
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "validation"), exist_ok=True)
    with open(os.path.join(
            root, "annotations/class-descriptions-boxable.csv"), "w") as f:
        f.write("/m/01,Cat\n")
    with open(os.path.join(
            root, "annotations/validation-annotations-bbox.csv"), "w") as f:
        f.write("ImageID,LabelName,XMin,XMax,YMin,YMax,IsGroupOf\n"
                "imgA,/m/01,0.05,0.35,0.05,0.35,0\n"
                "imgA,/m/01,0.5,1.0,0.5,1.0,1\n")
    with open(os.path.join(root, "annotations/validation-info.csv"), "w") as f:
        f.write("ImageID,Width,Height\nimgA,64,64\n")
    _write_jpeg(os.path.join(root, "validation/imgA.jpg"), 64, 64)


def test_openimages_group_of_ignores_contained_detection(tmp_path):
    root = str(tmp_path)
    _write_openimages_group(root)
    ds = create_dataset("openimages-v5", root, splits="val",
                        keep_group_of=True)
    batch = _loader_batch(ds)

    assert "group_of" in batch
    valid = batch["cls"][0] > 0
    assert valid.sum() == 2
    np.testing.assert_array_equal(batch["group_of"][0][valid], [0, 1])
    # string OpenImages ids collate to stable ints
    assert batch["img_id"].dtype == np.int64 and batch["img_id"][0] >= 0

    gt = batch["bbox"][0][valid]            # yxyx, transformed
    det = np.zeros((1, 10, 6), np.float32)
    y0, x0, y1, x1 = gt[0]
    det[0, 0] = [x0, y0, x1, y1, 0.9, 1]    # matches the normal box
    gy0, gx0, gy1, gx1 = gt[1]              # small det INSIDE the group box:
    ch, cw = (gy1 - gy0) * 0.25, (gx1 - gx0) * 0.25   # high IoA, low IoU
    det[0, 1] = [gx0, gy0, gx0 + cw, gy0 + ch, 0.8, 1]

    target = {k: batch[k] for k in ("bbox", "cls", "img_id", "group_of")}
    ev = OpenImagesEvaluator(1)
    ev.add_predictions(det, target)
    assert ev.evaluate()["mAP@0.5IOU"] == pytest.approx(1.0), \
        "detection inside a group-of box must be ignored, not a FP"

    # contrast: without the flag the group box is ordinary GT -> the
    # contained detection is a FP and the group box is a miss
    ev2 = OpenImagesEvaluator(1)
    ev2.add_predictions(det, {k: target[k]
                              for k in ("bbox", "cls", "img_id")})
    assert ev2.evaluate()["mAP@0.5IOU"] < 0.75


@pytest.mark.slow
def test_pretrain_cli_voc_dataset(tmp_path, capsys):
    """Driver-level: --dataset voc2007 --eval-map runs end-to-end with the
    difficult flags flowing into the evaluator (VERDICT r2 item 3)."""
    import json

    from ood_object_detection_tpu.train import pretrain

    root = tmp_path / "voc"
    root.mkdir()
    _write_voc_difficult(str(root))
    # the driver needs train + val splits
    base = root / "VOC2007"
    with open(base / "ImageSets/Main/train.txt", "w") as f:
        f.write("im1\n")

    pretrain.main([
        "--model", "efficientdet_d0", "--num-classes", "20",
        "--image-size", "128", "--fpn-repeats", "1", "--head-repeats", "1",
        "--batch-size", "1", "--steps", "2", "--val-freq", "2",
        "--val-steps", "1", "--log-freq", "1", "--warmup-steps", "1",
        "--mesh", "1", "--workers", "0", "--eval-map",
        "--dataset", "voc2007", "--data", str(root),
        "--checkpoint-dir", str(tmp_path / "ckpts"),
        "--per-cat-dir", str(tmp_path / "per_cat"),
    ])
    out = capsys.readouterr().out
    val_logs = [json.loads(l) for l in out.splitlines()
                if l.startswith("{") and "val_mAP" in l]
    assert val_logs, "no val mAP logged from the VOC dataset path"
    assert np.isfinite(val_logs[-1]["val_mAP"])
