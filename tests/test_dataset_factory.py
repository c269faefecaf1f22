"""create_dataset named-layout factory (reference dataset_factory.py:15-99)."""
import json
import os

import numpy as np
import pytest

from ood_object_detection_tpu.data import create_dataset


def _write_coco(root, split="val2017",
                ann="annotations/instances_val2017.json"):
    os.makedirs(os.path.join(root, split), exist_ok=True)
    os.makedirs(os.path.dirname(os.path.join(root, ann)), exist_ok=True)
    data = {
        "categories": [{"id": 7, "name": "cat"}, {"id": 9, "name": "dog"}],
        "images": [{"id": 1, "file_name": "a.jpg", "width": 64, "height": 48}],
        "annotations": [
            {"image_id": 1, "category_id": 7, "bbox": [4, 8, 16, 12],
             "iscrowd": 0}],
    }
    with open(os.path.join(root, ann), "w") as f:
        json.dump(data, f)


def _write_voc(root, year="2007", split="train", stems=("im1",)):
    base = os.path.join(root, f"VOC{year}")
    os.makedirs(os.path.join(base, "ImageSets/Main"), exist_ok=True)
    os.makedirs(os.path.join(base, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(base, "JPEGImages"), exist_ok=True)
    with open(os.path.join(base, f"ImageSets/Main/{split}.txt"), "w") as f:
        f.write("\n".join(stems) + "\n")
    for s in stems:
        xml = f"""<annotation><filename>{s}.jpg</filename>
<size><width>64</width><height>48</height></size>
<object><name>dog</name><difficult>0</difficult>
<bndbox><xmin>1</xmin><ymin>2</ymin><xmax>30</xmax><ymax>40</ymax></bndbox>
</object></annotation>"""
        with open(os.path.join(base, "Annotations", s + ".xml"), "w") as f:
            f.write(xml)


def test_coco2017_layout(tmp_path):
    root = str(tmp_path)
    _write_coco(root)
    ds = create_dataset("coco2017", root, splits="val")
    assert len(ds) == 1
    ann = ds.parser.get_ann(0)
    # xywh [4,8,16,12] -> yxyx [8,4,20,20]
    np.testing.assert_allclose(ann["bbox"][0], [8, 4, 20, 20])
    assert ds.parser.cat_names == ["cat", "dog"]
    assert ds.data_dir.endswith("val2017")


def test_coco_multiple_splits(tmp_path):
    root = str(tmp_path)
    _write_coco(root, "train2017", "annotations/instances_train2017.json")
    _write_coco(root, "val2017", "annotations/instances_val2017.json")
    train, val = create_dataset("coco2017", root, splits=("train", "val"))
    assert len(train) == 1 and len(val) == 1


def test_voc2007_layout(tmp_path):
    root = str(tmp_path)
    _write_voc(root, "2007", "train", ("im1", "im2"))
    ds = create_dataset("voc2007", root, splits="train")
    assert len(ds) == 2
    assert ds.parser.get_ann(0)["cls"][0] == \
        ds.parser.cat_id_to_label["dog"]
    assert ds.data_dir.endswith("JPEGImages")


def test_voc0712_merge(tmp_path):
    root = str(tmp_path)
    _write_voc(root, "2007", "trainval", ("a07",))
    _write_voc(root, "2012", "trainval", ("b12", "c12"))
    ds = create_dataset("voc0712", root, splits="trainval")
    assert len(ds) == 3
    # merged ids unique, file names carry the year dir
    ids = [ds.parser.get_img_info(i)["id"] for i in range(3)]
    assert len(set(ids)) == 3
    assert ds.parser.get_img_info(0)["file_name"].startswith("VOC2007/")
    assert ds.parser.get_img_info(1)["file_name"].startswith("VOC2012/")


def test_openimages_layout(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "validation"), exist_ok=True)
    with open(os.path.join(
            root, "annotations/class-descriptions-boxable.csv"), "w") as f:
        f.write("/m/01,Cat\n/m/02,Dog\n")
    with open(os.path.join(
            root, "annotations/validation-annotations-bbox.csv"), "w") as f:
        f.write("ImageID,LabelName,XMin,XMax,YMin,YMax\n"
                "img1,/m/01,0.1,0.5,0.2,0.6\n")
    ds = create_dataset("openimages-v5", root, splits="val")
    assert len(ds) == 1
    assert ds.parser.cat_names == ["Cat", "Dog"]


def test_unknown_dataset(tmp_path):
    with pytest.raises(ValueError):
        create_dataset("imagenet", str(tmp_path))
    with pytest.raises(ValueError):
        create_dataset("coco2017", str(tmp_path), splits="nope")
