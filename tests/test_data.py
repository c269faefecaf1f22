import json
import os

import numpy as np
import pytest

from ood_object_detection_tpu.data import (
    CocoParser,
    PrefetchLoader,
    SyntheticDetectionDataset,
    VocParser,
    batched_letterbox_normalize,
    collate_batch,
    pad_annotations,
    transforms_coco_eval,
    transforms_coco_train,
)


def test_pad_annotations():
    anno = dict(bbox=np.array([[1, 2, 3, 4]], np.float32),
                cls=np.array([5], np.int32))
    out = pad_annotations(anno, 10)
    assert out["bbox"].shape == (10, 4)
    assert out["cls"].shape == (10,)
    assert out["cls"][0] == 5 and out["cls"][1] == -1
    np.testing.assert_allclose(out["bbox"][1], -1.0)


def test_synthetic_dataset_deterministic():
    ds = SyntheticDetectionDataset(num_images=4, image_size=(64, 64))
    img1, anno1 = ds[2]
    img2, anno2 = ds[2]
    np.testing.assert_array_equal(img1, img2)
    np.testing.assert_array_equal(anno1["bbox"], anno2["bbox"])
    assert img1.dtype == np.uint8
    assert anno1["bbox"].shape[1] == 4


def test_collate_batch_shapes():
    ds = SyntheticDetectionDataset(num_images=4, image_size=(64, 64))
    batch = collate_batch([ds[i] for i in range(3)], max_instances=20)
    assert batch["image"].shape == (3, 64, 64, 3)
    assert batch["bbox"].shape == (3, 20, 4)
    assert batch["cls"].shape == (3, 20)
    assert batch["img_scale"].shape == (3, 1)


def test_prefetch_loader_iterates():
    ds = SyntheticDetectionDataset(num_images=10, image_size=(64, 64))
    loader = PrefetchLoader(ds, batch_size=4, shuffle=True, workers=2,
                            device_put=False)
    batches = list(loader)
    assert len(batches) == 2   # drop_last
    assert batches[0]["image"].shape == (4, 64, 64, 3)


def test_resize_pad_boxes():
    from PIL import Image
    img = Image.fromarray(np.zeros((200, 400, 3), np.uint8))
    tf = transforms_coco_eval((256, 256))
    boxes = np.array([[0.0, 0.0, 100.0, 200.0]], np.float32)
    out_img, anno = tf(img, dict(bbox=boxes.copy(), cls=np.array([1], np.int32)))
    assert out_img.shape == (256, 256, 3)
    # scale = min(256/200, 256/400) = 0.64
    np.testing.assert_allclose(anno["img_scale"], 1 / 0.64, rtol=1e-6)
    np.testing.assert_allclose(anno["bbox"][0], [0, 0, 64, 128], atol=0.5)


def test_train_transform_filters_degenerate_boxes():
    from PIL import Image
    img = Image.fromarray(np.zeros((100, 100, 3), np.uint8))
    tf = transforms_coco_train((128, 128))
    boxes = np.array([[0.0, 0.0, 50.0, 50.0],
                      [99.5, 99.5, 100.0, 100.0]], np.float32)
    _, anno = tf(img, dict(bbox=boxes.copy(), cls=np.array([1, 2], np.int32)))
    assert len(anno["bbox"]) == len(anno["cls"])


def test_device_letterbox_matches_host_scale():
    canvases = np.zeros((1, 512, 512, 3), np.uint8)
    canvases[0, :256, :512] = 100
    out = batched_letterbox_normalize(
        canvases, np.array([[256, 512]], np.int32), target_hw=(256, 256))
    # scale = min(256/256, 256/512) = 0.5 -> img_scale 2.0
    np.testing.assert_allclose(np.asarray(out["img_scale"])[0, 0], 2.0)
    img = np.asarray(out["image"][0])
    assert img.shape == (256, 256, 3)
    # bottom half (rows >= 128) is padding fill
    fill_norm = (124.0 - 0.485 * 255) / (0.229 * 255)
    np.testing.assert_allclose(img[200, 50, 0], fill_norm, rtol=1e-3)


def test_coco_parser(tmp_path):
    ann = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "width": 100, "height": 80},
            {"id": 2, "file_name": "b.jpg", "width": 50, "height": 50},
        ],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 7,
             "bbox": [10, 20, 30, 40], "iscrowd": 0},
            {"id": 11, "image_id": 1, "category_id": 3,
             "bbox": [0, 0, 5, 5], "iscrowd": 0},
        ],
        "categories": [{"id": 3, "name": "cat"}, {"id": 7, "name": "dog"}],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    parser = CocoParser(str(p))
    assert len(parser) == 2
    assert parser.cat_id_to_label == {3: 1, 7: 2}
    a = parser.get_ann(0)
    # xywh [10,20,30,40] -> yxyx [20,10,60,40]
    np.testing.assert_allclose(a["bbox"][0], [20, 10, 60, 40])
    assert a["cls"][0] == 2
    assert parser.get_ann(1)["bbox"].shape == (0, 4)


def test_voc_parser(tmp_path):
    xml = """<annotation>
      <filename>x.jpg</filename>
      <size><width>200</width><height>100</height></size>
      <object><name>dog</name><difficult>0</difficult>
        <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>50</xmax><ymax>60</ymax></bndbox>
      </object>
      <object><name>cat</name><difficult>1</difficult>
        <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>2</xmax><ymax>2</ymax></bndbox>
      </object>
    </annotation>"""
    (tmp_path / "x.xml").write_text(xml)
    parser = VocParser(str(tmp_path))
    a = parser.get_ann(0)
    assert len(a["cls"]) == 1   # difficult skipped
    np.testing.assert_allclose(a["bbox"][0], [20, 10, 60, 50])
    assert a["cls"][0] == parser.cat_id_to_label["dog"]


def test_coco_parser_crowd_and_ignore(tmp_path):
    """iscrowd boxes are excluded from targets (optionally emitted as
    'bbox_ignore'); ann['ignore'] and degenerate boxes are skipped
    (reference parser_coco.py:55-74)."""
    import json

    from ood_object_detection_tpu.data.parsers import CocoParser, ParserConfig

    data = {
        "categories": [{"id": 1, "name": "cat"}],
        "images": [{"id": 1, "file_name": "a.jpg", "width": 100, "height": 100}],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10]},
            {"image_id": 1, "category_id": 1, "bbox": [20, 20, 10, 10],
             "iscrowd": 1},
            {"image_id": 1, "category_id": 1, "bbox": [40, 40, 0.5, 10]},
            {"image_id": 1, "category_id": 1, "bbox": [60, 60, 10, 10],
             "ignore": True},
        ],
    }
    f = tmp_path / "ann.json"
    f.write_text(json.dumps(data))

    p = CocoParser(str(f))
    ann = p.get_ann(0)
    assert len(ann["cls"]) == 1                      # crowd/tiny/ignore gone
    assert "bbox_ignore" not in ann

    p2 = CocoParser(str(f), cfg=ParserConfig(include_bboxes_ignore=True))
    ann2 = p2.get_ann(0)
    assert len(ann2["cls"]) == 1
    np.testing.assert_allclose(ann2["bbox_ignore"], [[20, 20, 30, 30]])


def test_openimages_parser_group_of(tmp_path):
    """IsGroupOf boxes route to ignore regions, not targets
    (reference parser_open_images.py:175-184)."""
    from ood_object_detection_tpu.data.parsers import (
        OpenImagesParser, ParserConfig)

    (tmp_path / "cls.csv").write_text("/m/01,Cat\n")
    (tmp_path / "bbox.csv").write_text(
        "ImageID,LabelName,XMin,XMax,YMin,YMax,IsGroupOf\n"
        "img1,/m/01,0.1,0.5,0.2,0.6,0\n"
        "img1,/m/01,0.6,0.9,0.6,0.9,1\n")
    p = OpenImagesParser(
        str(tmp_path / "bbox.csv"), str(tmp_path / "cls.csv"),
        cfg=ParserConfig(include_bboxes_ignore=True, bbox_min_size=0.0))
    ann = p.get_ann(0)
    assert len(ann["cls"]) == 1
    assert ann["bbox_ignore"].shape == (1, 4)


def test_prefetch_loader_process_sharding():
    """Per-process sample sharding (reference DistributedSampler /
    OrderedDistributedSampler, effdet/data/loader.py:207-214): ranks
    stride disjoint samples; the wrap-pad makes every rank the same
    length; the union covers the dataset."""
    from ood_object_detection_tpu.data.dataset import (
        PrefetchLoader, SyntheticDetectionDataset)

    ds = SyntheticDetectionDataset(num_images=10, image_size=(64, 64),
                                   num_classes=3, max_boxes=2)
    world = 4

    def ids_for(rank, shuffle):
        loader = PrefetchLoader(ds, batch_size=1, shuffle=shuffle,
                                workers=1, drop_last=False,
                                device_put=False, seed=7,
                                process_index=rank, process_count=world)
        return [int(i) for b in loader for i in np.asarray(b["img_id"])]

    for shuffle in (False, True):
        per_rank = [ids_for(r, shuffle) for r in range(world)]
        # wrap-pad: ceil(10/4)*4 = 12 -> 3 per rank
        assert all(len(ids) == 3 for ids in per_rank)
        all_ids = [i for ids in per_rank for i in ids]
        assert set(all_ids) == set(range(10))
        # only the 2 wrap-pad samples repeat
        from collections import Counter
        assert sum(c - 1 for c in Counter(all_ids).values()) == 2
    # ordered (eval) variant is the identity order, strided
    assert ids_for(0, False) == [0, 4, 8]
    assert ids_for(1, False) == [1, 5, 9]
    # same shared-seed shuffle on every rank: epoch orders are consistent
    # (rank shards are a partition of one permutation, not 4 permutations)
    ord_a = [ids_for(r, True) for r in range(world)]
    ord_b = [ids_for(r, True) for r in range(world)]
    assert ord_a == ord_b


def test_episode_streams_process_disjoint():
    """Per-process episodic streams draw different samples (the infinite-
    stream analog of the sampler split)."""
    from ood_object_detection_tpu.data.pretrain_stream import (
        PretrainEpisodeStream)
    from ood_object_detection_tpu.data import SyntheticEpisodeSource

    src = SyntheticEpisodeSource(num_cats=4, img_hw=(64, 64))
    cats = [1, 2, 3, 4]

    def first_batches(rank):
        s = PretrainEpisodeStream(src, (64, 64), cats[:3], cats[3:],
                                  num_qry=4, val_freq=0,
                                  process_index=rank, process_count=2)
        it = iter(s)
        return [np.asarray(next(it)["image"]) for _ in range(2)]

    a, b = first_batches(0), first_batches(1)
    assert not all(np.array_equal(x, y) for x, y in zip(a, b))
    # deterministic per rank
    a2 = first_batches(0)
    assert all(np.array_equal(x, y) for x, y in zip(a, a2))
