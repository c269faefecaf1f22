import numpy as np
import pytest

from ood_object_detection_tpu.evaluation import (
    CocoEvaluator,
    CocoMeanAP,
    OodEvaluator,
    PascalEvaluator,
    auroc,
    compute_average_precision,
    compute_precision_recall,
    create_evaluator,
    fpr_at_tpr,
)


def test_precision_recall_basic():
    scores = np.array([0.9, 0.8, 0.7, 0.6])
    labels = np.array([1.0, 0.0, 1.0, 0.0])
    p, r = compute_precision_recall(scores, labels, num_gt=2)
    np.testing.assert_allclose(p, [1.0, 0.5, 2 / 3, 0.5])
    np.testing.assert_allclose(r, [0.5, 0.5, 1.0, 1.0])


def test_average_precision_perfect():
    p = np.array([1.0, 1.0])
    r = np.array([0.5, 1.0])
    assert compute_average_precision(p, r) == pytest.approx(1.0)


def test_average_precision_known_value():
    scores = np.array([0.9, 0.8, 0.7])
    labels = np.array([1.0, 0.0, 1.0])
    p, r = compute_precision_recall(scores, labels, 2)
    ap = compute_average_precision(p, r)
    # P@r0.5=1.0, P@r1.0=2/3 -> AP = 0.5*1 + 0.5*(2/3)
    assert ap == pytest.approx(0.5 + 0.5 * 2 / 3)


def _perfect_batch():
    """One image, one GT (class 1), one perfect detection."""
    detections = np.zeros((1, 5, 6), np.float32)
    detections[0, 0] = [10, 20, 50, 60, 0.9, 1]   # xyxy score class
    target = {
        "bbox": np.zeros((1, 8, 4), np.float32),
        "cls": np.full((1, 8), -1, np.int32),
        "img_id": np.array([0]),
    }
    target["bbox"][0, 0] = [20, 10, 60, 50]       # yxyx
    target["cls"][0, 0] = 1
    return detections, target


def test_pascal_evaluator_perfect_detection():
    ev = PascalEvaluator(num_classes=3)
    ev.add_predictions(*_perfect_batch())
    res = ev.evaluate()
    assert res["mAP@0.5IOU"] == pytest.approx(1.0)
    assert res["meanCorLoc@0.5IOU"] == pytest.approx(1.0)


def test_pascal_evaluator_miss():
    ev = PascalEvaluator(num_classes=3)
    dets, target = _perfect_batch()
    dets[0, 0, :4] = [200, 200, 250, 250]   # way off
    ev.add_predictions(dets, target)
    res = ev.evaluate()
    assert res["mAP@0.5IOU"] == pytest.approx(0.0)


def test_pascal_episodic_category_filter():
    ev = PascalEvaluator(num_classes=3)
    dets, target = _perfect_batch()
    # add a second image with class 2 GT and a missing detection
    dets2 = np.zeros((1, 5, 6), np.float32)
    target2 = {
        "bbox": np.zeros((1, 8, 4), np.float32),
        "cls": np.full((1, 8), -1, np.int32),
        "img_id": np.array([1]),
    }
    target2["bbox"][0, 0] = [0, 0, 30, 30]
    target2["cls"][0, 0] = 2
    ev.add_predictions(dets, target)
    ev.add_predictions(dets2, target2)
    res_all = ev.evaluate()
    assert res_all["mAP@0.5IOU"] == pytest.approx(0.5)   # (1.0 + 0.0)/2
    res_c1 = ev.evaluate(task_categories=[1])
    assert res_c1["mAP@0.5IOU"] == pytest.approx(1.0)
    res_c2 = ev.evaluate(task_categories=[2])
    assert res_c2["mAP@0.5IOU"] == pytest.approx(0.0)


def test_pascal_duplicate_detection_is_fp():
    ev = PascalEvaluator(num_classes=2)
    dets, target = _perfect_batch()
    dets[0, 1] = [10, 20, 50, 60, 0.8, 1]   # duplicate of the same GT
    ev.add_predictions(dets, target)
    res = ev.evaluate()
    # AP with [TP, FP] at recall 1.0 after first -> AP = 1.0 still
    assert res["mAP@0.5IOU"] == pytest.approx(1.0)


def test_coco_evaluator_perfect():
    ev = CocoEvaluator(num_classes=3)
    dets, target = _perfect_batch()
    ev.add_predictions(dets, target)
    res = ev.evaluate()
    assert res["map50"] == pytest.approx(1.0, abs=0.01)
    assert res["map"] == pytest.approx(1.0, abs=0.01)


def test_coco_evaluator_iou_sweep():
    """A detection with IoU ~0.6 counts at 0.5/0.55/0.6 but not above."""
    ev = CocoEvaluator(num_classes=2)
    detections = np.zeros((1, 5, 6), np.float32)
    # GT xyxy [0,0,100,100]; det [0,0,100,80] -> IoU 0.8
    detections[0, 0] = [0, 0, 100, 80, 0.9, 1]
    target = {
        "bbox": np.array([[[0, 0, 100, 100]]], np.float32),  # yxyx == same here
        "cls": np.array([[1]], np.int32),
        "img_id": np.array([0]),
    }
    ev.add_predictions(detections, target)
    res = ev.evaluate()
    # TP at IoU thr 0.5..0.8 (7 of 10 thresholds) -> map ~ 0.7
    assert res["map50"] == pytest.approx(1.0, abs=0.01)
    assert 0.6 < res["map"] < 0.75


def test_ood_metrics_separable():
    known = np.linspace(1, 2, 100)
    unknown = np.linspace(-2, -1, 100)
    assert auroc(known, unknown) == pytest.approx(1.0)
    assert fpr_at_tpr(known, unknown, 0.95) == pytest.approx(0.0)
    # fully overlapping -> auroc ~ 0.5
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, 2000)
    b = rng.normal(0, 1, 2000)
    assert abs(auroc(a, b) - 0.5) < 0.05


def test_ood_evaluator():
    ev = OodEvaluator()
    ev.add_predictions(np.array([2.0, 3.0, -2.0]),
                       {"is_known": np.array([True, True, False])})
    res = ev.evaluate()
    assert res["auroc"] == pytest.approx(1.0)


def test_create_evaluator_factory():
    assert isinstance(create_evaluator("pascal", 5), PascalEvaluator)
    assert isinstance(create_evaluator("coco", 5), CocoEvaluator)
    assert isinstance(create_evaluator("ood", 0), OodEvaluator)
    with pytest.raises(ValueError):
        create_evaluator("nope", 5)


def test_async_accumulation():
    ev = PascalEvaluator(num_classes=3)
    dets, target = _perfect_batch()
    f = ev.add_predictions_async(dets, target)
    f.result()
    ev.drain()
    assert ev.evaluate()["mAP@0.5IOU"] == pytest.approx(1.0)


def test_coco_stats_area_breakdown():
    """stats() reports the pycocotools-style per-area mAP breakdown
    (COCOeval stats[3:6]): a small box counts only toward map_small."""
    ev = CocoMeanAP(num_classes=1)
    # one small GT (16x16=256 px^2 < 32^2) and one large GT (>96^2)
    ev.add_image(
        1,
        det_boxes=np.array([[0, 0, 16, 16], [50, 50, 250, 250]], np.float32),
        det_scores=np.array([0.9, 0.8], np.float32),
        det_classes=np.array([1, 1], np.int32),
        gt_boxes=np.array([[0, 0, 16, 16], [50, 50, 250, 250]], np.float32),
        gt_classes=np.array([1, 1], np.int32))
    s = ev.stats()
    assert set(s) == {"map", "map50", "map75", "map_small", "map_medium",
                      "map_large"}
    assert s["map"] > 0.99
    assert s["map_small"] > 0.99
    assert s["map_large"] > 0.99
    # no medium GT -> medium AP reported as 0 (no valid classes)
    assert s["map_medium"] == 0.0


def test_corloc_order_independent():
    """CorLoc must pick the highest-scoring detection regardless of the
    order detections arrive in (the public add_* contract does not require
    score-sorted input)."""
    from ood_object_detection_tpu.evaluation import PerImageEvaluation

    pie = PerImageEvaluation(num_classes=1, matching_iou_threshold=0.5)
    gt = np.array([[0.0, 0.0, 10.0, 10.0]], np.float32)
    # low-score detection ON the GT listed first; the top-scoring one is
    # far away -> CorLoc must be 0 (top detection does not localize GT).
    d_boxes = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], np.float32)
    d_scores = np.array([0.1, 0.9], np.float32)
    d_classes = np.zeros(2, np.int32)
    _, _, corloc = pie.compute_tp_fp(
        d_boxes, d_scores, d_classes, gt, np.zeros(1, np.int32))
    assert corloc[0] == 0
    # reversed order must give the same answer
    _, _, corloc_rev = pie.compute_tp_fp(
        d_boxes[::-1].copy(), d_scores[::-1].copy(), d_classes, gt,
        np.zeros(1, np.int32))
    assert corloc_rev[0] == 0
    # and when the top-scoring detection IS on the GT, CorLoc is 1 in
    # either input order.
    d_scores2 = np.array([0.9, 0.1], np.float32)
    _, _, corloc_hit = pie.compute_tp_fp(
        d_boxes, d_scores2, d_classes, gt, np.zeros(1, np.int32))
    assert corloc_hit[0] == 1
    _, _, corloc_hit_rev = pie.compute_tp_fp(
        d_boxes[::-1].copy(), d_scores2[::-1].copy(), d_classes, gt,
        np.zeros(1, np.int32))
    assert corloc_hit_rev[0] == 1
