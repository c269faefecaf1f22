import numpy as np
import pytest

from ood_object_detection_tpu.ops.nms import (
    batched_nms,
    batched_soft_nms,
    nms_fixed,
    soft_nms_fixed,
)


def _numpy_greedy_nms(boxes, scores, iou_threshold):
    """Independent oracle: sort-then-suppress greedy NMS."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i] or scores[i] <= 0:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a1 + a2 - inter) > iou_threshold:
                suppressed[j] = True
    return keep


def _random_boxes_scores(rng, n, coord_range=200):
    x1 = rng.uniform(0, coord_range, n)
    y1 = rng.uniform(0, coord_range, n)
    w = rng.uniform(5, 80, n)
    h = rng.uniform(5, 80, n)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes, scores


def test_hard_nms_matches_numpy_oracle(rng):
    for _ in range(5):
        boxes, scores = _random_boxes_scores(rng, 60)
        keep_ref = _numpy_greedy_nms(boxes, scores, 0.5)
        keep_idx, keep_scores = nms_fixed(boxes, scores, 0.5, 60)
        keep_idx = np.asarray(keep_idx)
        keep_mine = keep_idx[keep_idx >= 0].tolist()
        assert keep_mine == keep_ref


def test_hard_nms_truncation():
    boxes = np.array([[i * 100.0, 0, i * 100 + 50, 50] for i in range(10)],
                     np.float32)
    scores = np.linspace(0.9, 0.1, 10).astype(np.float32)
    keep_idx, _ = nms_fixed(boxes, scores, 0.5, 3)
    np.testing.assert_array_equal(np.asarray(keep_idx), [0, 1, 2])


def test_hard_nms_zero_scores_padding():
    boxes = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], np.float32)
    scores = np.array([0.9, 0.0], np.float32)
    keep_idx, keep_scores = nms_fixed(boxes, scores, 0.5, 4)
    np.testing.assert_array_equal(np.asarray(keep_idx), [0, -1, -1, -1])
    np.testing.assert_allclose(np.asarray(keep_scores), [0.9, 0, 0, 0])


def test_batched_nms_classes_do_not_suppress(rng):
    # identical boxes, different classes: both kept
    boxes = np.array([[0, 0, 50, 50], [0, 0, 50, 50]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    classes = np.array([0, 1], np.int32)
    keep_idx, _ = batched_nms(boxes, scores, classes, 0.5, 2)
    assert set(np.asarray(keep_idx).tolist()) == {0, 1}


def test_soft_nms_parity_vs_reference(rng, reference_path):
    torch = pytest.importorskip("torch")
    from effdet.soft_nms import soft_nms as ref_soft_nms

    for trial in range(3):
        boxes, scores = _random_boxes_scores(rng, 40, coord_range=100)
        ref_idx, ref_scores = ref_soft_nms(
            torch.from_numpy(boxes), torch.from_numpy(scores),
            method_gaussian=True, sigma=0.5, iou_threshold=0.3,
            score_threshold=0.001)
        ref_idx = ref_idx.numpy()
        ref_scores = ref_scores.numpy()

        my_idx, my_scores = soft_nms_fixed(
            boxes, scores, max_out=40, method_gaussian=True, sigma=0.5,
            iou_threshold=0.3, score_threshold=0.001)
        my_idx = np.asarray(my_idx)
        my_scores = np.asarray(my_scores)
        valid = my_idx >= 0

        n = min(len(ref_idx), valid.sum())
        np.testing.assert_array_equal(my_idx[:n], ref_idx[:n])
        np.testing.assert_allclose(my_scores[:n], ref_scores[:n],
                                   rtol=1e-4, atol=1e-5)


def test_soft_nms_linear_method(rng):
    boxes = np.array([[0, 0, 50, 50], [10, 10, 60, 60], [200, 200, 250, 250]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, sc = soft_nms_fixed(boxes, scores, max_out=3, method_gaussian=False,
                             iou_threshold=0.3, score_threshold=0.001)
    idx = np.asarray(idx)
    assert idx[0] == 0
    # the overlapping box (IoU ~0.47) is decayed: new score 0.8*(1-0.47)
    sc = np.asarray(sc)
    assert 0.3 < sc[list(idx).index(1)] < 0.5


def test_batched_soft_nms_class_separation():
    boxes = np.array([[0, 0, 50, 50], [0, 0, 50, 50]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    classes = np.array([0, 3], np.int32)
    idx, sc = batched_soft_nms(boxes, scores, classes, max_out=2)
    sc = np.asarray(sc)
    # different classes: no decay at all
    np.testing.assert_allclose(sorted(sc, reverse=True), [0.9, 0.8], rtol=1e-6)
