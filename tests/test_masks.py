"""Mask metric ops vs naive loop references (the reference's own
np_mask_list.py:72-140 math, re-derived as per-pair loops here)."""
import numpy as np
import pytest

from ood_object_detection_tpu.evaluation.masks import (
    EPSILON,
    boxes_to_masks,
    mask_area,
    mask_intersection,
    mask_ioa,
    mask_iou,
    mask_nms,
    multiclass_mask_nms,
    prune_non_overlapping_masks,
)


def _random_masks(n, h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    out = np.zeros((n, h, w), np.uint8)
    for i in range(n):
        y0, x0 = rng.integers(0, h - 4), rng.integers(0, w - 4)
        y1, x1 = rng.integers(y0 + 2, h), rng.integers(x0 + 2, w)
        out[i, y0:y1, x0:x1] = 1
        # non-rectangular: punch a random hole
        if rng.random() < 0.5:
            out[i, (y0 + y1) // 2, x0:x1] = 0
    return out


def _loop_intersection(m1, m2):
    out = np.zeros((m1.shape[0], m2.shape[0]), np.float32)
    for i in range(m1.shape[0]):
        for j in range(m2.shape[0]):
            out[i, j] = np.sum(np.minimum(m1[i], m2[j]), dtype=np.float32)
    return out


def test_pairwise_metrics_match_loop_reference():
    m1, m2 = _random_masks(7, seed=1), _random_masks(5, seed=2)
    inter = _loop_intersection(m1, m2)
    np.testing.assert_allclose(mask_intersection(m1, m2), inter)

    a1 = np.array([m.sum() for m in m1], np.float32)
    a2 = np.array([m.sum() for m in m2], np.float32)
    np.testing.assert_allclose(mask_area(m1), a1)
    union = a1[:, None] + a2[None, :] - inter
    np.testing.assert_allclose(
        mask_iou(m1, m2), inter / np.maximum(union, EPSILON), rtol=1e-6)
    np.testing.assert_allclose(
        mask_ioa(m1, m2), inter / (a2[None, :] + EPSILON), rtol=1e-6)


def test_mask_dtype_checked():
    with pytest.raises(ValueError):
        mask_area(np.zeros((2, 4, 4), np.float32))


def test_mask_nms_suppresses_duplicates():
    base = _random_masks(1, seed=3)[0]
    masks = np.stack([base, base, 1 - base])   # two identical + complement
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    kept = mask_nms(masks, scores, iou_threshold=0.5)
    assert list(kept) == [0, 2], "duplicate mask must be suppressed"

    # iou_threshold=1.0 short-circuit: pure top-k by score
    kept = mask_nms(masks, scores, iou_threshold=1.0, max_output_size=2)
    assert list(kept) == [0, 1]

    # score_threshold filters before anything else
    kept = mask_nms(masks, scores, iou_threshold=0.5, score_threshold=0.75)
    assert list(kept) == [0]


def test_mask_nms_unsorted_input():
    base = _random_masks(1, seed=4)[0]
    masks = np.stack([1 - base, base, base])
    scores = np.array([0.5, 0.6, 0.95], np.float32)
    kept = mask_nms(masks, scores, iou_threshold=0.5)
    assert list(kept) == [2, 0], "selection must be score-descending"


def test_multiclass_mask_nms():
    base = _random_masks(1, seed=5)[0]
    masks = np.stack([base, base, 1 - base])
    scores = np.array([[0.9, 0.1],
                       [0.8, 0.85],
                       [0.0, 0.6]], np.float32)
    idx, cls = multiclass_mask_nms(masks, scores, score_thresh=0.05,
                                   iou_thresh=0.5, max_output_size=10)
    # class 0: rows 0,1 duplicate -> keep 0; row 2 below... 0.0 <= 0.05 cut
    # class 1: row 1 best, row 0 (0.1) suppressed as duplicate, row 2 kept
    by_class = {c: sorted(idx[cls == c]) for c in np.unique(cls)}
    assert by_class == {0: [0], 1: [1, 2]}


def test_prune_non_overlapping():
    keep_region = _random_masks(1, seed=6)[0]
    masks1 = np.stack([keep_region, 1 - keep_region])
    kept = prune_non_overlapping_masks(masks1, keep_region[None],
                                       min_overlap=0.5)
    assert list(kept) == [0]


def test_boxes_to_masks_roundtrip():
    boxes = np.array([[2, 3, 10, 12], [0, 0, 5, 5]], np.float32)
    masks = boxes_to_masks(boxes, 16, 16)
    assert masks.dtype == np.uint8 and masks.shape == (2, 16, 16)
    np.testing.assert_allclose(mask_area(masks), [(10 - 2) * (12 - 3), 25])
    # mask IoU of rasterized boxes == box IoU semantics on integer grids
    from ood_object_detection_tpu.ops.boxes import pairwise_iou_yxyx
    import jax.numpy as jnp
    box_iou = np.asarray(pairwise_iou_yxyx(jnp.asarray(boxes),
                                           jnp.asarray(boxes)))
    np.testing.assert_allclose(mask_iou(masks, masks), box_iou, atol=1e-6)
